"""kSZ pipeline parity: jax kSZ class vs numpy twin (config 5 oracle)."""

import numpy as np
import pytest

from hmvec_tpu.models.ksz import kSZ
from hmvec_tpu.twin.ksz import TwinKSZ

CFG = dict(num_kL_bins=10, num_kS_bins=11, num_mu_bins=6,
           electron_profile_nxs=256, electron_profile_xmax=10)
MS = np.geomspace(1e10, 1e16, 80)


@pytest.fixture(scope="module")
def pair():
    f = kSZ([0.55], [10.0], [1e-4], ms=MS, **CFG)
    t = TwinKSZ([0.55], [10.0], [1e-4], ms=MS, **CFG)
    return f, t


def test_small_scale_spectra_parity(pair):
    f, t = pair
    np.testing.assert_allclose(np.asarray(f.sPggs), t.sPggs, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(f.sPges), t.sPges, rtol=1e-7)


def test_velocity_weights_parity(pair):
    f, t = pair
    np.testing.assert_allclose(np.asarray(f.d2vs), t.d2vs, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(f.kstars), t.kstars, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f.chistars), t.chistars, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f.vrec), t.vrec, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(f.bgs), t.bgs, rtol=1e-8)


def test_nvv_parity(pair):
    f, t = pair
    Cls = 1e-5 * np.ones(10000)
    nvv_f = np.asarray(f.Nvv(0, Cls))
    nvv_t = t.Nvv(0, Cls)
    np.testing.assert_allclose(nvv_f, nvv_t, rtol=1e-6)
