"""kSZ pipeline tests: shapes, finiteness, physical sanity, and oracle
checks of the helper functions (the reference has no automated tests; the
numeric scales here are cross-checked against the published formulas)."""

import numpy as np
import pytest
import jax.numpy as jnp

from hmvec_tpu.models import ksz as kszmod


def test_ne0_shaw_scale():
    # Mean electron density today ~0.2 /m^3 for Planck baryons
    ne0 = kszmod.ne0_shaw(0.02225, 0.24)
    assert 0.1 < ne0 < 0.3, ne0


def test_ksz_radial_function_positive_increasing():
    z = np.array([0.1, 0.5, 1.0])
    K = np.asarray(kszmod.ksz_radial_function(z, 0.02225, 0.24))
    assert np.all(K > 0)
    assert K[2] > K[0]  # (1+z)^2 growth


def test_get_interpolated_cls():
    Cls = np.arange(100, dtype=np.float64)
    out = np.asarray(kszmod.get_interpolated_cls(Cls, chistar=10.0,
                                                 kss=np.array([0.05, 0.5, 5.0, 50.0])))
    assert out[0] == 0.0        # l=0 < 2 zeroed
    assert out[1] == 5.0        # l=5
    assert out[2] == 50.0       # l=50
    assert np.isinf(out[3])     # l=500 > lmax


@pytest.fixture(scope="module")
def fksz():
    return kszmod.kSZ([0.5], [10.0], [1e-4], num_kL_bins=8, num_kS_bins=9,
                      num_mu_bins=6, ms=np.geomspace(1e10, 1e16, 32),
                      electron_profile_nxs=256, electron_profile_xmax=10)


def test_ksz_constructor_spectra(fksz):
    assert np.all(np.isfinite(np.asarray(fksz.sPggs)))
    assert np.all(np.asarray(fksz.sPggs) > 0)
    assert np.all(np.isfinite(np.asarray(fksz.sPges)))
    assert np.asarray(fksz.vrec).shape == (1,)
    assert float(fksz.vrec[0]) > 0
    # galaxy bias should be sensible for this density
    assert 0.8 < float(fksz.bgs[0]) < 5.0


def test_nvv_finite_positive(fksz):
    Cls = 1e-5 * np.ones(10000)
    nvv = np.asarray(fksz.Nvv(0, Cls))
    assert nvv.shape == (fksz.mu.size, fksz.kLs.size)
    assert np.all(np.isfinite(nvv))
    assert np.all(nvv > 0)
    # noise blows up toward mu -> 0 (mu^-2 prefactor)
    mid = fksz.mu.size // 2
    assert nvv[mid, 0] > nvv[0, 0]


def test_ksz_snr_runs():
    Cls = 1e-5 * np.ones(10000)
    snr, _ = kszmod.get_ksz_snr(10.0, 0.5, 1e-4, Cls,
                                num_kL_bins=8, num_kS_bins=9,
                                num_mu_bins=6,
                                ms=np.geomspace(1e10, 1e16, 32),
                                electron_profile_nxs=256,
                                electron_profile_xmax=10)
    assert np.isfinite(float(snr))
    assert float(snr) > 0


def test_pge_err(fksz):
    Cls = 1e-5 * np.ones(10000)
    edges = np.array([0.2, 1.0, 5.0])
    errs = np.asarray(fksz.Pge_err(0, edges, Cls))
    assert errs.shape == (2,)
    assert np.all(errs > 0)


def test_photoz_damping():
    pksz = kszmod.kSZ([0.5], [10.0], [1e-4], num_kL_bins=10, num_kS_bins=11,
                      num_mu_bins=8, ms=np.geomspace(1e10, 1e16, 24),
                      electron_profile_nxs=128, electron_profile_xmax=10,
                      sigz=0.05)
    W = np.asarray(pksz.Wphoto(0))
    assert W.shape == (8, 10)
    assert np.all(W <= 1.0) and np.all(W > 0)
    # damping strongest at |mu|=1, high kL
    assert W[0, -1] < W[4, 0]


def test_ksz_auto_squeezed_runs():
    ells = np.array([100.0, 1000.0, 3000.0])
    pksz, cl, spec = kszmod.get_ksz_auto_squeezed(
        ells, 10.0, [0.5, 1.0], 1e-4, bgs=None, num_k_bins=24, num_mu_bins=6,
        ms=np.geomspace(1e10, 1e16, 24), electron_profile_nxs=128,
        electron_profile_xmax=10)
    cl = np.asarray(cl)
    assert cl.shape == (3,)
    assert np.all(np.isfinite(cl))
    assert np.all(cl > 0)
    # kSZ C_ell should be micro-K^2-scale at ell ~ 3000 (order of magnitude)
    dl = cl[2] * 3000 * 3001 / (2 * np.pi)
    assert 1e-2 < dl < 1e2, dl


def test_survey_volume_and_kmin():
    v = kszmod.get_survey_volume(0.4, 0.6, 0.5)
    assert 1.0 < v < 100.0  # Gpc^3
    assert 1e-3 < kszmod.get_kmin(v) < 1e-1
