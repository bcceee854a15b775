"""Fused single-jit kSZ SNR pipeline vs the class API."""

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.pipeline import make_ksz_snr_fn
from hmvec_tpu.models.ksz import get_ksz_snr

CFG = dict(num_kL_bins=8, num_kS_bins=9, num_mu_bins=6, nxs=256, xmax=10)
MS = np.geomspace(1e10, 1e16, 32)


def test_fused_ksz_matches_class_api():
    fn = make_ksz_snr_fn(0.55, 10.0, 1e-4, ms=MS, **CFG)
    Cls = 1e-5 * np.ones(10000)
    snr, nvv, vrec = fn({}, Cls)
    snr_ref, fksz = get_ksz_snr(
        10.0, 0.55, 1e-4, Cls, num_kL_bins=8, num_kS_bins=9,
        num_mu_bins=6, ms=MS, electron_profile_nxs=256,
        electron_profile_xmax=10)
    assert abs(float(snr) - float(snr_ref)) / float(snr_ref) < 1e-12
    nvv_ref = np.asarray(fksz.Nvv(0, Cls))
    np.testing.assert_allclose(np.asarray(nvv), nvv_ref, rtol=1e-12)


def test_fused_ksz_grad():
    fn = make_ksz_snr_fn(0.55, 10.0, 1e-4, ms=MS, jit=False, **CFG)
    Cls = 1e-5 * np.ones(10000)

    def snr_of(omch2):
        snr, _, _ = fn({"omch2": omch2}, Cls)
        return snr

    g = jax.jit(jax.grad(snr_of))(jnp.asarray(0.1198))
    assert np.isfinite(float(g)) and float(g) != 0.0
