"""Gradient regression net: every fused pipeline must have finite, nonzero
gradients with respect to every supported cosmological parameter.

Catches NaN-grad regressions like the inf-Cls where-branch bug fixed in
round 1 (models/ksz.py Nvv_core_integral)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmvec_tpu.pipeline import (make_pmm_fn, make_lensing_cls_fn,
                                make_electron_fn, make_hod_fn,
                                make_ksz_snr_fn)

ZS = np.array([0.4, 1.1])
KS = np.geomspace(1e-3, 10, 24)
MS = np.geomspace(1e11, 1e16, 16)
FID = {"omch2": 0.1198, "ombh2": 0.02225, "H0": 67.3, "ns": 0.9645,
       "As": 2.2e-9, "w0": -1.0, "wa": 0.0}

PARAMS = list(FID)


def _grad_ok(scalar_fn):
    # one jitted vector-grad: same per-parameter derivatives as 7 scalar
    # grads, but a single trace/compile/backward pass (the suite runs on
    # one CPU core; eager per-param grads dominated its wall time)
    def loss(theta):
        ov = {n: theta[i] for i, n in enumerate(PARAMS)}
        return scalar_fn(ov)

    g = np.asarray(jax.jit(jax.grad(loss))(
        jnp.asarray([FID[n] for n in PARAMS])))
    for i, name in enumerate(PARAMS):
        assert np.isfinite(g[i]), (name, g[i])
        if name not in ("wa",):  # wa=0 can sit at a stationary point
            assert g[i] != 0.0, name


def test_pmm_grads_all_params():
    fn = make_pmm_fn(ZS, KS, MS, jit=False)
    _grad_ok(lambda ov: jnp.sum(fn(ov)))


def test_ckk_grads_all_params():
    ells = np.geomspace(30, 800, 6)
    fn = make_lensing_cls_fn(ZS, KS, MS, ells, jit=False)
    _grad_ok(lambda ov: jnp.sum(fn(ov)[0]))


@pytest.mark.slow
def test_electron_grads_all_params():
    fn = make_electron_fn(ZS, KS, MS, nxs=128, xmax=10, jit=False)
    _grad_ok(lambda ov: jnp.sum(fn(ov)[0]))


def test_hod_grads_all_params():
    fn = make_hod_fn(ZS, KS, MS, np.full(2, 1e-4), jit=False)
    _grad_ok(lambda ov: jnp.sum(fn(ov)[0]))


@pytest.mark.slow
def test_ksz_snr_grad_all_params():
    fn = make_ksz_snr_fn(0.55, 10.0, 1e-4, ms=MS, num_kL_bins=8,
                         num_kS_bins=9, num_mu_bins=6, nxs=128, xmax=10,
                         jit=False)
    Cls = 1e-5 * np.ones(10000)

    def snr_of(ov):
        snr, _, _ = fn(ov, Cls)
        return snr

    _grad_ok(snr_of)
