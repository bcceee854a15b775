"""Fused pipeline + sharding tests (8 virtual CPU devices, see conftest)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hmvec_tpu.pipeline import make_pmm_fn, make_lensing_cls_fn, fisher_jacobian
from hmvec_tpu.parallel.sharding import (make_mesh, make_sharded_pmm_fn,
                                         make_fisher_step_fn)
from hmvec_tpu.models.halo_model import HaloModel

ZS = np.linspace(0.1, 2.0, 4)
MS = np.geomspace(2e10, 1e17, 64)
KS = np.geomspace(1e-4, 100, 128)


def test_pipeline_matches_class_api():
    fn = make_pmm_fn(ZS, KS, MS)
    p_pipe = np.asarray(fn({}))
    hm = HaloModel(ZS, KS, ms=MS)
    p_class = np.asarray(hm.get_power("nfw"))
    np.testing.assert_allclose(p_pipe, p_class, rtol=1e-12)


def test_pipeline_grad():
    fn = make_pmm_fn(ZS, KS, MS, jit=False)

    def loss(omch2):
        return jnp.sum(fn({"omch2": omch2}))

    g = jax.jit(jax.grad(loss))(jnp.asarray(0.1198))
    assert np.isfinite(float(g)) and float(g) != 0.0


@pytest.mark.slow
def test_fisher_jacobian():
    # smaller grid than the module default: the jacobian program compiles
    # the whole pipeline twice (fwd tangents), which dominated suite time
    ms_j = MS[::4]
    ks_j = KS[::4]
    fn = make_pmm_fn(ZS, ks_j, ms_j, jit=False)
    jac = fisher_jacobian(lambda o: fn(o)[:, ::4], merge := {"omch2": 0.1198,
                                                             "As": 2.2e-9},
                          ("omch2", "As"))
    jac = np.asarray(jac)
    assert jac.shape == (ZS.size, 8, 2)
    assert np.all(np.isfinite(jac))
    assert np.any(jac != 0)


def test_lensing_cls_pipeline():
    ells = np.geomspace(30, 2000, 20)
    fn = make_lensing_cls_fn(ZS, KS, MS, ells)
    ckk, pmm = fn({})
    ckk = np.asarray(ckk)
    assert ckk.shape == ells.shape
    assert np.all(ckk > 0)
    assert np.all(np.isfinite(ckk))


def test_sharded_pmm_matches_single_device():
    mesh = make_mesh(8)
    fn_sharded = jax.jit(make_sharded_pmm_fn(ZS, KS, MS, mesh))
    fn_single = make_pmm_fn(ZS, KS, MS)
    p_s = np.asarray(fn_sharded({}))
    p_1 = np.asarray(fn_single({}))
    np.testing.assert_allclose(p_s, p_1, rtol=1e-10)


def test_sharded_fisher_step_runs_and_descends():
    mesh = make_mesh(8)
    ells = np.geomspace(30, 1000, 8)
    step, model = make_fisher_step_fn(ZS, KS, MS, ells, mesh, lr=1e-3)
    data = jax.jit(model)(jnp.asarray([1.0, 1.0]))  # fiducial-relative units
    theta0 = jnp.asarray([1.04, 1.08])
    theta1, loss0 = step(theta0, data)
    theta2, loss1 = step(theta1, data)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    assert float(loss1) <= float(loss0)


def test_batched_cosmologies_matches_loop():
    """make_batched_fn: B cosmologies in one vmapped program == B separate
    calls (the MCMC/emulator serving surface)."""
    from hmvec_tpu.pipeline import make_batched_fn
    fn = make_pmm_fn(ZS, KS[::4], MS[::4], jit=False)
    bf = make_batched_fn(fn, ("omch2", "As"))
    theta = np.array([[0.11, 2.0e-9], [0.1198, 2.2e-9], [0.13, 2.5e-9]])
    batched = np.asarray(bf(theta))
    assert batched.shape == (3, ZS.size, KS[::4].size)
    for i, (om, As) in enumerate(theta):
        single = np.asarray(fn({"omch2": om, "As": As}))
        np.testing.assert_allclose(batched[i], single, rtol=1e-12)
    # dict-of-leaves input style
    batched2 = np.asarray(bf({"omch2": theta[:, 0], "As": theta[:, 1]}))
    np.testing.assert_allclose(batched2, batched, rtol=0)


def test_batched_grad():
    from hmvec_tpu.pipeline import make_batched_fn
    fn = make_pmm_fn(ZS, KS[::8], MS[::8], jit=False)
    bf = make_batched_fn(fn, ("omch2",), jit=False)

    def loss(th):
        return jnp.sum(jnp.log(bf(th)))

    g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray([[0.11], [0.13]])))
    assert g.shape == (2, 1) and np.all(np.isfinite(g)) and np.all(g != 0)


def test_batched_base_overrides():
    """make_batched_fn(base=...): fixed overrides apply to every element."""
    from hmvec_tpu.pipeline import make_batched_fn
    fn = make_pmm_fn(ZS, KS[::8], MS[::8], jit=False)
    bf = make_batched_fn(fn, ("omch2",), base={"As": 2.5e-9})
    out = np.asarray(bf(np.array([[0.115], [0.125]])))
    ref0 = np.asarray(fn({"omch2": 0.115, "As": 2.5e-9}))
    np.testing.assert_allclose(out[0], ref0, rtol=1e-12)
