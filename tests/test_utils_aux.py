"""Aux subsystems: profiling timer, staged checkpoint/resume."""

import numpy as np

from hmvec_tpu.utils.profiling import time_fn, timer, fetch_sync
from hmvec_tpu.utils.checkpoint import (save_stages, load_stages,
                                        save_halo_model, restore_halo_model)
from hmvec_tpu.models.halo_model import HaloModel


def test_timer_and_time_fn():
    import jax.numpy as jnp
    res = {}
    with timer("block", res):
        fetch_sync(jnp.ones(10) * 2)
    assert res["block"] > 0
    t = time_fn(lambda: jnp.arange(100).sum(), iters=3, warmup=1)
    assert t > 0


def test_stage_roundtrip(tmp_path):
    p = str(tmp_path / "st.npz")
    save_stages(p, a=np.arange(5.0), b=np.ones((2, 3)))
    out = load_stages(p, as_jax=False)
    np.testing.assert_array_equal(out["a"], np.arange(5.0))
    np.testing.assert_array_equal(out["b"], np.ones((2, 3)))


def test_halo_model_checkpoint_roundtrip(tmp_path):
    zs = np.array([0.3, 1.0])
    ks = np.geomspace(1e-3, 10, 50)
    ms = np.geomspace(1e11, 1e16, 30)
    hm = HaloModel(zs, ks, ms=ms)
    hm.add_hod("g", ngal=np.array([1e-4, 1e-4]))
    path = str(tmp_path / "hm.npz")
    save_halo_model(hm, path)

    hm2 = HaloModel(zs, ks, ms=ms, skip_nfw=True)
    restore_halo_model(hm2, path)
    np.testing.assert_allclose(np.asarray(hm2.nzm), np.asarray(hm.nzm))
    p1 = np.asarray(hm.get_power("g"))
    p2 = np.asarray(hm2.get_power("g"))
    np.testing.assert_allclose(p1, p2, rtol=1e-13)


def test_checkpoint_roundtrips_uk2_and_cib(tmp_path):
    """Conc-scatter <u^2> moments and CIB tracers survive save/restore
    (both are round-3 extensions the original roundtrip predates)."""
    zs = np.array([0.3, 1.0])
    ks = np.geomspace(1e-3, 10, 40)
    ms = np.geomspace(1e11, 1e16, 24)
    hm = HaloModel(zs, ks, ms=ms)
    hm.add_nfw_profile("nfw_sc", conc_scatter=0.3)
    hm.add_cib_tracer("cib545", 545.0)
    path = str(tmp_path / "hm.npz")
    save_halo_model(hm, path)

    hm2 = HaloModel(zs, ks, ms=ms, skip_nfw=True)
    restore_halo_model(hm2, path)
    assert "nfw_sc" in hm2.uk2_profiles
    np.testing.assert_allclose(np.asarray(hm2.get_power("nfw_sc")),
                               np.asarray(hm.get_power("nfw_sc")), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(hm2.get_power("cib545")),
                               np.asarray(hm.get_power("cib545")), rtol=1e-13)


def test_cached_quadrature_nodes_are_frozen():
    """leggauss_cached hands out the same arrays on every call; they must
    be read-only so an in-place rescale cannot corrupt quadrature
    process-wide."""
    import pytest
    from hmvec_tpu.utils.weights import leggauss_cached
    x, w = leggauss_cached(64)
    with pytest.raises(ValueError):
        x *= 0.5
    with pytest.raises(ValueError):
        w[0] = 0.0
    x2, _ = leggauss_cached(64)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
