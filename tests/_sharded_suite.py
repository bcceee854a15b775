"""Sharded multi-tracer (HOD x electron) spectra vs the single-device
class API, on the 8-virtual-device CPU mesh."""

import numpy as np
import jax

from hmvec_tpu.parallel.sharding import make_mesh, make_sharded_galaxy_electron_fn
from hmvec_tpu.models.halo_model import HaloModel

ZS = np.linspace(0.2, 1.4, 3)
MS = np.geomspace(1e11, 1e16, 64)
KS = np.geomspace(1e-3, 10, 60)
NGAL = np.full(3, 1e-4)
NXS, XMAX = 512, 15.0


def test_sharded_galaxy_electron_matches_class_api():
    mesh = make_mesh(8)
    fn = jax.jit(make_sharded_galaxy_electron_fn(
        ZS, KS, MS, NGAL, mesh, nxs=NXS, xmax=XMAX))
    pgg_s, pge_s, pee_s = (np.asarray(x) for x in fn({}))

    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_battaglia_profile("e", family="AGN", nxs=NXS, xmax=XMAX)
    hm.add_hod("g", ngal=NGAL)
    pgg = np.asarray(hm.get_power("g"))
    pge = np.asarray(hm.get_power("g", "e"))
    pee = np.asarray(hm.get_power("e"))

    np.testing.assert_allclose(pgg_s, pgg, rtol=1e-9)
    np.testing.assert_allclose(pge_s, pge, rtol=1e-9)
    np.testing.assert_allclose(pee_s, pee, rtol=1e-9)


def test_sharded_batched_cosmologies():
    """Batch-of-cosmologies sharded over the 8-device mesh == vmap on one
    device (data-parallel serving; no cross-device communication)."""
    from hmvec_tpu.parallel.sharding import make_mesh, make_sharded_batched_fn
    from hmvec_tpu.pipeline import make_pmm_fn, make_batched_fn

    zs = np.linspace(0.1, 2.0, 3)
    ms = np.geomspace(2e10, 1e17, 32)
    ks = np.geomspace(1e-3, 10, 64)
    fn = make_pmm_fn(zs, ks, ms, jit=False)
    theta = np.column_stack([np.linspace(0.11, 0.13, 8),
                             np.linspace(2.0e-9, 2.4e-9, 8)])

    mesh = make_mesh(8)
    sharded = jax.jit(make_sharded_batched_fn(fn, ("omch2", "As"), mesh))
    single = make_batched_fn(fn, ("omch2", "As"))
    np.testing.assert_allclose(np.asarray(sharded(theta)),
                               np.asarray(single(theta)), rtol=1e-11)


def test_sharded_batched_rejects_indivisible_batch():
    from hmvec_tpu.parallel.sharding import make_mesh, make_sharded_batched_fn
    from hmvec_tpu.pipeline import make_pmm_fn
    import pytest

    zs = np.linspace(0.1, 1.0, 2)
    fn = make_pmm_fn(zs, np.geomspace(1e-3, 1, 8),
                     np.geomspace(1e11, 1e15, 8), jit=False)
    bf = make_sharded_batched_fn(fn, ("omch2",), make_mesh(8))
    with pytest.raises(AssertionError, match="mesh size 8 must divide"):
        bf(np.full((4, 1), 0.12))


def test_sharded_pmm_wcdm_ode_growth():
    """The m-axis-sharded Pmm under a w0/wa override routes through the
    ODE growth table inside shard_map and matches the unsharded pipeline
    (round-3: traced/concrete w0 overrides select growth_mode='ode')."""
    import jax.numpy as jnp
    from hmvec_tpu.parallel.sharding import make_sharded_pmm_fn
    from hmvec_tpu.pipeline import make_pmm_fn

    mesh = make_mesh(8)
    ov = {"w0": jnp.asarray(-0.9), "wa": jnp.asarray(0.2)}
    p_sh = np.asarray(jax.jit(make_sharded_pmm_fn(ZS, KS, MS, mesh))(ov))
    p_un = np.asarray(make_pmm_fn(ZS, KS, MS)(ov))
    np.testing.assert_allclose(p_sh, p_un, rtol=1e-10)


def test_sharded_boltzlite_matches_unsharded():
    """k-sharded Boltzmann solve + l-sharded Bessel projection == the
    single-device boltzlite path (tiny stability-respecting grids:
    dx_c ~ 0.028 keeps explicit RK4 stable to k ~ 0.023/Mpc).

    The persistent compilation cache is disabled for this test: writing
    the serialized 8-device boltzlite executable from inside a full
    suite run SEGFAULTS the interpreter in jax's
    put_executable_and_time (reproduced twice at the identical frame on
    cold caches; the same test passes solo and the entry is never warm
    on a fresh host anyway -- see DEVNOTES 'suite segfault')."""
    import jax.numpy as jnp
    from hmvec_tpu.params import merge_params
    from hmvec_tpu.models import background as bgmod
    from hmvec_tpu.models import recomb
    from hmvec_tpu.models import boltzlite as bl
    from hmvec_tpu.parallel.sharding import (
        make_mesh, sharded_solve_perturbations, sharded_cls_from_sources)

    # NOTE: flipping jax_compilation_cache_dir alone is a no-op here --
    # compilation_cache.is_cache_used() latches its decision in process
    # globals on first use, so the cache must be reset AND the enable
    # flag flipped (verified: entries stop being written only with both).
    # Only the SHARDED executables trigger the segfault, so the
    # single-device halves run first with the cache untouched (their
    # warm-cache compiles are most of this test's wall time otherwise).
    from jax._src import compilation_cache as _cc

    class _no_persistent_cache:
        def __enter__(self):
            _cc.reset_cache()
            jax.config.update("jax_enable_compilation_cache", False)

        def __exit__(self, *exc):
            jax.config.update("jax_enable_compilation_cache", True)
            _cc.reset_cache()

    _sharded_boltzlite_body(jnp, merge_params, bgmod, recomb, bl,
                            make_mesh, sharded_solve_perturbations,
                            sharded_cls_from_sources,
                            _no_persistent_cache())


def _sharded_boltzlite_body(jnp, merge_params, bgmod, recomb, bl,
                            make_mesh, sharded_solve_perturbations,
                            sharded_cls_from_sources, no_cache):
    p = merge_params({})
    bg = bgmod.background(p)
    rec = recomb.recombination(bg)
    ctx = bl.make_ctx(bg, rec)
    kw = dict(n_a=200, n_b_outer=80, n_b_inner=2, n_c_outer=60,
              n_c_inner=3)
    ks = np.geomspace(2e-4, 0.02, 10)          # pads 10 -> 16 on 8 devices

    sol = bl.solve_perturbations(ctx, jnp.asarray(ks), **kw)
    mesh = make_mesh(8, axis_name="k")
    with no_cache:
        sol_s = sharded_solve_perturbations(ctx, ks, mesh, **kw)
        np.asarray(sol_s.states)   # materialize inside the guard
    # rtol: CPU XLA vectorizes the RK4 differently for local batch
    # width 2 vs 10 (fma regrouping) -- last-bits only
    st, st_s = np.asarray(sol.states), np.asarray(sol_s.states)
    scale = np.max(np.abs(st), axis=(0, 1), keepdims=True)
    np.testing.assert_allclose(st_s / scale, st / scale, atol=1e-9)
    np.testing.assert_allclose(float(sol_s.zeta_unit),
                               float(sol.zeta_unit), rtol=1e-12)

    src = bl.compute_sources(ctx, sol)
    ls = np.array([4, 9, 20, 40, 70])          # pads 5 -> 8
    ks_fine = np.linspace(2e-4, 0.95 * 0.02, 300)
    cl = bl.cls_from_sources(src, bg, ls, jnp.asarray(ks_fine))
    with no_cache:
        cl_s = sharded_cls_from_sources(src, bg, ls, ks_fine, mesh)
        cl_s = {k: np.asarray(v) for k, v in cl_s.items()}
    for key in ("tt", "ee", "te"):
        np.testing.assert_allclose(np.asarray(cl_s[key]),
                                   np.asarray(cl[key]), rtol=1e-10,
                                   err_msg=key)


def test_sharded_matter_bispectrum_matches_class_api():
    """B_mmm 1h+2h+3h (incl. the quadratic-bias term) sharded over the
    8-device mesh == the single-device class API: the k-interpolation
    commutes with the mass integral, so agreement is reassociation-level."""
    from hmvec_tpu.parallel.sharding import make_sharded_matter_bispectrum_fn

    mesh = make_mesh(8)
    kq = np.geomspace(5e-3, 2.0, 10)
    fn = jax.jit(make_sharded_matter_bispectrum_fn(
        ZS, KS, MS, kq, 1.3 * kq, 1.8 * kq, mesh, include_b2=True))
    b_s = np.asarray(fn({}))

    hm = HaloModel(ZS, KS, ms=MS)
    b = np.asarray(hm.get_bispectrum(kq, 1.3 * kq, 1.8 * kq,
                                     include_b2=True))
    assert b_s.shape == b.shape
    np.testing.assert_allclose(b_s, b, rtol=1e-9)
