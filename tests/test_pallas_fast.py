"""Pallas fast-path NFW kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hmvec_tpu.ops.pallas_kernels import nfw_uk_fast
from hmvec_tpu.models.profiles import nfw_uk_analytic


def test_pallas_nfw_fast_matches_exact():
    zs = np.linspace(0.1, 3.0, 3)
    nm = 8
    rng = np.random.default_rng(0)
    cs = jnp.asarray(rng.uniform(2.0, 15.0, (3, nm)))
    rss = jnp.asarray(rng.uniform(0.01, 1.0, (3, nm)))
    ks = np.geomspace(1e-4, 100, 130)
    exact = np.asarray(nfw_uk_analytic(ks, zs, cs, rss))
    fast = np.asarray(nfw_uk_fast(ks, zs, cs, rss, interpret=True))
    # f32 fast-path budget: double-single phases keep the worst case
    # ~3e-6 absolute (residual = f32 Clenshaw accumulation)
    assert np.max(np.abs(fast - exact)) < 5e-6


def test_pallas_padding_edges():
    # batch and k sizes that do not divide the tile sizes
    zs = np.array([0.5])
    cs = jnp.asarray([[3.0, 7.0, 11.0]])
    rss = jnp.asarray([[0.1, 0.3, 0.6]])
    ks = np.geomspace(1e-3, 50, 77)
    fast = np.asarray(nfw_uk_fast(ks, zs, cs, rss, interpret=True))
    exact = np.asarray(nfw_uk_analytic(ks, zs, cs, rss))
    assert fast.shape == exact.shape == (1, 3, 77)
    assert np.max(np.abs(fast - exact)) < 1e-5


def test_pallas_large_phase():
    """Phases up to ~800 (k=100, r_s~2, z=3): the double-single phase path
    must hold accuracy where a plain f32 product loses ~5e-5 in the trig
    argument."""
    zs = np.array([3.0])
    cs = jnp.asarray([[3.0, 8.0]])
    rss = jnp.asarray([[1.5, 2.0]])
    ks = np.geomspace(10.0, 100.0, 64)
    exact = np.asarray(nfw_uk_analytic(ks, zs, cs, rss))
    fast = np.asarray(nfw_uk_fast(ks, zs, cs, rss, interpret=True))
    assert np.max(np.abs(fast - exact)) < 5e-6


def test_v3_ds_math_accuracy_vs_f64():
    """The v3 double-single NFW math (the f64-exact-build fast path,
    pallas_kernels._nfw_uk_ds_math) vs the exact f64 Si/Ci profile:
    <= 2e-7 worst-case absolute on u over an adversarial (c, r_s, k)
    sweep (measured 9.5e-8; the v2 kernel is ~1.4e-6 on the same sweep).
    Runs the pure-jnp math on CPU -- the Pallas tile calls the identical
    function."""
    import jax
    import jax.numpy as jnp
    from hmvec_tpu.ops.pallas_kernels import _nfw_uk_ds_math
    from hmvec_tpu.ops.sine_transform import _split_hi_lo
    from hmvec_tpu.models.profiles import nfw_uk_analytic

    rng = np.random.default_rng(0)
    nz, nm, nk = 4, 48, 201
    zs = np.linspace(0.1, 3.0, nz)
    cs = rng.uniform(1.2, 30.0, (nz, nm))
    rss = rng.uniform(0.003, 3.0, (nz, nm))
    ks = np.geomspace(1e-4, 100.0, nk)
    u64 = np.asarray(nfw_uk_analytic(jnp.asarray(ks), jnp.asarray(zs),
                                     jnp.asarray(cs), jnp.asarray(rss)))

    scales = jnp.asarray((rss * (1.0 + zs[:, None])).reshape(-1))
    cs64 = jnp.asarray(cs.reshape(-1))
    ln1pc = jnp.log1p(cs64)
    mc = ln1pc - cs64 / (1.0 + cs64)

    def pb(v):
        h, l = _split_hi_lo(v)
        return h[:, None], l[:, None]

    def pk(v):
        h, l = _split_hi_lo(v)
        return h[None, :], l[None, :]

    ksj = jnp.asarray(ks)
    args = (*pb(scales), *pb((1.0 + cs64) * scales), *pb(ln1pc),
            *pb(1.0 / mc), *pb(jnp.log(scales)),
            *pb(cs64 / (1.0 + cs64)), *pk(ksj), *pk(jnp.log(ksj)))
    with jax.enable_x64(False):
        u3 = np.asarray(_nfw_uk_ds_math(*args)).reshape(nz, nm, nk)
    assert np.abs(u3 - u64).max() < 2e-7


def test_v3_ds_math_large_phases():
    """Quadrant Cody-Waite reduction at extreme phases: x up to ~4e4
    (k_max * s2_max for adversarial grids) keeps n * PI2_HI exact
    (n <= 2^15 times an 8-bit hi word)."""
    import jax
    import jax.numpy as jnp
    from hmvec_tpu.ops.pallas_kernels import _nfw_uk_ds_math
    from hmvec_tpu.ops.sine_transform import _split_hi_lo
    from hmvec_tpu.models.profiles import nfw_uk_analytic

    zs = np.array([0.0])
    cs = np.array([[25.0, 30.0]])
    rss = np.array([[8.0, 12.0]])       # scales up to 12, s2 up to 372
    ks = np.geomspace(10.0, 100.0, 64)  # phases up to ~3.7e4
    u64 = np.asarray(nfw_uk_analytic(jnp.asarray(ks), jnp.asarray(zs),
                                     jnp.asarray(cs), jnp.asarray(rss)))
    scales = jnp.asarray((rss * (1.0 + zs[:, None])).reshape(-1))
    cs64 = jnp.asarray(cs.reshape(-1))
    ln1pc = jnp.log1p(cs64)
    mc = ln1pc - cs64 / (1.0 + cs64)

    def pb(v):
        h, l = _split_hi_lo(v)
        return h[:, None], l[:, None]

    def pk(v):
        h, l = _split_hi_lo(v)
        return h[None, :], l[None, :]

    ksj = jnp.asarray(ks)
    args = (*pb(scales), *pb((1.0 + cs64) * scales), *pb(ln1pc),
            *pb(1.0 / mc), *pb(jnp.log(scales)),
            *pb(cs64 / (1.0 + cs64)), *pk(ksj), *pk(jnp.log(ksj)))
    with jax.enable_x64(False):
        u3 = np.asarray(_nfw_uk_ds_math(*args)).reshape(1, 2, ks.size)
    # u ~ 1e-4-1e-3 at these phases; absolute agreement is what matters
    assert np.abs(u3 - u64).max() < 2e-7


def test_pallas_fused_contraction_matches_reference():
    """Round-5 fused serving kernel: u(k) + BOTH mass contractions in
    one VMEM pass (S1 = sum_m a u^2, S2 = sum_m b u) match the
    compose-it-yourself route through the exact u at the f32-sum level,
    including padded m rows and a multi-m-tile grid."""
    from hmvec_tpu.ops.pallas_kernels import nfw_contract_pallas
    rng = np.random.default_rng(3)
    nz, nm = 3, 37                       # nm far from the 256 tile
    cs = jnp.asarray(rng.uniform(2.0, 15.0, (nz, nm)))
    scales = jnp.asarray(rng.uniform(0.02, 1.5, (nz, nm)))
    a = jnp.asarray(rng.lognormal(0.0, 2.0, (nz, nm)))
    b = jnp.asarray(rng.lognormal(0.0, 2.0, (nz, nm)))
    ks = np.geomspace(1e-3, 50, 90)
    zs = np.zeros(nz)                    # scales passed directly
    u = np.asarray(nfw_uk_analytic(ks, zs, cs, scales))
    s1_ref = np.einsum("zm,zmk->zk", np.asarray(a), u**2)
    s2_ref = np.einsum("zm,zmk->zk", np.asarray(b), u)
    s1, s2 = nfw_contract_pallas(ks, scales, cs, a, b, interpret=True)
    assert np.max(np.abs(np.asarray(s1) / s1_ref - 1.0)) < 2e-5
    assert np.max(np.abs(np.asarray(s2) / s2_ref - 1.0)) < 2e-5
    # multi-m-tile accumulation path (tb smaller than nm)
    s1b, s2b = nfw_contract_pallas(ks, scales, cs, a, b, tb=16,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(s1b), np.asarray(s1), rtol=3e-6)
    np.testing.assert_allclose(np.asarray(s2b), np.asarray(s2), rtol=3e-6)
