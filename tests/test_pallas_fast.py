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
