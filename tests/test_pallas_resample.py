"""Pallas pair-selection resample kernel vs the XLA gather path.

Runs the kernel in interpreter mode (tests are on CPU); on TPU the
compiled kernel is exercised by bench.py (config 2/5 accuracy gates).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.ops.pallas_resample import select_pairs
from hmvec_tpu.ops.sine_transform import resample_uniform_source


def test_select_pairs_exact_f64():
    rng = np.random.default_rng(1)
    B, nkt, nk = 13, 275, 97           # deliberately unaligned
    u = jnp.asarray(rng.standard_normal((B, nkt)))
    i0 = jnp.asarray(rng.integers(0, nkt - 1, (B, nk)), dtype=jnp.int32)
    u0, u1 = select_pairs(u, i0, interpret=True)
    ref0 = jnp.take_along_axis(u, i0, axis=-1)
    ref1 = jnp.take_along_axis(u, i0 + 1, axis=-1)
    # the f64 residual has up to 29 significant bits, so the CPU hi/lo
    # split rounds at ~2^-53 relative (on TPU f64 is natively a two-f32
    # pair and the split is exact)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(ref0), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(ref1), rtol=1e-14)


def test_select_pairs_3d_batch():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((3, 5, 130)))
    i0 = jnp.asarray(rng.integers(0, 129, (3, 5, 33)), dtype=jnp.int32)
    u0, u1 = select_pairs(u, i0, interpret=True)
    assert u0.shape == (3, 5, 33)
    ref0 = jnp.take_along_axis(u, i0, axis=-1)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(ref0), rtol=1e-14)
    ref1 = jnp.take_along_axis(u, i0 + 1, axis=-1)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(ref1), rtol=1e-14)


def test_resample_gather_vs_jvp_rule():
    """The custom_jvp rule's primal must equal the gather path, and the
    tangent must match jax.jvp of the gather path."""
    from hmvec_tpu.ops.sine_transform import (_pair_lerp_gather,
                                              _pair_lerp_tpu_jvp)
    rng = np.random.default_rng(3)
    B, nkt, nk = 4, 64, 21
    u = jnp.asarray(rng.standard_normal((B, nkt)))
    i0 = jnp.asarray(rng.integers(1, nkt - 2, (B, nk)), dtype=jnp.int32)
    frac = jnp.asarray(rng.uniform(0, 1, (B, nk)))
    du = jnp.asarray(rng.standard_normal((B, nkt)))
    dfrac = jnp.asarray(rng.standard_normal((B, nk)))

    val_ref, dval_ref = jax.jvp(lambda u_, f_: _pair_lerp_gather(u_, i0, f_),
                                (u, frac), (du, dfrac))
    val, dval = _pair_lerp_tpu_jvp((u, i0, frac),
                                   (du, jnp.zeros_like(i0, dtype=u.dtype),
                                    dfrac))
    np.testing.assert_allclose(np.asarray(val), np.asarray(val_ref),
                               rtol=1e-14)
    np.testing.assert_allclose(np.asarray(dval), np.asarray(dval_ref),
                               rtol=1e-14)


def test_resample_method_flag():
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((2, 3, 65)))
    scales = jnp.asarray(rng.uniform(0.1, 2.0, (2, 3)))
    ks = jnp.asarray(np.geomspace(1e-3, 50, 40))
    a = resample_uniform_source(u, 0.3, scales, ks, method="gather")
    b = resample_uniform_source(u, 0.3, scales, ks, method="auto")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
