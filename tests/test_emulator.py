"""Neural emulator layer (models/emulator.py).

The reference has no emulation capability at all; these tests pin the
training loop's correctness properties rather than any golden weights:
held-out accuracy on a smooth target, differentiability of the fitted
surrogate, data-parallel (sharded sample axis) equivalence with the
single-device fit, and serialization round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.models.emulator import (Emulator, fit_emulator, sample_params,
                                       pipeline_target, save_emulator,
                                       load_emulator)

LO = np.array([0.5, -1.0])
HI = np.array([2.0, 1.0])
_XG = jnp.linspace(0.0, 1.0, 32)


def _smooth_fn(theta):
    # a smooth positive 2-parameter family over 32 outputs
    a, b = theta[0], theta[1]
    return jnp.exp(b * _XG) * (1.0 + a * jnp.sin(3.0 * _XG)) + 2.0


@pytest.fixture(scope="module")
def fitted():
    em, info = fit_emulator(_smooth_fn, LO, HI, n_train=512, n_val=64,
                            widths=(64, 64), steps=2500, learning_rate=5e-3,
                            seed=3, key=0)
    return em, info


def test_sample_params_box():
    pts = sample_params(LO, HI, 64, seed=1)
    assert pts.shape == (64, 2)
    assert np.all(pts >= LO) and np.all(pts <= HI)
    # low-discrepancy: each half of the box gets close to half the points
    frac = (pts[:, 0] < 0.5 * (LO[0] + HI[0])).mean()
    assert 0.4 < frac < 0.6


def test_heldout_accuracy(fitted):
    em, info = fitted
    assert info["val_max_rel"] < 2e-2
    assert info["val_rms_rel"] < 5e-3
    # training converged (late loss well under the unit variance of the
    # standardized targets)
    assert float(np.mean(info["losses"][-50:])) < 1e-4


def test_batched_and_single_calls_agree(fitted):
    em, _ = fitted
    thetas = sample_params(LO, HI, 8, seed=7)
    batch = np.asarray(em(jnp.asarray(thetas)))
    rows = np.stack([np.asarray(em(jnp.asarray(t))) for t in thetas])
    np.testing.assert_allclose(batch, rows, rtol=1e-6)
    assert batch.shape == (8, 32)


def test_grad_through_emulator(fitted):
    em, _ = fitted
    theta0 = jnp.array([1.2, 0.3])
    jac = jax.jacfwd(em)(theta0)
    assert jac.shape == (32, 2)
    assert np.all(np.isfinite(np.asarray(jac)))
    # matches central finite differences of the emulator itself
    eps = 1e-3
    for i in range(2):
        dp = theta0.at[i].add(eps)
        dm = theta0.at[i].add(-eps)
        fd = (np.asarray(em(dp)) - np.asarray(em(dm))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(jac[:, i]), fd,
                                   rtol=5e-3, atol=5e-4)


def test_sharded_training_matches_single_device():
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    kwargs = dict(n_train=256, n_val=32, widths=(32, 32), steps=300,
                  learning_rate=5e-3, seed=5, key=1)
    em0, info0 = fit_emulator(_smooth_fn, LO, HI, **kwargs)
    em1, info1 = fit_emulator(_smooth_fn, LO, HI, mesh=mesh, **kwargs)
    # identical data + init; only the f32 reduction order differs
    np.testing.assert_allclose(info0["losses"][-1], info1["losses"][-1],
                               rtol=1e-3, atol=1e-7)
    thetas = jnp.asarray(sample_params(LO, HI, 16, seed=11))
    np.testing.assert_allclose(np.asarray(em0(thetas)),
                               np.asarray(em1(thetas)), rtol=2e-3)


def test_save_load_roundtrip(tmp_path, fitted):
    em, _ = fitted
    path = tmp_path / "em.npz"
    save_emulator(em, path)
    em2 = load_emulator(path)
    thetas = jnp.asarray(sample_params(LO, HI, 8, seed=2))
    np.testing.assert_allclose(np.asarray(em(thetas)),
                               np.asarray(em2(thetas)), rtol=0, atol=0)
    assert em2.log_y == em.log_y


def test_log_y_requires_positive():
    def bad(theta):
        return jnp.array([theta[0] - 10.0])
    with pytest.raises(ValueError):
        fit_emulator(bad, [0.0], [1.0], n_train=8, n_val=0, steps=5,
                     widths=(4,), log_y=True)


def test_pipeline_pmm_emulator_smoke():
    """End to end on the real pipeline: emulate log P_mm(z,k) vs omch2."""
    from hmvec_tpu import pipeline
    zs = np.array([0.3, 0.8])
    ks = np.geomspace(1e-3, 5.0, 24)
    ms = np.geomspace(1e11, 1e15, 12)
    pmm = pipeline.make_pmm_fn(zs, ks, ms, jit=False)
    target = pipeline_target(pmm, ("omch2",))
    em, info = fit_emulator(target, [0.10], [0.14], n_train=48, n_val=8,
                            widths=(32, 32), steps=1200, learning_rate=8e-3,
                            log_y=True, chunk=16, seed=9, key=2)
    # a 1-parameter smooth family is easy: held-out under 1%
    assert info["val_max_rel"] < 1e-2
    out = em(jnp.array([0.12]))
    assert out.shape == (zs.size * ks.size,)
    assert np.all(np.asarray(out) > 0)  # de-logged power is positive
