import numpy as np
import scipy.special as sp
import jax
import jax.numpy as jnp

from hmvec_tpu.ops.special import sici, hyp2f1_growth, Wkr
from hmvec_tpu.ops.quadrature import trapz, simpson, gradient


def test_sici_vs_scipy():
    x = np.geomspace(1e-8, 1e6, 100000)
    si, ci = sici(x)
    si_s, ci_s = sp.sici(x)
    assert np.max(np.abs(np.asarray(si) - si_s)) < 1e-12
    assert np.max(np.abs(np.asarray(ci) - ci_s)) < 1e-12


def test_sici_branch_boundaries():
    for x0 in (4.0, 40.0):
        x = np.array([x0 * (1 - 1e-12), x0, x0 * (1 + 1e-12)])
        si, ci = sici(x)
        si_s, ci_s = sp.sici(x)
        np.testing.assert_allclose(np.asarray(si), si_s, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ci), ci_s, atol=1e-12)


def test_sici_grad_finite():
    g = jax.grad(lambda x: sici(x)[0])(2.0)
    # d Si/dx = sin(x)/x
    assert abs(g - np.sin(2.0) / 2.0) < 1e-12


def test_hyp2f1_growth():
    y = np.linspace(0.0, 16.0, 500)
    got = np.asarray(hyp2f1_growth(y))
    want = sp.hyp2f1(5.0 / 6.0, 1.5, 11.0 / 6.0, -y)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_wkr_matches_reference_formula():
    k = np.geomspace(1e-4, 2000, 1000)
    R = 2.0
    got = np.asarray(Wkr(k, R))
    kR = k * R
    want = 3.0 * (np.sin(kR) - kR * np.cos(kR)) / kR**3
    taylor = 1 - 0.1 * kR**2 + 0.00357142857143 * kR**4
    want = np.where(kR < 0.01, taylor, want)
    np.testing.assert_allclose(got, want, rtol=1e-14)


def test_trapz_matches_numpy():
    x = np.geomspace(0.1, 10, 57)
    y = np.sin(x) * x
    got = float(trapz(jnp.asarray(y), x))
    assert abs(got - np.trapezoid(y, x)) < 1e-14


def test_simpson_matches_scipy():
    from scipy.integrate import simpson as scipy_simpson
    for n in (100, 101, 10000):
        x = np.geomspace(1e-4, 2000, n)
        y = np.exp(-((np.log(x)) ** 2) / 8.0)
        got = float(simpson(jnp.asarray(y), x))
        want = scipy_simpson(y, x=x)
        assert abs(got - want) / abs(want) < 1e-12, (n, got, want)


def test_gradient_matches_numpy():
    x = np.sort(np.random.default_rng(0).uniform(0.1, 10, 200))
    f = np.sin(x)[None, :] * np.array([[1.0], [2.0]])
    got = np.asarray(gradient(jnp.asarray(f), x, axis=-1))
    want = np.gradient(f, x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
