"""Real-space shear statistics (EXTENSION): Wigner-d sums vs the
independent Jacobi-polynomial twin, plus exact identities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.models import shear
from hmvec_tpu.twin import wigner as twin_wigner


def _cls(ells):
    ells = np.asarray(ells, dtype=np.float64)
    return 100.0 / (ells + 1.0) ** 2 * (1.0 + 0.3 * np.sin(ells / 30.0))


THETAS = np.deg2rad(np.array([0.02, 0.1, 0.5, 1.0, 5.0, 30.0, 120.0, 178.0]))


@pytest.mark.parametrize("mn", [(0, 0), (2, 2), (2, -2), (2, 0)])
def test_wigner_d_sum_vs_jacobi_twin(mn):
    """lax.scan recurrence vs scipy eval_jacobi oracle for every spin pair,
    including the l0 < lmin rows-are-ignored convention."""
    ells = np.arange(0, 300)
    cls = _cls(ells)
    got = np.asarray(shear.wigner_d_sum(ells, cls, THETAS, mn=mn))
    lmin = max(abs(mn[0]), abs(mn[1]))
    keep = ells >= lmin
    # atol covers catastrophic-cancellation elements near theta = pi, where
    # the alternating sum leaves ~1e-12 of an O(10) total
    want = twin_wigner.wigner_d_sum(ells[keep], cls[keep], THETAS, mn=mn)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_wigner_00_reduces_to_legendre_sum():
    from hmvec_tpu.models.cov import angular_correlation
    ells = np.arange(2, 400)
    cls = _cls(ells)
    got = np.asarray(shear.wigner_d_sum(ells, cls, THETAS, mn=(0, 0)))
    want = np.asarray(angular_correlation(ells, cls, THETAS))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_wigner_d_sum_batched_and_validation():
    ells = np.arange(2, 120)
    cls = _cls(ells)
    w1 = np.asarray(shear.wigner_d_sum(ells, cls, THETAS, mn=(2, 2)))
    wb = np.asarray(shear.wigner_d_sum(ells, np.stack([cls, 3.0 * cls]),
                                       THETAS, mn=(2, 2)))
    assert wb.shape == (2, THETAS.size)
    np.testing.assert_allclose(wb[0], w1, rtol=1e-12)
    np.testing.assert_allclose(wb[1], 3.0 * w1, rtol=1e-12)
    with pytest.raises(ValueError, match="unsupported"):
        shear.wigner_d_sum(ells, cls, THETAS, mn=(3, 1))
    with pytest.raises(AssertionError, match="consecutive"):
        shear.wigner_d_sum(np.array([2, 4]), cls[:2], THETAS)


def test_theta_zero_limits():
    """d^l_{22}(0) = 1 and d^l_{2,-2}(0) = 0 exactly, so xi_+(0) is the
    total power sum and xi_-(0) = 0."""
    ells = np.arange(2, 200)
    cls = _cls(ells)
    th0 = np.array([0.0])
    xp = np.asarray(shear.xi_plus(ells, cls, th0, input_kind="shear"))
    want = np.sum((2 * ells + 1) / (4 * np.pi) * cls)
    np.testing.assert_allclose(xp[0], want, rtol=1e-12)
    xm = np.asarray(shear.xi_minus(ells, cls, th0, input_kind="shear"))
    assert abs(xm[0]) < 1e-14 * abs(want)


def test_kappa_to_shear_factor():
    # (l+2)(l-1)/(l(l+1)): 2/3 at l=2, -> 1 at high l, 0 below l=2
    f = np.asarray(shear.kappa_to_shear_cl_factor(np.array([0, 1, 2, 3, 2000])))
    np.testing.assert_allclose(f[2], 2.0 / 3.0, rtol=1e-12)
    np.testing.assert_allclose(f[3], 5.0 / 6.0, rtol=1e-12)
    assert f[0] == 0.0 and f[1] == 0.0
    assert abs(f[4] - 1.0) < 1e-5


def test_xi_plus_convergence_input_and_b_modes():
    ells = np.arange(2, 150)
    cle = _cls(ells)
    clb = 0.25 * _cls(ells)
    fac = np.asarray(shear.kappa_to_shear_cl_factor(ells))
    # convergence input == shear input with the factor pre-applied
    a = np.asarray(shear.xi_plus(ells, cle, THETAS, input_kind="convergence"))
    b = np.asarray(shear.xi_plus(ells, cle * fac, THETAS, input_kind="shear"))
    np.testing.assert_allclose(a, b, rtol=1e-12)
    # B modes add in xi_+ and subtract in xi_-
    xp = np.asarray(shear.xi_plus(ells, cle, THETAS, cl_b=clb,
                                  input_kind="shear"))
    xp0 = np.asarray(shear.xi_plus(ells, cle, THETAS, input_kind="shear"))
    xpb = np.asarray(shear.xi_plus(ells, clb, THETAS, input_kind="shear"))
    np.testing.assert_allclose(xp, xp0 + xpb, rtol=1e-11, atol=1e-15)
    xm = np.asarray(shear.xi_minus(ells, cle, THETAS, cl_b=clb,
                                   input_kind="shear"))
    xm0 = np.asarray(shear.xi_minus(ells, cle, THETAS, input_kind="shear"))
    xmb = np.asarray(shear.xi_minus(ells, clb, THETAS, input_kind="shear"))
    np.testing.assert_allclose(xm, xm0 - xmb, rtol=1e-11, atol=1e-15)


def test_gamma_t_vs_twin():
    """gamma_t from a C^{g kappa}-style spectrum: the sqrt-factor
    conversion plus the (2,0) transform, against the twin end to end."""
    ells = np.arange(2, 250)
    clkg = _cls(ells)
    got = np.asarray(shear.gamma_t(ells, clkg, THETAS,
                                   input_kind="convergence"))
    fac = np.sqrt(np.asarray(shear.kappa_to_shear_cl_factor(ells)))
    want = twin_wigner.wigner_d_sum(ells, clkg * fac, THETAS, mn=(2, 0))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    with pytest.raises(ValueError, match="input_kind"):
        shear.gamma_t(ells, clkg, THETAS, input_kind="bogus")


def test_shear_grad_and_jit_safe():
    """The transforms are jit-able and differentiable wrt the Cls (linear)
    and wrt theta (through the recurrence's cos theta)."""
    ells = np.arange(2, 80)
    cls = jnp.asarray(_cls(ells))
    th = jnp.asarray(THETAS[:3])

    f = jax.jit(lambda c: shear.xi_plus(ells, c, th, input_kind="shear").sum())
    g = jax.grad(f)(cls)
    assert np.all(np.isfinite(np.asarray(g)))
    # linear in cls: gradient must equal the transform of unit vectors
    np.testing.assert_allclose(
        float(f(cls)), float(jnp.dot(g, cls)), rtol=1e-10)

    h = jax.grad(lambda t: shear.gamma_t(
        ells, cls, t, input_kind="convergence").sum())(th)
    # finite-difference check on theta
    eps = 1e-6
    fd = (np.asarray(shear.gamma_t(ells, cls, th + eps,
                                   input_kind="convergence"))
          - np.asarray(shear.gamma_t(ells, cls, th - eps,
                                     input_kind="convergence"))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(h), fd, rtol=1e-5)


# ---------------- real-space Gaussian covariance ----------------

def test_xi_gaussian_cov_vs_explicit_loop():
    """wigner_d_outer_sum against an explicit scipy-Jacobi double loop for
    every exposed kind pairing, plus the physical sanity of the assembled
    covariance (symmetric PSD-ish diagonal for the auto case)."""
    from hmvec_tpu.models.shear import xi_gaussian_cov, wigner_d_outer_sum
    from hmvec_tpu.twin.wigner import wigner_d
    rng = np.random.default_rng(3)
    lmax = 60
    ells = np.arange(2, lmax + 1)
    ls = ells.astype(float)
    cl = 1e-9 * (ls / 100.0) ** -1.3 * (1.0 + 0.2 * rng.standard_normal(ls.size)) ** 2
    th = np.deg2rad(np.array([0.3, 1.0, 3.0]))

    wls = (2.0 * ls + 1.0) / (16.0 * np.pi**2 * 0.5) * (2.0 * cl**2)
    for mn1, mn2 in (((2, 2), (2, 2)), ((2, 2), (2, -2)),
                     ((2, 0), (2, 0)), ((0, 0), (0, 0)),
                     ((0, 0), (2, 2))):
        got = np.asarray(wigner_d_outer_sum(ells, wls, th, mn1=mn1, mn2=mn2))
        want = np.zeros((th.size, th.size))
        for l, w in zip(ells, wls):
            d1 = wigner_d(l, mn1[0], mn1[1], th)
            d2 = wigner_d(l, mn2[0], mn2[1], th)
            want += w * np.outer(d1, d2)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-30)

    cov = np.asarray(xi_gaussian_cov(ells, cl, cl, cl, cl, th,
                                     kind1="plus", kind2="plus", fsky=0.5))
    np.testing.assert_allclose(cov, cov.T, rtol=1e-12)
    assert np.all(np.diag(cov) > 0)
    # off-diagonals bounded by the Cauchy-Schwarz of the diagonal
    s = np.sqrt(np.diag(cov))
    assert np.all(np.abs(cov) <= np.outer(s, s) * (1.0 + 1e-12))


def test_xi_gaussian_cov_w_reduces_to_legendre():
    """kind='w' must reproduce the explicit Legendre-sum covariance."""
    from hmvec_tpu.models.shear import xi_gaussian_cov
    from scipy.special import eval_legendre
    lmax = 40
    ells = np.arange(0, lmax + 1)
    ls = ells.astype(float)
    cl = 1.0 / (ls + 10.0) ** 2
    th = np.deg2rad(np.array([0.5, 2.0]))
    got = np.asarray(xi_gaussian_cov(ells, cl, cl, cl, cl, th,
                                     kind1="w", kind2="w", fsky=1.0))
    want = np.zeros((2, 2))
    for l in ells:
        P = eval_legendre(l, np.cos(th))
        want += (2 * l + 1.0) / (16.0 * np.pi**2) * 2.0 * cl[l] ** 2 \
            * np.outer(P, P)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_xi_gaussian_cov_gammat_mixed_spectra():
    """gamma_t covariance uses C^gg_tot C^EE_tot + (C^gE)^2 per l; check
    against the explicit loop with three distinct spectra."""
    from hmvec_tpu.models.shear import xi_gaussian_cov
    from hmvec_tpu.twin.wigner import wigner_d
    lmax = 50
    ells = np.arange(2, lmax + 1)
    ls = ells.astype(float)
    cgg = 1e-7 * (ls / 100.0) ** -1.0
    cee = 1e-9 * (ls / 100.0) ** -1.4
    cge = 0.6 * np.sqrt(cgg * cee)
    th = np.deg2rad(np.array([0.4, 1.5, 4.0]))
    got = np.asarray(xi_gaussian_cov(ells, cgg, cee, cge, cge, th,
                                     kind1="gammat", kind2="gammat",
                                     fsky=0.3))
    want = np.zeros((3, 3))
    for i, l in enumerate(ells):
        d = wigner_d(l, 2, 0, th)
        want += (2 * l + 1.0) / (16.0 * np.pi**2 * 0.3) \
            * (cgg[i] * cee[i] + cge[i] ** 2) * np.outer(d, d)
    np.testing.assert_allclose(got, want, rtol=1e-10)
