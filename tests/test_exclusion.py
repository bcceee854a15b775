"""Halo-exclusion correction to the 2-halo term (EXTENSION).

The reference's 2-halo term integrates halo pairs down to zero
separation (hmvec.py:528-572); power.exclusion_correction applies the
Baldauf et al 2013 sharp-exclusion form 1 + xi_excl = (1 + xi) theta(r-R)
as an exact finite-range Fourier correction.

Oracles: scipy adaptive quad of -4 pi int_0^R (1 + xi(r)) j0(kr) r^2 dr
with xi interpolated from the SAME FFTLog table the jax side uses
(isolates the masked-matmul quadrature), the analytic excluded-volume
limit at low k, and an analytic top-hat identity at xi = 0.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.models import power as pwr
from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.ops.fftlog import correlation_function

ZS = np.array([0.3, 1.2])
KS = np.geomspace(1e-4, 100.0, 640)
MS = np.geomspace(1e11, 1e16, 40)


def test_zero_xi_reduces_to_analytic_tophat():
    """With P = 0 (so xi = 0) the correction is exactly the excluded
    volume times the top-hat window: -(4 pi/3) R^3 3 j1(kR)/(kR)."""
    R = 4.0
    dp = np.asarray(pwr.exclusion_correction(KS, np.zeros((1, KS.size)), R))
    x = KS * R
    expected = -(4.0 * np.pi / 3.0) * R**3 * (
        3.0 * (np.sin(x) - x * np.cos(x)) / x**3)
    np.testing.assert_allclose(dp[0], expected, rtol=0, atol=1e-12 * R**3)


def test_matches_scipy_quad_oracle():
    """Full correction vs adaptive quad on the same xi table."""
    from scipy.integrate import quad
    from scipy.interpolate import interp1d

    h = HaloModel(ZS, KS, ms=MS)
    p2h = np.asarray(h.get_power_2halo("nfw"))
    rs, xi = correlation_function(KS, jnp.asarray(p2h))
    rs, xi = np.asarray(rs), np.asarray(xi)

    R = np.array([6.0, 4.0])
    dp = np.asarray(pwr.exclusion_correction(KS, p2h, R))

    for iz, Rz in enumerate(R):
        xi_f = interp1d(np.log(rs), xi[iz], kind="cubic")
        for ik in [np.argmin(np.abs(KS - kk)) for kk in (0.01, 0.3, 1.0)]:
            k = KS[ik]
            val, _ = quad(
                lambda r: (1.0 + xi_f(np.log(r))) * np.sinc(k * r / np.pi)
                * r**2, rs[0], Rz, limit=400)
            # the [0, rs[0]] sliver of the '1' piece (xi piece there is
            # O(xi(0) rmin^3), far below tolerance)
            val += rs[0] ** 3 / 3.0
            oracle = -4.0 * np.pi * val
            # scale-aware: near k ~ 1/R the correction passes through
            # zero, where a pure relative tolerance is meaningless
            # 2e-3 relative + the half-grid-cell logistic-vs-sharp edge
            # difference measured against the k->0 scale
            tol = 2e-3 * abs(oracle) + 4e-4 * abs(dp[iz, 0])
            assert abs(dp[iz, ik] - oracle) < tol, (iz, k)


def test_low_k_is_minus_excluded_volume():
    """k -> 0: Delta P -> -4 pi int_0^R (1 + xi) r^2 dr < 0 and at least
    the excluded volume in magnitude (xi > 0 on halo scales)."""
    h = HaloModel(ZS, KS, ms=MS)
    p2h = np.asarray(h.get_power_2halo("nfw"))
    R = 5.0
    dp = np.asarray(pwr.exclusion_correction(KS, p2h, R))
    vol = 4.0 * np.pi / 3.0 * R**3
    assert np.all(dp[:, 0] < -vol)
    assert np.all(dp[:, 0] > -30.0 * vol)


def test_class_api_auto_exclusion():
    """exclusion='auto' uses the bias-weighted touching radius; the
    corrected 2-halo is suppressed at quasi-linear k and untouched when
    exclusion=None."""
    h = HaloModel(ZS, KS, ms=MS)
    p0 = np.asarray(h.get_power_2halo("nfw"))
    p1 = np.asarray(h.get_power_2halo("nfw", exclusion="auto"))
    r_ex = np.asarray(h.exclusion_radius())
    # number x bias weighting is dominated by the low-mass end, so the
    # mean touching radius is sub-Mpc (user-supplied arrays serve
    # mass-selected samples)
    assert np.all((r_ex > 0.1) & (r_ex < 20.0)), r_ex
    np.testing.assert_array_equal(
        np.asarray(h.get_power_2halo("nfw")), p0)
    ik = np.argmin(np.abs(KS - 0.5))
    assert np.all(p1[:, ik] < p0[:, ik])
    assert np.isfinite(p1).all()
    # the total get_power threads the kwarg
    pt = np.asarray(h.get_power("nfw", exclusion="auto"))
    p1h = np.asarray(h.get_power_1halo("nfw"))
    np.testing.assert_allclose(pt, p1h + p1, rtol=1e-12)


def test_grad_through_exclusion_radius():
    """d(Delta P)/dR carries the -4 pi (1+xi(R)) j0(kR) R^2 edge term
    (the logistic mask keeps it in autodiff); check against central
    finite differences."""
    h = HaloModel(ZS, KS, ms=MS)
    p2h = jnp.asarray(np.asarray(h.get_power_2halo("nfw")))
    ik = int(np.argmin(np.abs(KS - 0.2)))

    def f(R):
        return pwr.exclusion_correction(KS, p2h, R)[0, ik]

    g = float(jax.grad(f)(5.0))
    eps = 1e-3
    fd = float((f(5.0 + eps) - f(5.0 - eps)) / (2.0 * eps))
    assert abs(g / fd - 1.0) < 5e-2, (g, fd)


def test_unknown_exclusion_string_raises_clearly():
    h = HaloModel(ZS, KS, ms=MS)
    import pytest
    with pytest.raises(ValueError, match="auto"):
        h.get_power_2halo("nfw", exclusion="Auto")
