"""Survey-window convolution of power multipoles (models/rsd_obs.py):
exact 3j coupling coefficients vs the published Wilson-17 entries and a
numeric Legendre-product oracle; unit-window identity; isotropic
Gaussian-window oracle via brute-force inverse Bessel quadrature;
anisotropic mixing."""

import numpy as np
import jax.numpy as jnp
import pytest

import hmvec_tpu as h
from hmvec_tpu.models import rsd_obs
from hmvec_tpu.models.rsd import correlation_multipoles


@pytest.fixture(scope="module")
def kaiser_mp():
    cos = h.Cosmology(accuracy="low")
    ks = np.geomspace(1e-4, 100.0, 2048)
    pk = np.asarray(cos.P_lin(jnp.asarray(ks), np.array([0.0])))[0]
    fac = h.kaiser_multipole_factors(2.0, 0.75)
    return ks, {l: jnp.asarray(fac[l] * pk) for l in (0, 2, 4)}


def test_coupling_vs_wilson_and_quadrature():
    """window_coupling against the Wilson et al. 2017 eq. 2.18-2.20
    rationals AND the defining Legendre-product integrals
    (2l+1)/2 int L_l L_l1 L_l2 dmu (GL, exact for polynomials)."""
    C = rsd_obs.window_coupling((0, 2, 4), (0, 2, 4), (0, 2, 4, 6, 8))
    wilson = {
        (0, 0, 0): 1.0, (0, 2, 2): 1 / 5, (0, 4, 4): 1 / 9,
        (2, 0, 2): 1.0, (2, 2, 0): 1.0, (2, 2, 2): 2 / 7,
        (2, 2, 4): 2 / 7, (2, 4, 2): 2 / 7,
        (2, 4, 4): 100 / 693, (2, 4, 6): 25 / 143,
        (4, 0, 4): 1.0, (4, 2, 2): 18 / 35, (4, 2, 4): 20 / 77,
        (4, 2, 6): 45 / 143, (4, 4, 0): 1.0, (4, 4, 2): 20 / 77,
        (4, 4, 4): 162 / 1001, (4, 4, 6): 20 / 143,
        (4, 4, 8): 490 / 2431,
    }
    iout = {0: 0, 2: 1, 4: 2}
    iwin = {0: 0, 2: 1, 4: 2, 6: 3, 8: 4}
    for (l, l1, l2), val in wilson.items():
        np.testing.assert_allclose(C[iout[l], iout[l1], iwin[l2]], val,
                                   rtol=1e-14, err_msg=str((l, l1, l2)))
    # quadrature oracle for EVERY entry
    x, w = np.polynomial.legendre.leggauss(16)
    legs = {l: np.polynomial.legendre.Legendre.basis(l)(x)
            for l in (0, 2, 4, 6, 8)}
    for a, l in enumerate((0, 2, 4)):
        for b, l1 in enumerate((0, 2, 4)):
            for c, l2 in enumerate((0, 2, 4, 6, 8)):
                want = (2 * l + 1) / 2.0 * np.sum(
                    w * legs[l] * legs[l1] * legs[l2])
                np.testing.assert_allclose(C[a, b, c], want, atol=1e-13)


def test_unit_window_identity(kaiser_mp):
    """Q_0 = 1 (infinite survey) returns the input multipoles through
    the full FFTLog roundtrip."""
    ks, mp = kaiser_mp
    ssw = np.geomspace(0.1, 5e4, 32)
    out = rsd_obs.window_convolve_multipoles(
        ks, mp, ssw, {0: np.ones_like(ssw)})
    sel = (ks > 0.005) & (ks < 0.5)
    for l in (0, 2, 4):
        np.testing.assert_allclose(np.asarray(out[l])[sel],
                                   np.asarray(mp[l])[sel], rtol=1e-7)


def test_gaussian_window_vs_brute_bessel(kaiser_mp):
    """Isotropic window Q_0(s) = exp(-s^2/2R^2): xi_hat_l = xi_l Q_0
    exactly, so the convolved P_hat_l must match a brute-force
    scipy spherical-Bessel quadrature of xi_l Q_0."""
    from scipy.special import spherical_jn
    from scipy.integrate import simpson
    ks, mp = kaiser_mp
    R = 300.0
    ssw = np.geomspace(0.1, 5e4, 1200)
    q0 = np.exp(-(ssw**2) / (2 * R**2))
    out = rsd_obs.window_convolve_multipoles(ks, mp, ssw, {0: q0})
    ss, xi = correlation_multipoles(ks, mp)
    ss_np = np.asarray(ss)
    damp = np.exp(-(ss_np**2) / (2 * R**2))
    lnss = np.log(ss_np)
    for l in (0, 2, 4):
        xl = np.asarray(xi[l]) * damp
        for ktest in (0.02, 0.1):
            brute = 4 * np.pi * (-1.0) ** (l // 2) * simpson(
                xl * spherical_jn(l, ktest * ss_np) * ss_np**3, x=lnss)
            got = float(np.interp(np.log(ktest), np.log(ks),
                                  np.asarray(out[l])))
            np.testing.assert_allclose(got, brute, rtol=2e-4,
                                       err_msg=f"l={l} k={ktest}")
    # k >> 1/R: the window is irrelevant (the k << 1/R constant limit
    # is outside the documented validity range -- the k^-1.5 undressing
    # amplifies FFT roundtrip noise there)
    sel_hi = (ks > 0.1) & (ks < 0.3)
    r_hi = np.asarray(out[0])[sel_hi] / np.asarray(mp[0])[sel_hi]
    assert np.allclose(r_hi, 1.0, atol=0.05)


def test_anisotropic_mixing(kaiser_mp):
    """A pure Q_2 window leaks the monopole into the quadrupole with
    coefficient C[2,0,2] = 1: check against the explicit mixed-xi
    assembly."""
    ks, mp = kaiser_mp
    ssw = np.geomspace(0.1, 5e4, 1200)
    q0 = np.exp(-(ssw**2) / (2 * 300.0**2))
    q2 = 0.3 * q0
    out = rsd_obs.window_convolve_multipoles(ks, mp, ssw,
                                             {0: q0, 2: q2})
    # independent assembly: mix xi's explicitly with numeric Legendre
    # projection of (sum xi_l1 L_l1)(sum Q_l2 L_l2)
    ss, xi = correlation_multipoles(ks, mp)
    ss_np = np.asarray(ss)
    Q0 = np.interp(np.log(ss_np), np.log(ssw), q0, left=q0[0], right=0.0)
    Q2 = np.interp(np.log(ss_np), np.log(ssw), q2, left=q2[0], right=0.0)
    x, w = np.polynomial.legendre.leggauss(16)
    legs = {l: np.polynomial.legendre.Legendre.basis(l)(x)
            for l in (0, 2, 4)}
    xi_tot = sum(np.asarray(xi[l])[None, :] * legs[l][:, None]
                 for l in (0, 2, 4))
    Q_tot = Q0[None, :] * legs[0][:, None] + Q2[None, :] * legs[2][:, None]
    from scipy.special import spherical_jn
    from scipy.integrate import simpson
    for l in (0, 2):
        xihat = (2 * l + 1) / 2.0 * np.einsum(
            "m,ms->s", w * legs[l], xi_tot * Q_tot)
        ktest = 0.05
        brute = 4 * np.pi * (-1.0) ** (l // 2) * simpson(
            xihat * spherical_jn(l, ktest * ss_np) * ss_np**3,
            x=np.log(ss_np))
        got = float(np.interp(np.log(ktest), np.log(ks),
                              np.asarray(out[l])))
        np.testing.assert_allclose(got, brute, rtol=2e-4,
                                   err_msg=f"l={l}")