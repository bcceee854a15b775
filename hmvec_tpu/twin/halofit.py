"""Independent numpy/scipy oracle for Takahashi-2012 halofit.

Same published fitting formulas (arXiv:1208.2701 Eqs A4-A13; constants
necessarily identical) but deliberately DIFFERENT numerics from
models/halofit.py: adaptive scipy.integrate.quad for the Gaussian spectral
moments (vs the jax side's static 1536-point trapz grid) and scipy brentq
for the sigma(R)=1 scale (vs fixed-count bisection).  Agreement between
the two is then evidence the jax implementation's grid/bisection numerics
are converged, not just self-consistent.
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad
from scipy.optimize import brentq


def _moments_quad(d2lin_of_k, R):
    """sigma^2_G(R) and lnR-derivatives by adaptive quadrature."""
    def integ(f):
        val, _ = quad(lambda lnk: f(np.exp(lnk)),
                      np.log(1e-5), np.log(1e4), limit=400)
        return val

    s2 = integ(lambda k: d2lin_of_k(k) * np.exp(-(k * R) ** 2))
    d1 = integ(lambda k: d2lin_of_k(k) * np.exp(-(k * R) ** 2)
               * (-2.0 * (k * R) ** 2))
    d2 = integ(lambda k: d2lin_of_k(k) * np.exp(-(k * R) ** 2)
               * (4.0 * (k * R) ** 4 - 4.0 * (k * R) ** 2))
    dln1 = d1 / s2
    dln2 = d2 / s2 - dln1**2
    return s2, dln1, dln2


def twin_casarini_weff(twin, z, z_dec=1100.0):
    """Equivalent constant w at redshift z (PKequal criterion): matches
    the comoving distance from z to decoupling between the dynamic
    (w0, wa) model and the constant-w one.  Independent numerics from
    models/halofit.casarini_weff: adaptive scipy quad in z (vs the jax
    side's shared trapz grid in ln(1+z)) and brentq (vs fixed-count
    bisection)."""
    omm = twin.omm0 + twin.omnu0
    omr, omk, oml = twin.omr0, twin.omk0, twin.oml0

    def dist(w0, wa):
        def integrand(zq):
            zp1 = 1.0 + zq
            de = zp1 ** (3.0 * (1.0 + w0 + wa)) * np.exp(
                -3.0 * wa * (1.0 - 1.0 / zp1))
            return 1.0 / np.sqrt(omr * zp1**4 + omm * zp1**3
                                 + omk * zp1**2 + oml * de)
        val, _ = quad(integrand, z, z_dec, limit=400)
        return val

    target = dist(twin.w0, twin.wa)
    return brentq(lambda w: dist(w, 0.0) - target, -10.0, -0.01,
                  xtol=1e-10)


def twin_halofit_power(twin, zs, ks, version="takahashi"):
    """Nonlinear P(k,z) for a TwinCosmology (mirror of
    models/halofit.halofit_power; versions 'takahashi', 'original',
    'bird', 'peacock', 'casarini', with the CAMB-style
    massive-neutrino terms on the matching branches)."""
    fnu = twin.omnu0 / (twin.omm0 + twin.omnu0)
    omm0_tot = twin.omm0 + twin.omnu0
    kh_all = np.asarray(ks, dtype=np.float64) / twin.h
    zs = np.atleast_1d(np.asarray(zs, dtype=np.float64))
    ks = np.asarray(ks, dtype=np.float64)
    out = np.zeros((zs.size, ks.size))

    e2 = twin.e_of_z(zs) ** 2
    omz = twin.omz(zs)
    zp1 = 1.0 + zs
    de = zp1 ** (3.0 * (1.0 + twin.w0 + twin.wa)) * np.exp(
        -3.0 * twin.wa * (1.0 - 1.0 / zp1))
    omde = twin.oml0 * de / e2
    if version == "casarini":
        # PKequal: takahashi coefficients evaluated with the per-z
        # equivalent constant w (density history stays dynamic)
        wz = np.array([twin_casarini_weff(twin, z) for z in zs])
        version = "takahashi"
    else:
        wz = twin.w0 + twin.wa * (1.0 - 1.0 / zp1)
    omde_w = omde * (1.0 + wz)

    for i, z in enumerate(zs):
        def d2lin(k):
            k = np.atleast_1d(k)
            return (twin.plin(np.array([z]), k)[0] * k**3
                    / (2.0 * np.pi**2))

        def d2s(k):
            return float(d2lin(k)[0])

        def s2_of_lnR(lnR):
            s2, _, _ = _moments_quad(d2s, np.exp(lnR))
            return s2

        lnR = brentq(lambda lr: s2_of_lnR(lr) - 1.0,
                     np.log(1e-4), np.log(1e3), xtol=1e-12)
        Rsig = np.exp(lnR)
        ksig = 1.0 / Rsig
        _, dln1, dln2 = _moments_quad(d2s, Rsig)
        n = -3.0 - dln1
        C = -dln2

        if version == "takahashi":
            # Takahashi 2012 Eqs (A6-A13)
            an = 10.0 ** (1.5222 + 2.8553 * n + 2.3706 * n**2
                          + 0.9903 * n**3
                          + 0.2250 * n**4 - 0.6038 * C + 0.1749 * omde_w[i])
            bn = 10.0 ** (-0.5642 + 0.5864 * n + 0.5716 * n**2 - 1.5474 * C
                          + 0.2279 * omde_w[i])
            cn = 10.0 ** (0.3698 + 2.0404 * n + 0.8161 * n**2 + 0.5869 * C)
            gamma_n = 0.1971 - 0.0843 * n + 0.8460 * C
            alpha_n = abs(6.0835 + 1.3373 * n - 0.1959 * n**2 - 5.5274 * C)
            beta_n = (2.0379 - 0.7354 * n + 0.3157 * n**2 + 1.2490 * n**3
                      + 0.3980 * n**4 - 0.1682 * C)
            mu_n = 0.0
            nu_n = 10.0 ** (5.2105 + 3.6902 * n)

            f1 = omz[i] ** -0.0307
            f2 = omz[i] ** -0.0585
            f3 = omz[i] ** 0.0743
        elif version in ("original", "bird", "peacock"):
            # Smith et al 2003 App C (C9-C16)
            an = 10.0 ** (1.4861 + 1.8369 * n + 1.6762 * n**2
                          + 0.7940 * n**3 + 0.1670 * n**4 - 0.6206 * C)
            bn = 10.0 ** (0.9463 + 0.9466 * n + 0.3084 * n**2 - 0.9400 * C)
            cn = 10.0 ** (-0.2807 + 0.6669 * n + 0.3214 * n**2 - 0.0793 * C)
            gamma_n = 0.8649 + 0.2989 * n + 0.1631 * C
            alpha_n = 1.3884 + 0.3700 * n - 0.1452 * n**2
            beta_n = 0.8291 + 0.9854 * n + 0.3401 * n**2
            mu_n = 10.0 ** (-3.5442 + 0.1908 * n)
            nu_n = 10.0 ** (0.9589 + 1.2857 * n)
            frac = omde[i] / max(1.0 - omz[i], 1e-8)
            f1 = (frac * omz[i] ** -0.0307
                  + (1.0 - frac) * omz[i] ** -0.0732)
            f2 = (frac * omz[i] ** -0.0585
                  + (1.0 - frac) * omz[i] ** -0.1423)
            f3 = (frac * omz[i] ** 0.0743
                  + (1.0 - frac) * omz[i] ** 0.0725)
        else:
            raise ValueError(version)

        # version-specific modifications (Bird et al 2012 App A /
        # CAMB conventions; k-dependent fits in k_h = k/h).  The f_nu
        # terms apply to the WHOLE Smith-2003 branch as in CAMB
        # (original/bird/peacock); only extragam is bird-specific.
        if version == "bird":
            gamma_n = gamma_n + (0.3159 - 0.0765 * n - 0.8350 * C)
        if version == "takahashi":
            beta_n = beta_n + fnu * (1.081 + 0.395 * n**2)
        else:
            beta_n = beta_n + fnu * (-6.4868 + 1.4373 * n**2)

        d2l = d2lin(ks)
        if version == "takahashi":
            d2_ql = d2l * (1.0 + fnu * 26.3 * kh_all**2
                           / (1.0 + 1.5 * kh_all**2))
        else:
            d2_ql = d2l * (1.0 + fnu * 47.48 * kh_all**2
                           / (1.0 + 1.5 * kh_all**2))
        y = ks / ksig
        fy = y / 4.0 + y**2 / 8.0
        d2q = d2l * ((1.0 + d2_ql) ** beta_n / (1.0 + alpha_n * d2_ql)) \
            * np.exp(-fy)
        d2hp = (an * y ** (3.0 * f1)
                / (1.0 + bn * y**f2 + (cn * f3 * y) ** (3.0 - gamma_n)))
        d2h = d2hp / (1.0 + mu_n / y + nu_n / y**2)
        if version == "takahashi":
            d2h = d2h * (1.0 + 0.977 * fnu)
        else:
            d2h = d2h * (1.0 + fnu * (0.977 - 18.015 * (omm0_tot - 0.3)))
        pnl_i = (d2q + d2h) * (2.0 * np.pi**2) / ks**3
        if version == "peacock":
            plin_i = d2l * (2.0 * np.pi**2) / ks**3
            yp = kh_all / 10.0
            pnl_i = plin_i + (pnl_i - plin_i) * (1.0 + 2.0 * yp**2) \
                / (1.0 + yp**2)
        out[i] = pnl_i
    return out
