"""Explicit numpy/scipy oracle for the exact (non-Limber) C_l module.

Independent of models/nonlimber.py by construction: linear (not log)
chi grids, direct scipy ``spherical_jn`` evaluation per (l, k) (no
FFTLog), j_l'' from the spherical Bessel ODE identity
    j'' = -2 j'/x - (1 - l(l+1)/x^2) j
(not the recurrence combination the jax side uses), and plain trapezoid
quadrature everywhere.  Used by tests/test_nonlimber.py to pin the
FFTLog path at the 1e-3 level.
"""

from __future__ import annotations

import numpy as np
from scipy.special import spherical_jn


def bessel_delta(phi, chis, ell, ks):
    """Delta_l(k) = int dchi phi(chi) j_l(k chi), trapezoid over chis."""
    x = np.asarray(ks)[:, None] * np.asarray(chis)[None, :]
    J = spherical_jn(int(ell), x)
    return np.trapezoid(np.asarray(phi)[None, :] * J, np.asarray(chis), axis=-1)


def bessel_delta_rsd(phi, chis, ell, ks):
    """-int dchi phi(chi) j_l''(k chi) via the Bessel ODE identity."""
    ell = int(ell)
    x = np.asarray(ks)[:, None] * np.asarray(chis)[None, :]
    j = spherical_jn(ell, x)
    jp = spherical_jn(ell, x, derivative=True)
    jpp = -2.0 * jp / x - (1.0 - ell * (ell + 1.0) / x**2) * j
    return -np.trapezoid(np.asarray(phi)[None, :] * jpp, np.asarray(chis),
                     axis=-1)


def galaxy_kernel(tw, chis, gzs, gdndz, bias=1.0, with_growth_rate=False):
    zg = tw.redshift_at_comoving_radial_distance(chis)
    gzs = np.asarray(gzs)
    dndz = np.asarray(gdndz)
    nz = np.interp(zg, gzs, dndz / np.trapezoid(dndz, gzs), left=0.0, right=0.0)
    D = tw.d_growth(1.0 / (1.0 + zg), norm="z0norm")
    out = nz * tw.h_of_z(zg) * D
    if with_growth_rate:
        return out * tw.growth_rate_f(zg)
    return bias * out


def lensing_kernel(tw, chis, zs, dndz=None):
    """phi_kappa(chi) = 1.5 Om_m H0^2 (1+z) D q / chi (no l(l+1)/k^2)."""
    chis = np.asarray(chis)
    zg = tw.redshift_at_comoving_radial_distance(chis)
    zs = np.atleast_1d(np.asarray(zs, dtype=np.float64))
    chistar = tw.comoving_radial_distance(zs)
    if zs.size == 1:
        q = np.where(zg <= zs[0], (chistar[0] - chis) / chistar[0], 0.0)
    else:
        nzn = np.asarray(dndz) / np.trapezoid(dndz, zs)
        integ = ((chistar[None, :] - chis[:, None]) / chistar[None, :]
                 * nzn[None, :])
        integ[zs[None, :] < zg[:, None]] = 0.0
        q = np.trapezoid(integ, zs, axis=-1)
    D = tw.d_growth(1.0 / (1.0 + zg), norm="z0norm")
    return 1.5 * tw.omm0 * tw.h_of_z(0.0) ** 2 * (1.0 + zg) * D * q / chis


def cl_from_deltas(ks, d1, d2, ks_pk, pk0):
    """(2/pi) int dln k k^3 P(k,0) d1 d2 with log-log interpolated P."""
    lnP = np.interp(np.log(ks), np.log(ks_pk), np.log(pk0))
    integ = ks**3 * np.exp(lnP) * d1 * d2
    return (2.0 / np.pi) * np.trapezoid(integ, np.log(ks), axis=-1)


def C_gg_exact(tw, ells, ks_pk, pk0, gzs, gdndz, bias=1.0, rsd=False,
               smag=None, n_chi=4000, n_k=1200, k_range=(2e-4, 1.0)):
    """Exact linear galaxy auto C_l by direct quadrature."""
    chi_lo = tw.comoving_radial_distance(float(np.min(gzs)))
    chi_hi = tw.comoving_radial_distance(float(np.max(gzs)))
    chis = np.linspace(max(chi_lo, 1.0), chi_hi, n_chi)
    ks = np.geomspace(*k_range, n_k)
    phi = galaxy_kernel(tw, chis, gzs, gdndz, bias)
    if rsd:
        phif = galaxy_kernel(tw, chis, gzs, gdndz, with_growth_rate=True)
    if smag is not None:
        chis_m = np.linspace(1.0, chi_hi, n_chi)
        phik = lensing_kernel(tw, chis_m, gzs, gdndz)
    out = []
    for ell in ells:
        d = bessel_delta(phi, chis, ell, ks)
        if rsd:
            d = d + bessel_delta_rsd(phif, chis, ell, ks)
        if smag is not None:
            dk = bessel_delta(phik, chis_m, ell, ks)
            d = d + (5.0 * smag - 2.0) * ell * (ell + 1.0) / ks**2 * dk
        out.append(cl_from_deltas(ks, d, d, ks_pk, pk0))
    return np.array(out)


def C_kg_exact(tw, ells, ks_pk, pk0, gzs, gdndz, lzs, bias=1.0,
               n_chi=4000, n_k=1200, k_range=(2e-4, 1.0)):
    chi_lo = tw.comoving_radial_distance(float(np.min(gzs)))
    chi_hi = tw.comoving_radial_distance(float(np.max(gzs)))
    chis_g = np.linspace(max(chi_lo, 1.0), chi_hi, n_chi)
    chis_k = np.linspace(1.0, tw.comoving_radial_distance(float(lzs)), n_chi)
    ks = np.geomspace(*k_range, n_k)
    phig = galaxy_kernel(tw, chis_g, gzs, gdndz, bias)
    phik = lensing_kernel(tw, chis_k, lzs)
    out = []
    for ell in ells:
        dg = bessel_delta(phig, chis_g, ell, ks)
        dk = (ell * (ell + 1.0) / ks**2
              * bessel_delta(phik, chis_k, ell, ks))
        out.append(cl_from_deltas(ks, dk, dg, ks_pk, pk0))
    return np.array(out)


def C_kk_exact(tw, ells, ks_pk, pk0, lzs, n_chi=4000, n_k=1200,
               k_range=(2e-4, 1.0)):
    chis = np.linspace(1.0, tw.comoving_radial_distance(float(lzs)), n_chi)
    ks = np.geomspace(*k_range, n_k)
    phik = lensing_kernel(tw, chis, lzs)
    out = []
    for ell in ells:
        d = (ell * (ell + 1.0) / ks**2
             * bessel_delta(phik, chis, ell, ks))
        out.append(cl_from_deltas(ks, d, d, ks_pk, pk0))
    return np.array(out)
