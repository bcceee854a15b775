"""Limber projections P(k,z) -> C(ell) and lensing windows.

Reference: hmvec/cosmology.py:506-597 and :867-904.  The reference builds a
scipy interp2d spline and evaluates it per-ell in a python loop (with a
dfitpack workaround); here the (ell, z) evaluation grid is one fused
gather+lerp over the whole C(ell) table, and the z-integral is a single
matmul against static trapezoid weights.

The reference's C_gy is broken (undefined names, cosmology.py:576,583);
implemented correctly here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.quadrature import trapz_traced
from . import background as bgmod


def lensing_window(bg, ezs, zs, dndz=None):
    """W_kappa(ezs) for a delta-function source (zs scalar) or a dndz
    (reference: cosmology.py:506-534)."""
    ezs = jnp.asarray(ezs)
    zs = jnp.atleast_1d(jnp.asarray(zs))
    H0 = bgmod.h_of_z(bg, 0.0)
    H = bgmod.h_of_z(bg, ezs)
    chis = bgmod.comoving_radial_distance(bg, ezs)
    chistar = bgmod.comoving_radial_distance(bg, zs)
    if zs.size == 1:
        integral = (chistar - chis) / chistar
        integral = jnp.where(ezs > zs[0], 0.0, integral)
    else:
        dndz = jnp.asarray(dndz)
        nznorm = trapz_traced(dndz, zs)
        dndzn = dndz / nznorm
        integrand = ((chistar[None, :] - chis[:, None]) / chistar[None, :]
                     * dndzn[None, :])
        integrand = jnp.where(zs[None, :] < ezs[:, None], 0.0, integrand)
        integral = trapz_traced(integrand, zs, axis=-1)
    return 1.5 * bg.omm0 * H0**2 * (1.0 + ezs) * chis / H * integral


def interp_pzk_at_curve(zs, ks, Pzks, zevals, kevals):
    """P(zevals, kevals[l, z]) by bilinear interpolation in (z, ln k).

    zs (nz,), ks (nk,), Pzks (nz, nk); zevals (nze,); kevals (nl, nze).
    Returns (nl, nze).
    """
    zs = jnp.asarray(zs)
    lks = jnp.log(jnp.asarray(ks))
    lke = jnp.log(kevals)

    if zs.size > 1:
        iz = jnp.clip(jnp.searchsorted(zs, zevals) - 1, 0, zs.size - 2)
        tz = (zevals - zs[iz]) / (zs[iz + 1] - zs[iz])
        tz = jnp.clip(tz, 0.0, 1.0)
        P_lo = Pzks[iz]        # (nze, nk)
        P_hi = Pzks[iz + 1]
        Pz = P_lo * (1.0 - tz)[:, None] + P_hi * tz[:, None]
    else:
        Pz = jnp.broadcast_to(Pzks[0][None, :], (zevals.shape[0], lks.size))

    ik = jnp.clip(jnp.searchsorted(lks, lke) - 1, 0, lks.size - 2)  # (nl,nze)
    tk = (lke - lks[ik]) / (lks[ik + 1] - lks[ik])
    tk = jnp.clip(tk, 0.0, 1.0)
    ze_idx = jnp.arange(zevals.shape[0])[None, :]
    p0 = Pz[ze_idx, ik]
    p1 = Pz[ze_idx, ik + 1]
    return p0 + tk * (p1 - p0)


def limber_integral(ells, zs, ks, Pzks, gzs, Wz1s, Wz2s, hzs, chis):
    """C(ell) = int dz (H/c) W1 W2 P(z, k=(ell+0.5)/chi) / chi^2.

    Same signature/semantics as the reference limber_integral
    (cosmology.py:867-904), fully vectorized over ells.
    """
    ells = jnp.asarray(ells)
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    hzs = jnp.broadcast_to(jnp.asarray(hzs), gzs.shape)
    Wz1s = jnp.broadcast_to(jnp.asarray(Wz1s), gzs.shape)
    Wz2s = jnp.broadcast_to(jnp.asarray(Wz2s), gzs.shape)
    chis = jnp.broadcast_to(jnp.asarray(chis), gzs.shape)

    prefactor = hzs * Wz1s * Wz2s / chis**2          # (nz,)
    kevals = (ells[:, None] + 0.5) / chis[None, :]   # (nl, nz)
    Pvals = interp_pzk_at_curve(jnp.atleast_1d(jnp.asarray(zs)), ks,
                                jnp.atleast_2d(Pzks), gzs, kevals)
    if gzs.size == 1:
        return Pvals[:, 0] * prefactor[0]
    return trapz_traced(Pvals * prefactor[None, :], gzs, axis=-1)


def C_kk(bg, ells, zs, ks, Pmm, lzs1=None, ldndz1=None, lzs2=None,
         ldndz2=None, lwindow1=None, lwindow2=None):
    """CMB/galaxy lensing convergence auto-spectrum (cosmology.py:563-568)."""
    zs = jnp.asarray(zs)
    if lwindow1 is None:
        lwindow1 = lensing_window(bg, zs, lzs1, ldndz1)
    if lwindow2 is None:
        lwindow2 = lensing_window(bg, zs, lzs2, ldndz2)
    chis = bgmod.comoving_radial_distance(bg, zs)
    hzs = bgmod.h_of_z(bg, zs)
    return limber_integral(ells, zs, ks, Pmm, zs, lwindow1, lwindow2, hzs, chis)


def C_kg(bg, ells, zs, ks, Pgm, gzs, gdndz=None, lzs=None, ldndz=None,
         lwindow=None):
    """Lensing x galaxy cross-spectrum (cosmology.py:536-547)."""
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    Wz1s = lensing_window(bg, gzs, lzs, ldndz) if lwindow is None else lwindow
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    if gzs.size > 1:
        nznorm = trapz_traced(jnp.asarray(gdndz), gzs)
        Wz2s = jnp.asarray(gdndz) / nznorm
    else:
        Wz2s = jnp.ones_like(gzs)
    return limber_integral(ells, zs, ks, Pgm, gzs, Wz1s, Wz2s, hzs, chis)


def _galaxy_windows(bg, gzs, gdndz, zmin, zmax, hzs):
    if gzs.size > 1:
        nznorm = trapz_traced(jnp.asarray(gdndz), gzs)
        W = jnp.asarray(gdndz) / nznorm
        return W, W
    dchi = (bgmod.comoving_radial_distance(bg, zmax)
            - bgmod.comoving_radial_distance(bg, zmin))
    return jnp.ones_like(gzs), 1.0 / dchi / hzs


def C_gg(bg, ells, zs, ks, Pgg, gzs, gdndz=None, zmin=None, zmax=None):
    """Galaxy auto-spectrum (cosmology.py:549-561)."""
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    Wz1s, Wz2s = _galaxy_windows(bg, gzs, gdndz, zmin, zmax, hzs)
    return limber_integral(ells, zs, ks, Pgg, gzs, Wz1s, Wz2s, hzs, chis)


def C_gy(bg, ells, zs, ks, Pgp, gzs, gdndz=None, zmin=None, zmax=None):
    """Galaxy x tSZ-y cross (fixes the reference's NameError,
    cosmology.py:570-583)."""
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    _, Wz2s = _galaxy_windows(bg, gzs, gdndz, zmin, zmax, hzs)
    return limber_integral(ells, zs, ks, Pgp, gzs, 1.0, Wz2s, hzs, chis)


def C_ky(bg, ells, zs, ks, Pym, lzs1=None, ldndz1=None, lwindow1=None):
    """Lensing x tSZ-y cross (cosmology.py:585-589)."""
    zs = jnp.asarray(zs)
    if lwindow1 is None:
        lwindow1 = lensing_window(bg, zs, lzs1, ldndz1)
    chis = bgmod.comoving_radial_distance(bg, zs)
    hzs = bgmod.h_of_z(bg, zs)
    return limber_integral(ells, zs, ks, Pym, zs, lwindow1, 1.0, hzs, chis)


def C_yy(bg, ells, zs, ks, Ppp):
    """tSZ-y auto-spectrum (cosmology.py:591-597)."""
    zs = jnp.asarray(zs)
    chis = bgmod.comoving_radial_distance(bg, zs)
    hzs = bgmod.h_of_z(bg, zs)
    return limber_integral(ells, zs, ks, Ppp, zs, 1.0, 1.0, hzs, chis)
