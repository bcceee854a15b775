"""Numpy twin of the Limber layer (same bilinear-in-(z, ln k) spec as
models/limber.py, so parity is exact in f64)."""

from __future__ import annotations

import numpy as np


def interp_pzk_at_curve(zs, ks, Pzks, zevals, kevals):
    zs = np.asarray(zs)
    lks = np.log(np.asarray(ks))
    lke = np.log(kevals)
    if zs.size > 1:
        iz = np.clip(np.searchsorted(zs, zevals) - 1, 0, zs.size - 2)
        tz = np.clip((zevals - zs[iz]) / (zs[iz + 1] - zs[iz]), 0.0, 1.0)
        Pz = Pzks[iz] * (1 - tz)[:, None] + Pzks[iz + 1] * tz[:, None]
    else:
        Pz = np.broadcast_to(Pzks[0][None, :], (zevals.shape[0], lks.size))
    ik = np.clip(np.searchsorted(lks, lke) - 1, 0, lks.size - 2)
    tk = np.clip((lke - lks[ik]) / (lks[ik + 1] - lks[ik]), 0.0, 1.0)
    ze_idx = np.arange(zevals.shape[0])[None, :]
    p0 = Pz[ze_idx, ik]
    p1 = Pz[ze_idx, ik + 1]
    return p0 + tk * (p1 - p0)


def limber_integral(ells, zs, ks, Pzks, gzs, Wz1s, Wz2s, hzs, chis):
    ells = np.asarray(ells)
    gzs = np.atleast_1d(np.asarray(gzs))
    hzs = np.broadcast_to(np.asarray(hzs), gzs.shape)
    Wz1s = np.broadcast_to(np.asarray(Wz1s), gzs.shape)
    Wz2s = np.broadcast_to(np.asarray(Wz2s), gzs.shape)
    chis = np.broadcast_to(np.asarray(chis), gzs.shape)
    prefactor = hzs * Wz1s * Wz2s / chis**2
    kevals = (ells[:, None] + 0.5) / chis[None, :]
    Pvals = interp_pzk_at_curve(np.atleast_1d(np.asarray(zs)), ks,
                                np.atleast_2d(Pzks), gzs, kevals)
    if gzs.size == 1:
        return Pvals[:, 0] * prefactor[0]
    return np.trapezoid(Pvals * prefactor[None, :], gzs, axis=-1)


def lensing_window(tw, ezs, zs, dndz=None):
    ezs = np.asarray(ezs)
    zs = np.atleast_1d(np.asarray(zs))
    H0 = tw.h_of_z(0.0)
    H = tw.h_of_z(ezs)
    chis = tw.comoving_radial_distance(ezs)
    chistar = tw.comoving_radial_distance(zs)
    if zs.size == 1:
        integral = (chistar - chis) / chistar
        integral = np.where(ezs > zs[0], 0.0, integral)
    else:
        dndzn = dndz / np.trapezoid(dndz, zs)
        integrand = ((chistar[None, :] - chis[:, None]) / chistar[None, :]
                     * dndzn[None, :])
        integrand[zs[None, :] < ezs[:, None]] = 0.0
        integral = np.trapezoid(integrand, zs, axis=-1)
    return 1.5 * tw.omm0 * H0**2 * (1.0 + ezs) * chis / H * integral


def C_kk(tw, ells, zs, ks, Pmm, lzs1, lzs2):
    zs = np.asarray(zs)
    w1 = lensing_window(tw, zs, lzs1)
    w2 = lensing_window(tw, zs, lzs2)
    chis = tw.comoving_radial_distance(zs)
    hzs = tw.h_of_z(zs)
    return limber_integral(ells, zs, ks, Pmm, zs, w1, w2, hzs, chis)


def C_kg(tw, ells, zs, ks, Pgm, gzs, gdndz, lzs):
    gzs = np.atleast_1d(np.asarray(gzs))
    W1 = lensing_window(tw, gzs, lzs)
    chis = tw.comoving_radial_distance(gzs)
    hzs = tw.h_of_z(gzs)
    W2 = gdndz / np.trapezoid(gdndz, gzs)
    return limber_integral(ells, zs, ks, Pgm, gzs, W1, W2, hzs, chis)
