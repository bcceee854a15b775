"""Explicit-loop numpy/scipy oracle for models/cluster_counts.py.

Independent formulation: per-(z, m) scalar loops, scipy.special.erfc, and
np.trapz — no shared code with the jax module beyond the physics definition
(lognormal completeness over a power-law Y-M relation).
"""

import numpy as np
from scipy.special import erfc


def twin_completeness(ms, ez, q, sigma_noise, lnYstar, alpha, beta, Mpivot,
                      sigma_lnY, sigma_meas_ln=0.0):
    ms = np.asarray(ms, dtype=float)
    ez = np.atleast_1d(np.asarray(ez, dtype=float))
    sigN = np.broadcast_to(np.asarray(sigma_noise, dtype=float), ez.shape)
    sig = np.hypot(sigma_lnY, sigma_meas_ln)
    out = np.empty((ez.size, ms.size))
    for i in range(ez.size):
        for j in range(ms.size):
            lnyb = (lnYstar + alpha * np.log(ms[j] / Mpivot)
                    + beta * np.log(ez[i]))
            x = (np.log(q * sigN[i]) - lnyb) / (np.sqrt(2.0) * sig)
            out[i, j] = 0.5 * erfc(x)
    return out


def twin_dndz_detected(zs, ms, nzm, chis, hzs, ez, q, sigma_noise, fsky,
                       lnYstar, alpha, beta, Mpivot, sigma_lnY,
                       sigma_meas_ln=0.0):
    comp = twin_completeness(ms, ez, q, sigma_noise, lnYstar, alpha, beta,
                             Mpivot, sigma_lnY, sigma_meas_ln)
    zs = np.asarray(zs, dtype=float)
    dndz = np.empty(zs.size)
    for i in range(zs.size):
        integ = np.asarray(nzm)[i] * comp[i]
        n_i = np.trapezoid(integ, np.asarray(ms, dtype=float))
        dvdz = 4.0 * np.pi * float(chis[i]) ** 2 / float(hzs[i])
        dndz[i] = fsky * dvdz * n_i
    return dndz, np.trapezoid(dndz, zs)


def twin_counts_q_bins(zs, ms, nzm, chis, hzs, ez, q_edges, sigma_noise,
                       fsky, lnYstar, alpha, beta, Mpivot, sigma_lnY):
    """(nz, nq) dN/dz per SNR bin by survival-function differences."""
    zs = np.asarray(zs, dtype=float)
    nq = len(q_edges) - 1
    out = np.empty((zs.size, nq))
    for b in range(nq):
        lo = twin_completeness(ms, ez, q_edges[b], sigma_noise, lnYstar,
                               alpha, beta, Mpivot, sigma_lnY)
        hi = (np.zeros_like(lo) if np.isinf(q_edges[b + 1]) else
              twin_completeness(ms, ez, q_edges[b + 1], sigma_noise, lnYstar,
                                alpha, beta, Mpivot, sigma_lnY))
        pbin = lo - hi
        for i in range(zs.size):
            n_i = np.trapezoid(np.asarray(nzm)[i] * pbin[i],
                           np.asarray(ms, dtype=float))
            out[i, b] = (fsky * 4.0 * np.pi * float(chis[i]) ** 2
                         / float(hzs[i]) * n_i)
    return out
