"""Numpy twin of the CIB halo model (explicit loops, independent of the
jnp implementation's einsum/broadcast structure).  Oracle for
tests/test_cib.py; same Shang et al 2012 functional forms as
models/cib.py -- any constant or algebra slip on either side breaks the
1e-10-level parity pins.
"""

from __future__ import annotations

import numpy as np

_HK_GHZ = 6.62607015e-34 / 1.380649e-23 * 1e9


def sed_transition_x(beta, gamma):
    from scipy.optimize import brentq
    target = 3.0 + beta + gamma
    return brentq(lambda x: x / (1.0 - np.exp(-x)) - target,
                  1e-3, 100.0, xtol=1e-14)


def sed_graybody(nu_ghz, z, p):
    td = p["cib_T0"] * (1.0 + z) ** p["cib_alpha"]
    xstar = sed_transition_x(p["cib_beta"], p["cib_gamma"])
    nu = nu_ghz * (1.0 + z)
    x = _HK_GHZ * nu / td
    if x < xstar:
        return nu ** (p["cib_beta"] + 3.0) / np.expm1(x)
    nu0 = xstar * td / _HK_GHZ
    grey0 = nu0 ** (p["cib_beta"] + 3.0) / np.expm1(xstar)
    return grey0 * (nu / nu0) ** (-p["cib_gamma"])


def lum(m, z, nu_ghz, p):
    var = p["cib_var"]
    sig = (m / np.sqrt(2.0 * np.pi * var)
           * np.exp(-((np.log10(m) - p["cib_log10meff"]) ** 2)
                    / (2.0 * var)))
    return (p["cib_L0"] * (1.0 + z) ** p["cib_delta"]
            * sed_graybody(nu_ghz, z, p) * sig)


def lum_sat(m_host, z, nu_ghz, p):
    msub = np.geomspace(p["cib_msub_min"], p["_msmax"], int(p["cib_nsub"]))
    mrat = msub / m_host
    nsub = 0.3 * mrat**-0.7 * np.exp(-9.9 * mrat**2.5)
    ls = np.array([lum(ms_, z, nu_ghz, p) for ms_ in msub])
    return np.trapezoid(nsub * ls, np.log(msub))


def tracer_grids(ms, zs, nu_ghz, us, p):
    p = dict(p)
    p["_msmax"] = float(np.max(ms))
    nz, nm = len(zs), len(ms)
    fc = np.zeros((nz, nm))
    fs = np.zeros((nz, nm))
    for i, z in enumerate(zs):
        for j, m in enumerate(ms):
            fc[i, j] = lum(m, z, nu_ghz, p) / (4.0 * np.pi)
            fs[i, j] = lum_sat(m, z, nu_ghz, p) / (4.0 * np.pi)
    return fc, fs, np.asarray(us)


def p1h(fc1, fs1, u1, fc2, fs2, u2, nzm, ms, ks, kstar=0.01):
    nz, nm, nk = u1.shape
    out = np.zeros((nz, nk))
    for i in range(nz):
        for k in range(nk):
            sq = (fc1[i] * fs2[i] * u2[i, :, k]
                  + fc2[i] * fs1[i] * u1[i, :, k]
                  + fs1[i] * fs2[i] * u1[i, :, k] * u2[i, :, k])
            out[i, k] = np.trapezoid(nzm[i] * sq, ms)
    return out * (1.0 - np.exp(-(np.asarray(ks) / kstar) ** 2))[None, :]


def p2h(fc1, fs1, u1, fc2, fs2, u2, nzm, bh, ms, pzk):
    nz, nm, nk = u1.shape
    out = np.zeros((nz, nk))
    for i in range(nz):
        for k in range(nk):
            i1 = np.trapezoid(nzm[i] * bh[i] * (fc1[i] + fs1[i] * u1[i, :, k]), ms)
            i2 = np.trapezoid(nzm[i] * bh[i] * (fc2[i] + fs2[i] * u2[i, :, k]), ms)
            out[i, k] = pzk[i, k] * i1 * i2
    return out
