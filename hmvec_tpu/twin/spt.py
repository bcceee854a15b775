"""Explicit numpy oracle for the one-loop SPT integrals (models/spt.py).

Independent quadrature (dense Simpson; adaptive scipy for spot checks)
and independent kernel assembly; shares only the published EdS kernel
formulae."""

import numpy as np
from scipy.integrate import simpson


def pk_interp(ks_tab, pk_tab):
    lnk = np.log(ks_tab)
    lnp = np.log(pk_tab)
    slo = (lnp[1] - lnp[0]) / (lnk[1] - lnk[0])
    shi = (lnp[-1] - lnp[-2]) / (lnk[-1] - lnk[-2])

    def P(q):
        q = np.asarray(q, dtype=float)
        lq = np.log(q)
        out = np.interp(lq, lnk, lnp)
        out = np.where(lq < lnk[0], lnp[0] + slo * (lq - lnk[0]), out)
        out = np.where(lq > lnk[-1], lnp[-1] + shi * (lq - lnk[-1]), out)
        return np.exp(out)

    return P


def f13_direct(r):
    r = np.asarray(r, dtype=float)
    return (12.0 / r**2 - 158.0 + 100.0 * r**2 - 42.0 * r**4
            + 3.0 / r**3 * (r**2 - 1.0) ** 3 * (7.0 * r**2 + 2.0)
            * np.log((1.0 + r) / np.abs(1.0 - r)))


def p13_twin(k, ks_tab, pk_tab, qmin, qmax, n=8193):
    """Simpson in ln q, explicit; r = 1 node nudged off the singularity."""
    P = pk_interp(ks_tab, pk_tab)
    lnq = np.linspace(np.log(qmin), np.log(qmax), n)
    q = np.exp(lnq)
    r = q / k
    r = np.where(np.abs(r - 1.0) < 1e-9, 1.0 + 1e-9, r)
    integ = simpson(f13_direct(r) * P(q) * q / k, x=lnq)
    return k**3 / (252.0 * 4.0 * np.pi**2) * P(np.array([k]))[0] * integ


def f2_squared_of_y(r, y):
    """F2(q, k-q)^2 expressed in r = q/k and y = |k-q|/k."""
    y2 = y**2
    mu_num = (1.0 - r**2 - y2) / (2.0 * r)
    F2 = (5.0 / 7.0 + mu_num / (2.0 * y) * (r / y + y / r)
          + 2.0 / 7.0 * mu_num**2 / y2)
    return F2**2


def p22_twin(k, ks_tab, pk_tab, qmin, qmax, n_q=2049, n_y=2049):
    """2-D Simpson in (ln q, ln y), explicit loop over q rows (same
    y-substitution and symmetric qmin cutoff on the |k-q| leg as the
    jax side, but an independent quadrature rule and node placement)."""
    P = pk_interp(ks_tab, pk_tab)
    yfloor = qmin / k

    def panel(lnlo, lnhi):
        lnq = np.linspace(lnlo, lnhi, n_q)
        q = np.exp(lnq)
        rows = np.zeros(n_q)
        for i in range(n_q):
            r = q[i] / k
            ymin = max(abs(1.0 - r), yfloor)
            lny = np.linspace(np.log(ymin), np.log(1.0 + r), n_y)
            y = np.exp(lny)
            rows[i] = simpson(f2_squared_of_y(r, y) * P(k * y)
                              * y**2 / r, x=lny)
        return simpson(rows * P(q) * (q / k) ** 3, x=lnq)

    # outer integral split at q = k (inner has a cusp there)
    lnmid = min(max(np.log(k), np.log(qmin)), np.log(qmax))
    integ = panel(np.log(qmin), lnmid) + panel(lnmid, np.log(qmax))
    return k**3 / (2.0 * np.pi**2) * integ


def bias_integral_twin(k, ks_tab, pk_tab, qmin, qmax, kern,
                       n_q=2049, n_y=2049):
    """I[kern](k) = (1/4 pi^2) int q^2 dq int dx kern P(q) P(|k-q|),
    kern(r, y, mu12) one of the quadratic-bias kernels; same variables
    and split as p22_twin, independent Simpson quadrature."""
    P = pk_interp(ks_tab, pk_tab)
    yfloor = qmin / k

    def panel(lnlo, lnhi):
        lnq = np.linspace(lnlo, lnhi, n_q)
        q = np.exp(lnq)
        rows = np.zeros(n_q)
        for i in range(n_q):
            r = q[i] / k
            ymin = max(abs(1.0 - r), yfloor)
            lny = np.linspace(np.log(ymin), np.log(1.0 + r), n_y)
            y = np.exp(lny)
            mu12 = (1.0 - r**2 - y**2) / (2.0 * r) / y
            rows[i] = simpson(kern(r, y, mu12) * P(k * y) * y**2 / r,
                              x=lny)
        return simpson(rows * P(q) * (q / k) ** 3, x=lnq)

    lnmid = min(max(np.log(k), np.log(qmin)), np.log(qmax))
    integ = panel(np.log(qmin), lnmid) + panel(lnmid, np.log(qmax))
    return k**3 / (4.0 * np.pi**2) * integ


def kern_f2(r, y, mu12):
    return (5.0 / 7.0 + mu12 / 2.0 * (r / y + y / r)
            + 2.0 / 7.0 * mu12**2)


def kern_s2(r, y, mu12):
    return mu12**2 - 1.0 / 3.0


def kern_g2(r, y, mu12):
    return (3.0 / 7.0 + mu12 / 2.0 * (r / y + y / r)
            + 4.0 / 7.0 * mu12**2)


def p22_kern_twin(k, ks_tab, pk_tab, qmin, qmax, kern,
                  n_q=2049, n_y=2049):
    """P22-type mode coupling with an arbitrary symmetric kernel
    product kern(r, y, mu12): P22 = 2 * I[kern] in bias_integral_twin's
    normalization (F2^2 recovers p22_twin)."""
    return 2.0 * bias_integral_twin(k, ks_tab, pk_tab, qmin, qmax, kern,
                                    n_q=n_q, n_y=n_y)


def f13_dt_direct(r):
    r = np.asarray(r, dtype=float)
    return (24.0 / r**2 - 202.0 + 56.0 * r**2 - 30.0 * r**4
            + 3.0 / r**3 * (r**2 - 1.0) ** 3 * (5.0 * r**2 + 4.0)
            * np.log((1.0 + r) / np.abs(1.0 - r)))


def f13_tt_direct(r):
    r = np.asarray(r, dtype=float)
    return (12.0 / r**2 - 82.0 + 4.0 * r**2 - 6.0 * r**4
            + 3.0 / r**3 * (r**2 - 1.0) ** 3 * (r**2 + 2.0)
            * np.log((1.0 + r) / np.abs(1.0 - r)))


def p13_kern_twin(k, ks_tab, pk_tab, qmin, qmax, kern_direct, denom,
                  n=8193):
    """Simpson in ln q with an arbitrary direct P13 angular kernel and
    normalization k^3 P(k) / (denom * 4 pi^2); the r = 1 node is nudged
    off the log singularity (dd: kern=f13_direct, denom=252; dt:
    f13_dt_direct, 252; tt: f13_tt_direct, 84)."""
    P = pk_interp(ks_tab, pk_tab)
    lnq = np.linspace(np.log(qmin), np.log(qmax), n)
    q = np.exp(lnq)
    r = q / k
    r = np.where(np.abs(r - 1.0) < 1e-9, 1.0 + 1e-9, r)
    integ = simpson(kern_direct(r) * P(q) * q / k, x=lnq)
    return k**3 / (denom * 4.0 * np.pi**2) * P(np.array([k]))[0] * integ
