"""Independent numpy oracle for the flat-sky quadratic-estimator N0.

Deliberately different discretization from models/lensing_noise.py: a
dense LINEAR l1 grid (every integer multipole in range) x uniform
midpoint angle grid, trapz/midpoint summed -- vs the jax module's
Gauss-Legendre log-l x angle quadrature.  Agreement bounds both schemes'
discretization error.  No jax imports allowed here.
"""

import numpy as np


def _interp_cl(cl, l):
    return np.interp(l, np.arange(cl.shape[0], dtype=float), cl)


def n0_flat_sky_dense(L, est, cl_grad, cl_total, cl_total2=None,
                      lmin=30, lmax=None, n_theta=2048):
    cl_grad = np.asarray(cl_grad, dtype=np.float64)
    cl_total = np.asarray(cl_total, dtype=np.float64)
    cl_total2 = cl_total if cl_total2 is None else np.asarray(
        cl_total2, dtype=np.float64)
    if lmax is None:
        lmax = cl_grad.shape[0] - 1
    l1 = np.arange(int(lmin), int(lmax) + 1, dtype=np.float64)[:, None]
    # midpoint rule over the full circle
    th = (np.arange(n_theta) + 0.5) * (2.0 * np.pi / n_theta)
    ct = np.cos(th)[None, :]
    st = np.sin(th)[None, :]
    l2 = np.sqrt(np.maximum(L**2 + l1**2 - 2.0 * L * l1 * ct, 1e-30))
    Ldotl1 = L * l1 * ct
    Ldotl2 = L**2 - Ldotl1
    c1g = _interp_cl(cl_grad, l1[:, 0])[:, None]
    c1t = _interp_cl(cl_total, l1[:, 0])[:, None]
    c2g = _interp_cl(cl_grad, l2)
    cosd = (L * ct - l1) / l2
    sind = L * st / l2
    cos2d = 2.0 * cosd**2 - 1.0
    sin2d = 2.0 * sind * cosd
    if est == "TT":
        f = c1g * Ldotl1 + c2g * Ldotl2
        denom2 = _interp_cl(cl_total, l2)
        D = 2.0
    elif est == "EE":
        f = (c1g * Ldotl1 + c2g * Ldotl2) * cos2d
        denom2 = _interp_cl(cl_total, l2)
        D = 2.0
    elif est == "EB":
        f = c1g * Ldotl1 * sin2d
        denom2 = _interp_cl(cl_total2, l2)
        D = 1.0
    else:
        raise ValueError(est)
    valid = (l2 >= lmin) & (l2 <= lmax)
    integrand = np.where(valid, f**2 / (D * c1t * denom2), 0.0)
    # d^2 l1 = l1 dl1 dtheta; dl1 = 1 on the integer grid (trapz weights)
    wl = np.ones_like(l1[:, 0])
    wl[0] = wl[-1] = 0.5
    integral = (wl @ (l1[:, 0, None] * integrand)).sum() \
        * (2.0 * np.pi / n_theta) / (2.0 * np.pi) ** 2
    return 1.0 / integral


def _ho_fF_dense(est, L, l1, ct, st, cls_grad, cls_total, lmin, lmax,
                 mode="grad"):
    """Hu-Okamoto response f(l1,l2) and optimal weight F(l1,l2),
    F(l2,l1) on a dense (n_l, n_theta) node grid, plus the l2 radii.
    Spectra are dicts ('TT'/'EE'/'BB'/'TE').  Written out per estimator
    straight from HO02 Table 1 / eq (14)-(16); independent of the jax
    module's shared-helper structure."""
    l2 = np.sqrt(np.maximum(L**2 + l1**2 - 2.0 * L * l1 * ct, 1e-30))
    if mode == "curl":
        Ld1 = L * l1 * st
        Ld2 = -Ld1
    else:
        Ld1 = L * l1 * ct
        Ld2 = L**2 - Ld1
    cosd = (L * ct - l1) / l2
    sind = L * st / l2
    c2d = 2.0 * cosd**2 - 1.0
    s2d = 2.0 * sind * cosd

    def at1(key):
        return _interp_cl(np.asarray(cls_total[key], float), l1[:, 0])[:, None]

    def at2(key):
        return _interp_cl(np.asarray(cls_total[key], float), l2)

    def g1(key):
        return _interp_cl(np.asarray(cls_grad[key], float), l1[:, 0])[:, None]

    def g2(key):
        return _interp_cl(np.asarray(cls_grad[key], float), l2)

    if est == "TT":
        f12 = g1("TT") * Ld1 + g2("TT") * Ld2
        F12 = f12 / (2.0 * at1("TT") * at2("TT"))
        F21 = F12
    elif est == "EE":
        f12 = (g1("EE") * Ld1 + g2("EE") * Ld2) * c2d
        F12 = f12 / (2.0 * at1("EE") * at2("EE"))
        F21 = F12
    elif est == "EB":
        f12 = g1("EE") * Ld1 * s2d
        f21 = -g2("EE") * Ld2 * s2d
        F12 = f12 / (at1("EE") * at2("BB"))
        F21 = f21 / (at2("EE") * at1("BB"))
    elif est == "TB":
        f12 = g1("TE") * Ld1 * s2d
        f21 = -g2("TE") * Ld2 * s2d
        F12 = f12 / (at1("TT") * at2("BB"))
        F21 = f21 / (at2("TT") * at1("BB"))
    elif est == "TE":
        f12 = g1("TE") * c2d * Ld1 + g2("TE") * Ld2
        f21 = g2("TE") * c2d * Ld2 + g1("TE") * Ld1
        tt1, tt2 = at1("TT"), at2("TT")
        ee1, ee2 = at1("EE"), at2("EE")
        te1, te2 = at1("TE"), at2("TE")
        den = tt1 * ee2 * tt2 * ee1 - (te1 * te2) ** 2
        F12 = (ee1 * tt2 * f12 - te1 * te2 * f21) / den
        F21 = (ee2 * tt1 * f21 - te1 * te2 * f12) / den
    else:
        raise ValueError(est)
    mask = (l2 >= lmin) & (l2 <= lmax)
    return f12, np.where(mask, F12, 0.0), np.where(mask, F21, 0.0), l2


def _dense_nodes(lmin, lmax, n_theta):
    l1 = np.arange(int(lmin), int(lmax) + 1, dtype=np.float64)[:, None]
    th = (np.arange(n_theta) + 0.5) * (2.0 * np.pi / n_theta)
    ct, st = np.cos(th)[None, :], np.sin(th)[None, :]
    wl = np.ones_like(l1[:, 0])
    wl[0] = wl[-1] = 0.5
    w = (wl * l1[:, 0])[:, None] * (2.0 * np.pi / n_theta)  # l1 dl1 dth
    return l1, ct, st, w


def n0_pair_dense(L, est, cls_grad, cls_total, lmin=30, lmax=None,
                  n_theta=512, mode="grad"):
    """Dense-grid N0 for any of TT/TE/EE/EB/TB (full-circle midpoint
    angles x integer-l trapz; optimal HO weights incl. the TE
    non-diagonal form).  mode='curl': the field-rotation estimator."""
    if lmax is None:
        lmax = min(np.asarray(c).shape[0] for c in cls_grad.values()) - 1
    l1, ct, st, w = _dense_nodes(lmin, lmax, n_theta)
    f12, F12, _, _ = _ho_fF_dense(est, L, l1, ct, st, cls_grad, cls_total,
                                  lmin, lmax, mode=mode)
    return 1.0 / ((w * f12 * F12).sum() / (2.0 * np.pi) ** 2)


def n0_cross_dense(L, est1, est2, cls_grad, cls_total, lmin=30, lmax=None,
                   n_theta=512):
    """Dense-grid HO02 eq (17) cross-covariance N^{(ab)(cd)}(L)."""
    if lmax is None:
        lmax = min(np.asarray(c).shape[0] for c in cls_grad.values()) - 1
    l1, ct, st, w = _dense_nodes(lmin, lmax, n_theta)
    _, Fab, _, l2 = _ho_fF_dense(est1, L, l1, ct, st, cls_grad, cls_total,
                                 lmin, lmax)
    _, Fcd12, Fcd21, _ = _ho_fF_dense(est2, L, l1, ct, st, cls_grad,
                                      cls_total, lmin, lmax)
    zero = np.zeros(np.asarray(cls_total["TT"], float).shape[0])

    def tot(x, y):
        key = "".join(sorted(x + y))
        if key in ("BE", "BT"):
            return zero
        key = {"ET": "TE"}.get(key, key)
        return np.asarray(cls_total[key], dtype=np.float64)

    a, b = est1[0], est1[1]
    c, d = est2[0], est2[1]
    t_ac1 = _interp_cl(tot(a, c), l1[:, 0])[:, None]
    t_bd2 = _interp_cl(tot(b, d), l2)
    t_ad1 = _interp_cl(tot(a, d), l1[:, 0])[:, None]
    t_bc2 = _interp_cl(tot(b, c), l2)
    integ = (w * Fab * (Fcd12 * t_ac1 * t_bd2
                        + Fcd21 * t_ad1 * t_bc2)).sum() / (2.0 * np.pi) ** 2
    na = n0_pair_dense(L, est1, cls_grad, cls_total, lmin=lmin, lmax=lmax,
                       n_theta=n_theta)
    nc = n0_pair_dense(L, est2, cls_grad, cls_total, lmin=lmin, lmax=lmax,
                       n_theta=n_theta)
    return na * nc * integ


def lensed_bb_dense(ells_out, cl_ee, clpp, n_theta=256):
    """First-order lensing BB at the requested multipoles, dense sum:

        C_BB(l) = (1/(2pi)^2) sum_{l'>=2} l' int dphi
                  [l.l' cos(phi) - l'^2]^2 C_pp(|l - l'|)
                  C_EE(l') sin^2(2 phi)

    (phi the angle between l and l'; midpoint rule on the half circle,
    doubled).  Independent of models/lensed_cls.py's node/spline scheme."""
    cl_ee = np.asarray(cl_ee, dtype=np.float64)
    clpp = np.asarray(clpp, dtype=np.float64)
    lp = np.arange(2.0, cl_ee.shape[0])[:, None]
    th = (np.arange(n_theta) + 0.5) * (np.pi / n_theta)
    ct, s2 = np.cos(th)[None, :], np.sin(2.0 * th)[None, :] ** 2
    wphi = 2.0 * np.pi / n_theta
    out = np.empty(len(ells_out))
    lmax_pp = clpp.shape[0] - 1
    for i, l in enumerate(np.asarray(ells_out, dtype=np.float64)):
        s = np.sqrt(np.maximum(l**2 + lp**2 - 2.0 * l * lp * ct, 0.0))
        cpp = np.where((s >= 2.0) & (s <= lmax_pp), _interp_cl(clpp, s), 0.0)
        kern = (l * lp * ct - lp**2) ** 2 * cpp * s2
        out[i] = (lp[:, 0] * cl_ee[2:] * (kern.sum(axis=1) * wphi)).sum() \
            / (2.0 * np.pi) ** 2
    return out


def n1_tt_dense(L, cl_grad, cl_total, clpp, n0_phi_L, lmin=30, lmax=None,
                n_theta=64, n_alpha=32):
    """Dense-grid N1 Term1 x 2 (the l3<->l4 relabel identity is analytic).

    Independent discretization from models/lensing_noise._n1_tt_one:
    piecewise-LINEAR trapz s grid (dense [2, 60] where C_pp ~ s^-4
    peaks, coarse above), linear integer-spaced l1 radii, midpoint
    angles over the FULL circle for both (no reflection symmetry used),
    plain numpy with a python loop over s rows.
    """
    cl_grad = np.asarray(cl_grad, dtype=np.float64)
    cl_total = np.asarray(cl_total, dtype=np.float64)
    clpp = np.asarray(clpp, dtype=np.float64)
    if lmax is None:
        lmax = cl_grad.shape[0] - 1
    lmax_pp = clpp.shape[0] - 1

    s_lo = np.arange(2.0, 60.0, 0.5)
    s_hi = np.linspace(60.0, float(lmax_pp), 160)
    s_grid = np.unique(np.concatenate([s_lo, s_hi]))
    ws = np.gradient(s_grid)

    r1 = np.arange(float(lmin), float(lmax) + 1.0, 20.0)
    wr1 = np.gradient(r1)
    th = (np.arange(n_theta) + 0.5) * (2.0 * np.pi / n_theta)
    alf = (np.arange(n_alpha) + 0.5) * (2.0 * np.pi / n_alpha)

    l1x = (r1[:, None] * np.cos(th)[None, :])[None, :, :]  # (1, nl, nth)
    l1y = (r1[:, None] * np.sin(th)[None, :])[None, :, :]
    w1 = (r1 * wr1)[None, :, None] * (2.0 * np.pi / n_theta)
    l2x, l2y = L - l1x, -l1y

    def f(ca, ax, ay, cb, bx, by):
        kx, ky = ax + bx, ay + by
        return ca * (kx * ax + ky * ay) + cb * (kx * bx + ky * by)

    m1 = np.hypot(l1x, l1y)
    m2 = np.hypot(l2x, l2y)
    c1, c2 = _interp_cl(cl_grad, m1), _interp_cl(cl_grad, m2)
    f12 = f(c1, l1x, l1y, c2, l2x, l2y)
    F12 = np.where((m2 >= lmin) & (m2 <= lmax),
                   f12 / (2.0 * _interp_cl(cl_total, m1)
                          * _interp_cl(cl_total, m2)), 0.0)

    total = 0.0
    for s, w_s in zip(s_grid, ws):
        sx = (s * np.cos(alf))[:, None, None]               # (nal, 1, 1)
        sy = (s * np.sin(alf))[:, None, None]
        l3x, l3y = sx - l1x, sy - l1y
        l4x, l4y = -L - l3x, -l3y
        m3 = np.maximum(np.hypot(l3x, l3y), 1e-30)
        m4 = np.maximum(np.hypot(l4x, l4y), 1e-30)
        c3, c4 = _interp_cl(cl_grad, m3), _interp_cl(cl_grad, m4)
        f34 = f(c3, l3x, l3y, c4, l4x, l4y)
        F34 = np.where((m3 >= lmin) & (m3 <= lmax) & (m4 >= lmin)
                       & (m4 <= lmax),
                       f34 / (2.0 * _interp_cl(cl_total, m3)
                              * _interp_cl(cl_total, m4)), 0.0)
        f13 = f(c1, l1x, l1y, c3, l3x, l3y)
        f24 = f(c2, l2x, l2y, c4, l4x, l4y)
        inner = (w1 * F12 * F34 * f13 * f24).sum()
        total += _interp_cl(clpp, np.array([s]))[0] * s * w_s \
            * (2.0 * np.pi / n_alpha) * inner
    return 2.0 * n0_phi_L**2 * total / (2.0 * np.pi) ** 4


def n0_eb_iterative_dense(Ls, cl_ee, cl_ee_total, clpp, nl_bb, lmin, lmax,
                          nodes, n_iter=3, n_theta=1024, n_theta_bb=256,
                          bb_nodes=None):
    """Mirror of models/lensing_noise.n0_eb_iterative built ONLY from the
    dense twin blocks: n0_flat_sky_dense for each N0 and lensed_bb_dense
    (at ~40 log nodes, splined in D_l-like form) for the residual BB."""
    from scipy.interpolate import CubicSpline
    clpp = np.asarray(clpp, dtype=np.float64)
    nl_bb = np.asarray(nl_bb, dtype=np.float64)
    lmax_pp = clpp.shape[0] - 1
    lpp = np.arange(lmax_pp + 1, dtype=np.float64)
    if bb_nodes is None:
        bb_nodes = np.unique(np.round(np.geomspace(2.0, lmax, 40)))
    ells = np.arange(lmax + 1, dtype=np.float64)
    nlb = np.zeros(lmax + 1)
    n = min(nl_bb.shape[0], lmax + 1)
    nlb[:n] = nl_bb[:n]

    def bb_all(cpp):
        bnodes = lensed_bb_dense(bb_nodes, cl_ee, cpp, n_theta=n_theta_bb)
        d = bnodes * bb_nodes * (bb_nodes + 1.0)
        out = np.zeros(lmax + 1)
        out[2:] = CubicSpline(np.log(bb_nodes), d)(np.log(ells[2:])) \
            / (ells[2:] * (ells[2:] + 1.0))
        return out

    def n0_eval(Lq, bb_tot):
        return np.array([n0_flat_sky_dense(L, "EB", cl_ee, cl_ee_total,
                                           cl_total2=bb_tot, lmin=lmin,
                                           lmax=lmax, n_theta=n_theta)
                         for L in Lq])

    bb_tot = bb_all(clpp) + nlb
    n0_nodes = n0_eval(nodes, bb_tot)
    for _ in range(n_iter):
        n0_int = np.exp(np.interp(np.log(np.maximum(lpp, 2.0)),
                                  np.log(nodes), np.log(n0_nodes)))
        rho2 = np.where(clpp > 0.0, clpp / (clpp + n0_int), 0.0)
        bb_tot = bb_all(clpp * (1.0 - rho2)) + nlb
        n0_nodes = n0_eval(nodes, bb_tot)
    return n0_eval(np.atleast_1d(Ls), bb_tot)
