"""One-loop standard perturbation theory P(k) (EXTENSION).

P_1loop(k) = P_lin(k) + P22(k) + P13(k) with the EdS kernels:

    P22(k) = (k^3 / 2 pi^2) int r^2 dr int_-1^1 dx
                 F2(r, x)^2 P(k r) P(k y),   y^2 = 1 + r^2 - 2 r x,
    F2     = 5/7 + (x - r)/(2 y) (r/y + y/r) + (2/7) (x - r)^2 / y^2,

    P13(k) = (k^3 / (252 * 4 pi^2)) P(k) int dr P(k r) f13(r),
    f13    = 12/r^2 - 158 + 100 r^2 - 42 r^4
             + (3/r^3) (r^2-1)^3 (7 r^2 + 2) ln|(1+r)/(1-r)|,

(Makino-Sasaki-Suto / Jain-Bertschinger forms).  Nonlinear tier
complementary to halofit/HMcode (models/halofit.py, hmcode.py): the
perturbative prediction survey analyses use at k <~ 0.3 h/Mpc.  The
reference has no perturbation theory at all; technique context is the
FFT-accelerated PT literature retrieved for this build (Schmittfull et
al 1603.04405) -- here the loop integrals are evaluated as dense
Gauss-Legendre tensor contractions (one (nk, nr, nx) einsum), which is
the MXU-friendly formulation at these grid sizes and keeps every node
weight static under jit.

Numerics:
- f13 has catastrophic-cancellation zones; sympy-derived Taylor
  switches at r < 1e-2 (-168 + 928 r^2/5 - 4512 r^4/35), |r-1| < 1e-4
  (-88 + 8 (r-1) - 116 (r-1)^2) and r > 10 (the large-r series to
  1/r^10; the direct form loses |42 r^4 eps| absolute there).
- P is interpolated linearly in (ln k, ln P) with power-law (linear
  ln-ln) extrapolation beyond the table at both ends -- the loop
  integrals reach q below/above any finite table.
- The x-integrand develops an integrable spike at (r -> 1, x -> 1)
  (soft internal momentum); the ln-y inner substitution places it at a
  resolved endpoint (validated against the independent dense-Simpson
  twin, tests/test_spt.py; jax self-convergence ~3e-6 at defaults).
- Redshift scaling is the standard EdS-kernel one: loops computed from
  P_lin(k, z) directly, or equivalently once at z=0 and scaled by
  D^4(z) (exact within the same EdS approximation as F2/F3).

Both integrals share the IR region q -> 0 where P22 and P13 carry
canceling divergences (Galilean invariance); they are evaluated on the
SAME q support [qmin, qmax] so the cancellation is explicit
(property-tested: the sum is stable under qmin variation while the
pieces move).

Oracle: hmvec_tpu/twin/spt.py (explicit numpy Simpson) + adaptive
scipy dblquad spot checks.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.weights import leggauss_cached


def _lnpk_eval(lnk_tab, lnp_tab, kq):
    """ln P at momenta kq: linear interp in (ln k, ln P), linear (i.e.
    power-law) extrapolation beyond both table ends."""
    lnq = jnp.log(kq)
    lo_slope = (lnp_tab[1] - lnp_tab[0]) / (lnk_tab[1] - lnk_tab[0])
    hi_slope = (lnp_tab[-1] - lnp_tab[-2]) / (lnk_tab[-1] - lnk_tab[-2])
    inner = jnp.interp(lnq, lnk_tab, lnp_tab)
    lo = lnp_tab[0] + lo_slope * (lnq - lnk_tab[0])
    hi = lnp_tab[-1] + hi_slope * (lnq - lnk_tab[-1])
    out = jnp.where(lnq < lnk_tab[0], lo, inner)
    return jnp.where(lnq > lnk_tab[-1], hi, out)


def _pk_eval(lnk_tab, lnp_tab, kq):
    return jnp.exp(_lnpk_eval(lnk_tab, lnp_tab, kq))


def f13(r):
    """The P13 density angular kernel (normalization 1/252) with
    cancellation-safe Taylor switches (guarded direct evaluation: r is
    pushed away from the switch zones so the discarded branch stays
    finite for autodiff -- see _f13_family)."""
    return _f13_family(
        r, 12.0, -158.0, 100.0, -42.0, 7.0, 2.0,
        small=(-168.0, 928.0 / 5.0, -4512.0 / 35.0),
        near1=(-88.0, 8.0, -116.0),
        big=(-488.0 / 5.0, 96.0 / 5.0, -160.0 / 21.0, -1376.0 / 1155.0,
             -1952.0 / 5005.0, -2528.0 / 15015.0))


def _f13_family(r, A, B, C, D, c1, c2, small, near1, big):
    """Shared switched evaluation of the P13 angular-kernel family

        A/r^2 + B + C r^2 + D r^4 + (3/r^3)(r^2-1)^3 (c1 r^2 + c2) L,
        L = ln((1+r)/|1-r|),

    with sympy-derived Taylor windows at r < 1e-2, |r-1| < 1e-4 and the
    large-r series beyond r = 10 (each coefficient set verified against
    exact sympy evaluation in tests/test_spt.py).  ``small``/``near1``/
    ``big`` are coefficient tuples of the respective series."""
    r = jnp.asarray(r)
    r_safe = jnp.clip(r, 2e-3, 12.0)
    r_safe = jnp.where(jnp.abs(r_safe - 1.0) < 5e-5, 1.0 + 5e-5, r_safe)
    rs2 = r_safe**2
    direct = (A / rs2 + B + C * rs2 + D * rs2**2
              + 3.0 / (rs2 * r_safe) * (rs2 - 1.0) ** 3
              * (c1 * rs2 + c2)
              * jnp.log((1.0 + r_safe) / jnp.abs(1.0 - r_safe)))
    s0, s2, s4 = small
    small_v = s0 + s2 * r**2 + s4 * r**4
    n0, n1, n2 = near1
    e = r - 1.0
    near1_v = n0 + n1 * e + n2 * e**2
    u2 = 1.0 / jnp.maximum(r, 1.0) ** 2
    b0, b2, b4, b6, b8, b10 = big
    big_v = b0 + u2 * (b2 + u2 * (b4 + u2 * (b6 + u2 * (b8 + u2 * b10))))
    out = jnp.where(r < 1e-2, small_v, direct)
    out = jnp.where(jnp.abs(e) < 1e-4, near1_v, out)
    return jnp.where(r > 10.0, big_v, out)


def f13_dt(r):
    """P13 density-velocity angular kernel (normalization 1/252,
    matter theta = -div v / (a H f) convention)."""
    return _f13_family(
        r, 24.0, -202.0, 56.0, -30.0, 5.0, 4.0,
        small=(-168.0, 416.0 / 5.0, -2976.0 / 35.0),
        near1=(-152.0, -56.0, -52.0),
        big=(-200.0, 2208.0 / 35.0, -1312.0 / 105.0, -1888.0 / 1155.0,
             -32.0 / 65.0, -608.0 / 3003.0))


def f13_tt(r):
    """P13 velocity-velocity angular kernel (normalization 1/84)."""
    return _f13_family(
        r, 12.0, -82.0, 4.0, -6.0, 1.0, 2.0,
        small=(-56.0, -32.0 / 5.0, -96.0 / 7.0),
        near1=(-72.0, -40.0, 4.0),
        big=(-504.0 / 5.0, 1248.0 / 35.0, -608.0 / 105.0, -160.0 / 231.0,
             -992.0 / 5005.0, -1184.0 / 15015.0))


def _default_qrange(ks_tab):
    return float(np.exp(ks_tab[0])), float(np.exp(ks_tab[-1]))


def _p13_core(ks, ks_tab, pk_tab, kern_fn, denom, n_q, qmin, qmax):
    ks = jnp.asarray(ks)
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_tab))
    if qmin is None or qmax is None:
        d0, d1 = _default_qrange(np.log(np.asarray(ks_tab)))
        qmin = d0 if qmin is None else qmin
        qmax = d1 if qmax is None else qmax
    t_np, w_np = leggauss_cached(n_q)
    lo, hi = np.log(qmin), np.log(qmax)
    lnq = jnp.asarray(0.5 * (hi - lo) * (t_np + 1.0) + lo)
    wq = jnp.asarray(0.5 * (hi - lo) * w_np)
    q = jnp.exp(lnq)                           # (nq,)
    Pq = _pk_eval(lnk_tab, lnp_tab, q)
    r = q[None, :] / ks[:, None]               # (nk, nq)
    # int dr kern P(kr) = int dlnq (q/k) kern(q/k) P(q)
    integ = jnp.einsum("q,kq->k", wq * Pq * q, kern_fn(r)) / ks
    Pk = _pk_eval(lnk_tab, lnp_tab, ks)
    return ks**3 / (denom * 4.0 * jnp.pi**2) * Pk * integ


def p13(ks, ks_tab, pk_tab, n_q=1024, qmin=None, qmax=None):
    """P13(k) on the q support [qmin, qmax] (defaults: the table range).

    ks (nk,); ks_tab/pk_tab: the linear power table (log-spaced ks).
    Gauss-Legendre in ln q (smooth integrand; the f13 switches handle
    the r = q/k cancellation zones)."""
    return _p13_core(ks, ks_tab, pk_tab, f13, 252.0, n_q, qmin, qmax)


def p13_dt(ks, ks_tab, pk_tab, n_q=1024, qmin=None, qmax=None):
    """Density-velocity P13 (theta = -div v / (a H f) convention)."""
    return _p13_core(ks, ks_tab, pk_tab, f13_dt, 252.0, n_q, qmin, qmax)


def p13_tt(ks, ks_tab, pk_tab, n_q=1024, qmin=None, qmax=None):
    """Velocity-velocity P13 (note the 1/84 normalization)."""
    return _p13_core(ks, ks_tab, pk_tab, f13_tt, 84.0, n_q, qmin, qmax)


def _p22_panel(ks, lnk_tab, lnp_tab, lnlo, lnhi, tq, wq0, tx, wx, yfl):
    """One outer ln-q Gauss-Legendre panel of the P22 double integral,
    bounds (nk,)-shaped.  Inner integral in y = |k-q|/k per (k, q):
    int_-1^1 dx = int (y^2/r) dln y from y_min = max(|1-r|, qmin/k)
    (the collinear spike sits AT this endpoint and varies on scale
    y ~ y_min, so ln-y nodes resolve it; the qmin floor applies the
    SAME soft-momentum cutoff to the |k-q| leg as the outer q grid
    applies to the q leg -- required for the P22/P13 IR cancellation
    to be exact under qmin variation) up to y_max = 1+r."""
    lnq = lnlo[:, None] + (lnhi - lnlo)[:, None] * tq[None, :]  # (nk,nq)
    wq = (lnhi - lnlo)[:, None] * wq0[None, :]
    q = jnp.exp(lnq)
    Pq = _pk_eval(lnk_tab, lnp_tab, q)
    r = (q / jnp.asarray(ks)[:, None])[..., None]               # (nk,nq,1)
    ymin = jnp.maximum(jnp.abs(1.0 - r), yfl[:, None, None])
    lny = jnp.log(ymin) + (jnp.log(1.0 + r) - jnp.log(ymin)) * tx
    wy = jnp.log((1.0 + r) / ymin) * wx
    y = jnp.exp(lny)
    y2 = y**2
    mu_num = (1.0 - r**2 - y2) / (2.0 * r)     # (x - r) at this y
    F2 = (5.0 / 7.0 + mu_num / (2.0 * y) * (r / y + y / r)
          + 2.0 / 7.0 * mu_num**2 / y2)
    Pky = _pk_eval(lnk_tab, lnp_tab, jnp.asarray(ks)[:, None, None] * y)
    inner = jnp.sum(wy * (y2 / r) * F2**2 * Pky, axis=-1)       # (nk,nq)
    return jnp.sum(wq * Pq * r[..., 0] ** 3 * inner, axis=-1)


def p22(ks, ks_tab, pk_tab, n_q=512, n_x=256, qmin=None, qmax=None):
    """P22(k): dense (nk, nq, nx) Gauss-Legendre contraction, with the
    outer ln-q integral split at q = k (the inner integral has a
    |1 - q/k|^(ns+1)-type cusp there; panel endpoints give the GL
    nodes the clustering to absorb it)."""
    ks = jnp.asarray(ks)
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_tab))
    if qmin is None or qmax is None:
        d0, d1 = _default_qrange(np.log(np.asarray(ks_tab)))
        qmin = d0 if qmin is None else qmin
        qmax = d1 if qmax is None else qmax
    t_np, w_np = leggauss_cached(n_q // 2)
    tq = jnp.asarray(0.5 * (t_np + 1.0))
    wq0 = jnp.asarray(0.5 * w_np)
    x_np, wx_np = leggauss_cached(n_x)
    tx = jnp.asarray(0.5 * (x_np + 1.0))
    wx = jnp.asarray(0.5 * wx_np)

    lo = jnp.full(ks.shape, np.log(qmin))
    hi = jnp.full(ks.shape, np.log(qmax))
    mid = jnp.clip(jnp.log(ks), lo, hi)
    yfl = qmin / ks        # soft cutoff on the |k-q| leg, matching q's
    outer = (_p22_panel(ks, lnk_tab, lnp_tab, lo, mid, tq, wq0, tx, wx,
                        yfl)
             + _p22_panel(ks, lnk_tab, lnp_tab, mid, hi, tq, wq0, tx, wx,
                          yfl))
    return ks**3 / (2.0 * jnp.pi**2) * outer


def _velocity_kernels_panel(ks, lnk_tab, lnp_tab, lnlo, lnhi, tq, wq0,
                            tx, wx, yfl):
    """One outer ln-q panel of the three P22-type mode-coupling
    integrals with kernels {F2^2, F2 G2, G2^2} (G2 = the velocity-
    divergence kernel, 3/7 + mu/2 (r/y + y/r) + 4/7 mu^2).  Same
    geometry/substitution as _p22_panel; returns (3, nk)."""
    lnq = lnlo[:, None] + (lnhi - lnlo)[:, None] * tq[None, :]
    wq = (lnhi - lnlo)[:, None] * wq0[None, :]
    q = jnp.exp(lnq)
    Pq = _pk_eval(lnk_tab, lnp_tab, q)
    r = (q / jnp.asarray(ks)[:, None])[..., None]
    ymin = jnp.maximum(jnp.abs(1.0 - r), yfl[:, None, None])
    lny = jnp.log(ymin) + (jnp.log(1.0 + r) - jnp.log(ymin)) * tx
    wy = jnp.log((1.0 + r) / ymin) * wx
    y = jnp.exp(lny)
    y2 = y**2
    mu_num = (1.0 - r**2 - y2) / (2.0 * r)
    cross = mu_num / (2.0 * y) * (r / y + y / r)
    mu2 = mu_num**2 / y2
    F2 = 5.0 / 7.0 + cross + 2.0 / 7.0 * mu2
    G2 = 3.0 / 7.0 + cross + 4.0 / 7.0 * mu2
    Pky = _pk_eval(lnk_tab, lnp_tab, jnp.asarray(ks)[:, None, None] * y)
    base = wy * (y2 / r) * Pky
    kerns = jnp.stack([F2 * F2, F2 * G2, G2 * G2])
    inner = jnp.sum(kerns * base[None], axis=-1)           # (3, nk, nq)
    return jnp.sum((wq * Pq * r[..., 0] ** 3)[None] * inner, axis=-1)


def p22_velocity(ks, ks_tab, pk_tab, n_q=512, n_x=256, qmin=None,
                 qmax=None):
    """The three P22 mode-coupling spectra {dd, dt, tt} as a dict of
    (nk,) arrays, evaluated in ONE fused (nk, nq, nx) contraction
    (kernels differ only in constants, so all three share the P
    evaluations).  Same quadrature design/split as p22."""
    ks = jnp.asarray(ks)
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_tab))
    if qmin is None or qmax is None:
        d0, d1 = _default_qrange(np.log(np.asarray(ks_tab)))
        qmin = d0 if qmin is None else qmin
        qmax = d1 if qmax is None else qmax
    t_np, w_np = leggauss_cached(n_q // 2)
    tq = jnp.asarray(0.5 * (t_np + 1.0))
    wq0 = jnp.asarray(0.5 * w_np)
    x_np, wx_np = leggauss_cached(n_x)
    tx = jnp.asarray(0.5 * (x_np + 1.0))
    wx = jnp.asarray(0.5 * wx_np)
    lo = jnp.full(ks.shape, np.log(qmin))
    hi = jnp.full(ks.shape, np.log(qmax))
    mid = jnp.clip(jnp.log(ks), lo, hi)
    yfl = qmin / ks
    outer = (_velocity_kernels_panel(ks, lnk_tab, lnp_tab, lo, mid, tq,
                                     wq0, tx, wx, yfl)
             + _velocity_kernels_panel(ks, lnk_tab, lnp_tab, mid, hi, tq,
                                       wq0, tx, wx, yfl))
    outer = ks[None, :] ** 3 / (2.0 * jnp.pi**2) * outer
    return {"dd": outer[0], "dt": outer[1], "tt": outer[2]}


def pk_velocity_1loop(ks, ks_tab, pk_tab, n_q=512, n_x=256, n_q13=1024,
                      qmin=None, qmax=None):
    """One-loop density/velocity-divergence spectra (EdS kernels,
    theta = -div v / (a H f) so all three equal P_lin at tree level):

        P_ab = P_lin + P22_ab + P13_ab,   ab in {dd, dt, tt}.

    Returns {"dd", "dt", "tt"}: the ingredients of the Scoccimarro-2004
    redshift-space model (models/rsd.scoccimarro_pk_mu).  The velocity
    spectra fall below P_dd at quasi-linear k (nonlinear velocities
    decohere): P_tt < P_dt < P_dd for k >~ 0.1/Mpc."""
    ks = jnp.asarray(ks)
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_tab))
    Plin = _pk_eval(lnk_tab, lnp_tab, ks)
    P22s = p22_velocity(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x, qmin=qmin,
                        qmax=qmax)
    kw = dict(n_q=n_q13, qmin=qmin, qmax=qmax)
    return {"dd": Plin + P22s["dd"] + p13(ks, ks_tab, pk_tab, **kw),
            "dt": Plin + P22s["dt"] + p13_dt(ks, ks_tab, pk_tab, **kw),
            "tt": Plin + P22s["tt"] + p13_tt(ks, ks_tab, pk_tab, **kw)}


def _bias_kernels_panel(ks, lnk_tab, lnp_tab, lnlo, lnhi, tq, wq0, tx,
                        wx, yfl):
    """One outer ln-q panel of the five quadratic-bias 2-D integrals
    I[kern](k) = (1/4 pi^2) int q^2 dq int dx kern P(q) P(|k-q|) with
    kern in {F2, F2*S2, 1, S2, S2^2}, S2 = mu12^2 - 1/3.  Same geometry
    and y-substitution as _p22_panel; returns (5, nk)."""
    lnq = lnlo[:, None] + (lnhi - lnlo)[:, None] * tq[None, :]
    wq = (lnhi - lnlo)[:, None] * wq0[None, :]
    q = jnp.exp(lnq)
    Pq = _pk_eval(lnk_tab, lnp_tab, q)
    r = (q / jnp.asarray(ks)[:, None])[..., None]
    ymin = jnp.maximum(jnp.abs(1.0 - r), yfl[:, None, None])
    lny = jnp.log(ymin) + (jnp.log(1.0 + r) - jnp.log(ymin)) * tx
    wy = jnp.log((1.0 + r) / ymin) * wx
    y = jnp.exp(lny)
    y2 = y**2
    mu_num = (1.0 - r**2 - y2) / (2.0 * r)
    mu12 = mu_num / y
    F2 = (5.0 / 7.0 + mu_num / (2.0 * y) * (r / y + y / r)
          + 2.0 / 7.0 * mu_num**2 / y2)
    S2 = mu12**2 - 1.0 / 3.0
    Pky = _pk_eval(lnk_tab, lnp_tab, jnp.asarray(ks)[:, None, None] * y)
    base = wy * (y2 / r) * Pky
    kerns = jnp.stack([F2, F2 * S2, jnp.ones_like(F2), S2, S2**2])
    inner = jnp.sum(kerns * base[None], axis=-1)           # (5, nk, nq)
    return jnp.sum((wq * Pq * r[..., 0] ** 3)[None] * inner, axis=-1)


def pt_bias_integrals(ks, ks_tab, pk_tab, n_q=512, n_x=256,
                      qmin=None, qmax=None):
    """The five quadratic-bias one-loop integrals (McDonald-Roy basis,
    conventions of Beutler et al 2014 eqs 40-44):

      Pb2_d   = int_q F2(q, k-q) P(q) P(|k-q|)
      Pbs2_d  = int_q F2 S2 P P
      Pb22    = (1/2) int_q P(q) [P(|k-q|) - P(q)]
      Pb2s2   = (1/2) int_q P(q) [S2 P(|k-q|) - (2/3) P(q)]
      Pbs22   = (1/2) int_q P(q) [S2^2 P(|k-q|) - (4/9) P(q)]

    (int_q = d^3q/(2 pi)^3; S2(q, -q) = 2/3 makes the b22/b2s2/bs22
    subtractions exact k -> 0 renormalizations -- property-tested).
    Returns a dict of (nk,) arrays.  Same quadrature design as p22.
    """
    ks = jnp.asarray(ks)
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_tab))
    if qmin is None or qmax is None:
        d0, d1 = _default_qrange(np.log(np.asarray(ks_tab)))
        qmin = d0 if qmin is None else qmin
        qmax = d1 if qmax is None else qmax
    t_np, w_np = leggauss_cached(n_q // 2)
    tq = jnp.asarray(0.5 * (t_np + 1.0))
    wq0 = jnp.asarray(0.5 * w_np)
    x_np, wx_np = leggauss_cached(n_x)
    tx = jnp.asarray(0.5 * (x_np + 1.0))
    wx = jnp.asarray(0.5 * wx_np)
    lo = jnp.full(ks.shape, np.log(qmin))
    hi = jnp.full(ks.shape, np.log(qmax))
    mid = jnp.clip(jnp.log(ks), lo, hi)
    yfl = qmin / ks
    I = (_bias_kernels_panel(ks, lnk_tab, lnp_tab, lo, mid, tq, wq0,
                             tx, wx, yfl)
         + _bias_kernels_panel(ks, lnk_tab, lnp_tab, mid, hi, tq, wq0,
                               tx, wx, yfl))
    I = I * ks[None, :] ** 3 / (4.0 * jnp.pi**2)
    # the separable renormalization constant int_q P(q)^2
    #   = (1/2 pi^2) int q^2 P^2 dq  (ln-q Gauss-Legendre)
    t2, w2 = leggauss_cached(n_q)
    lnq = jnp.asarray(0.5 * (np.log(qmax) - np.log(qmin)) * (t2 + 1.0)
                      + np.log(qmin))
    wq = jnp.asarray(0.5 * (np.log(qmax) - np.log(qmin)) * w2)
    qq = jnp.exp(lnq)
    Pq = _pk_eval(lnk_tab, lnp_tab, qq)
    const = jnp.sum(wq * qq**3 * Pq**2) / (2.0 * jnp.pi**2)
    return {
        "Pb2_d": I[0],
        "Pbs2_d": I[1],
        "Pb22": 0.5 * (I[2] - const),
        "Pb2s2": 0.5 * (I[3] - 2.0 / 3.0 * const),
        "Pbs22": 0.5 * (I[4] - 4.0 / 9.0 * const),
    }


def pgg_1loop(ks, ks_tab, pk_tab, b1, b2, bs2=None, shot=0.0,
              n_q=512, n_x=256, n_q13=1024, qmin=None, qmax=None):
    """One-loop galaxy auto power in the quadratic (b1, b2, bs2)
    Eulerian bias basis (Beutler et al 2014 eq 40; third-order b3nl
    sigma3^2 term not included -- at this order it is commonly fixed by
    coevolution and can be added externally as
    2 b1 b3nl sigma3sq(k) P_lin):

      P_gg = b1^2 P_mm^1loop + 2 b1 b2 Pb2_d + 2 b1 bs2 Pbs2_d
             + b2^2 Pb22 + 2 b2 bs2 Pb2s2 + bs2^2 Pbs22 + shot.

    bs2 defaults to the coevolution value -(4/7)(b1 - 1).
    """
    if bs2 is None:
        bs2 = -4.0 / 7.0 * (b1 - 1.0)
    Pmm = p1loop(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x, n_q13=n_q13,
                 qmin=qmin, qmax=qmax)
    t = pt_bias_integrals(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x,
                          qmin=qmin, qmax=qmax)
    return (b1**2 * Pmm + 2.0 * b1 * b2 * t["Pb2_d"]
            + 2.0 * b1 * bs2 * t["Pbs2_d"] + b2**2 * t["Pb22"]
            + 2.0 * b2 * bs2 * t["Pb2s2"] + bs2**2 * t["Pbs22"]
            + shot)


def pgm_1loop(ks, ks_tab, pk_tab, b1, b2, bs2=None,
              n_q=512, n_x=256, n_q13=1024, qmin=None, qmax=None):
    """One-loop galaxy-matter cross power (Beutler et al 2014 eq 41,
    same basis/caveat as pgg_1loop):

      P_gm = b1 P_mm^1loop + b2 Pb2_d + bs2 Pbs2_d.
    """
    if bs2 is None:
        bs2 = -4.0 / 7.0 * (b1 - 1.0)
    Pmm = p1loop(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x, n_q13=n_q13,
                 qmin=qmin, qmax=qmax)
    t = pt_bias_integrals(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x,
                          qmin=qmin, qmax=qmax)
    return b1 * Pmm + b2 * t["Pb2_d"] + bs2 * t["Pbs2_d"]


def split_wiggle(ks_tab, pk_tab, pk_nw_template, sigma_lnk=0.25):
    """(P_nw, P_w = P - P_nw): template-ratio Gaussian smoothing in
    ln k -- the HMcode-2020 dewiggle construction (models/hmcode.py:71,
    normalization-invariant, cancels the curvature bias of smoothing
    ln P directly) applied on the caller's table grid.
    pk_nw_template: any smooth same-broadband template (e.g. the EH98
    zero-baryon P_lin_approx(type='eisenhu'))."""
    lnk = np.log(np.asarray(ks_tab))
    d = lnk[None, :] - lnk[:, None]
    S = np.exp(-0.5 * (d / sigma_lnk) ** 2)
    S /= S.sum(axis=1, keepdims=True)
    lnr = jnp.log(jnp.asarray(pk_tab) / jnp.asarray(pk_nw_template))
    p_nw = jnp.asarray(pk_nw_template) * jnp.exp(jnp.asarray(S) @ lnr)
    return p_nw, jnp.asarray(pk_tab) - p_nw


def bao_damping_sigma2(ks_tab, pk_nw, ell_bao, ks_sep=0.2, n_q=512):
    """IR displacement dispersion damping the BAO wiggles
    (Blas-Garny-Ivanov-Sibiryakov 2016, eq. 3.5):

        Sigma^2 = (1/6 pi^2) int_0^{kS} dq P_nw(q)
                  [1 - j0(q l_bao) + 2 j2(q l_bao)]   [Mpc^2].
    """
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_nw))
    t_np, w_np = leggauss_cached(n_q)
    lo, hi = np.log(float(np.asarray(ks_tab)[0])), np.log(ks_sep)
    lnq = jnp.asarray(0.5 * (hi - lo) * (t_np + 1.0) + lo)
    wq = jnp.asarray(0.5 * (hi - lo) * w_np)
    q = jnp.exp(lnq)
    x = q * ell_bao
    small = x < 1e-2
    xs = jnp.where(small, 1.0, x)
    j0 = jnp.where(small, 1.0 - x**2 / 6.0 + x**4 / 120.0,
                   jnp.sin(xs) / xs)
    j2 = jnp.where(small, x**2 / 15.0 - x**4 / 210.0,
                   (3.0 / xs**3 - 1.0 / xs) * jnp.sin(xs)
                   - 3.0 * jnp.cos(xs) / xs**2)
    kern = 1.0 - j0 + 2.0 * j2
    Pq = _pk_eval(lnk_tab, lnp_tab, q)
    return jnp.sum(wq * q * Pq * kern) / (6.0 * jnp.pi**2)


def p1loop_ir(ks, ks_tab, pk_tab, pk_nw_template, ell_bao,
              ks_sep=0.2, sigma_lnk=0.25, n_q=512, n_x=256, n_q13=1024,
              qmin=None, qmax=None, return_parts=False):
    """IR-resummed one-loop power (NLO leading-wiggle resummation,
    Blas et al 2016 eq. 4.7):

        P_IR = P_nw + e^{-k^2 Sigma^2} (1 + k^2 Sigma^2) P_w
               + [P22 + P13](P_nw + e^{-k^2 Sigma^2} P_w),

    which damps the BAO wiggles by the large-scale displacement
    dispersion instead of SPT's spurious undamped oscillations.  With a
    wiggle-free input (P == template broadband) this reduces EXACTLY to
    p1loop.  ell_bao: the BAO scale in Mpc (the EH98 drag sound horizon
    transfer._eh_scales sh_d/h is the natural engine-free choice)."""
    ks = jnp.asarray(ks)
    p_nw, p_w = split_wiggle(ks_tab, pk_tab, pk_nw_template, sigma_lnk)
    Sigma2 = bao_damping_sigma2(ks_tab, p_nw, ell_bao, ks_sep)
    damp_tab = jnp.exp(-jnp.asarray(ks_tab) ** 2 * Sigma2)
    p_in = p_nw + damp_tab * p_w
    loops = (p22(ks, ks_tab, p_in, n_q=n_q, n_x=n_x, qmin=qmin,
                 qmax=qmax)
             + p13(ks, ks_tab, p_in, n_q=n_q13, qmin=qmin, qmax=qmax))
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    Pnw_k = _pk_eval(lnk_tab, jnp.log(p_nw), ks)
    # wiggle part can be negative: interpolate the ratio linearly
    w_ratio = jnp.interp(jnp.log(ks), lnk_tab, p_w / p_nw)
    k2S2 = ks**2 * Sigma2
    P_ir = Pnw_k * (1.0 + jnp.exp(-k2S2) * (1.0 + k2S2) * w_ratio) + loops
    if return_parts:
        return P_ir, {"p_nw": Pnw_k, "sigma2": Sigma2, "loops": loops,
                      "w_ratio": w_ratio}
    return P_ir


def p1loop(ks, ks_tab, pk_tab, n_q=512, n_x=256, n_q13=1024,
           qmin=None, qmax=None, return_parts=False):
    """One-loop SPT matter power: P_lin + P22 + P13 at the table's
    redshift (pass P_lin(k, z); the EdS loop scaling D^4 is implicit in
    using the z-scaled table)."""
    ks = jnp.asarray(ks)
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_tab))
    Plin = _pk_eval(lnk_tab, lnp_tab, ks)
    P22 = p22(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x, qmin=qmin, qmax=qmax)
    P13 = p13(ks, ks_tab, pk_tab, n_q=n_q13, qmin=qmin, qmax=qmax)
    total = Plin + P22 + P13
    if return_parts:
        return total, {"lin": Plin, "p22": P22, "p13": P13}
    return total
