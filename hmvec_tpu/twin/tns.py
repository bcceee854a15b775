"""Explicit numpy oracle for the TNS A/B redshift-space correction
terms (models/tns.py).

Fully independent of the sympy-generated reduced kernels
(models/_tns_kernels.py): works with EXPLICIT 3-D vectors, keeps BOTH
bispectrum orderings in their original form (no q -> -q remapping), and
does the azimuthal integral NUMERICALLY (uniform nodes -- exact for the
trigonometric-polynomial integrand).  Shares only the defining
integrals and the tree-level F2/G2 kernels (the physics input)."""

import numpy as np
from scipy.integrate import simpson

from .spt import pk_interp


def _dot(a, b):
    return np.sum(a * b, axis=-1)


def _norm2(a):
    return np.sum(a * a, axis=-1)


def _f2_vec(ka, kb):
    d = _dot(ka, kb)
    a2 = _norm2(ka)
    b2 = _norm2(kb)
    return 5.0 / 7.0 + d / 2.0 * (1.0 / a2 + 1.0 / b2) \
        + 2.0 / 7.0 * d**2 / (a2 * b2)


def _g2_vec(ka, kb):
    d = _dot(ka, kb)
    a2 = _norm2(ka)
    b2 = _norm2(kb)
    return 3.0 / 7.0 + d / 2.0 * (1.0 / a2 + 1.0 / b2) \
        + 4.0 / 7.0 * d**2 / (a2 * b2)


def _bsigma_tree(P, f, nhat, k1, k2, k3):
    """Tree-level B_sigma(k1,k2,k3) from <theta(k1) a(k2) a(k3)>,
    a = delta + f mu^2 theta, explicit-vector assembly."""
    m2sq = _dot(k2, nhat) ** 2 / _norm2(k2)
    m3sq = _dot(k3, nhat) ** 2 / _norm2(k3)
    P1 = P(np.sqrt(_norm2(k1)))
    P2 = P(np.sqrt(_norm2(k2)))
    P3 = P(np.sqrt(_norm2(k3)))
    t1 = 2.0 * _g2_vec(k2, k3) * (1 + f * m2sq) * (1 + f * m3sq) * P2 * P3
    t2 = 2.0 * (_f2_vec(k1, k3) + f * m2sq * _g2_vec(k1, k3)) \
        * (1 + f * m3sq) * P1 * P3
    t3 = 2.0 * (_f2_vec(k1, k2) + f * m3sq * _g2_vec(k1, k2)) \
        * (1 + f * m2sq) * P1 * P2
    return t1 + t2 + t3


def _qvec_grid(k, r, y, n_phi, sign):
    """q vectors (ny, nphi, 3) at fixed r = q/k, with x = cos(k,q)
    chosen so the singular leg has magnitude k*y: sign=+1 sets
    |k-q| = k*y, sign=-1 sets |k+q| = k*y."""
    x = sign * (1.0 + r**2 - y**2) / (2.0 * r)
    x = np.clip(x, -1.0, 1.0)
    sx = np.sqrt(np.maximum(0.0, 1.0 - x**2))
    phi = 2.0 * np.pi * np.arange(n_phi) / n_phi
    q = np.empty(y.shape + (n_phi, 3))
    q[..., 0] = (k * r * sx)[:, None] * np.cos(phi)[None, :]
    q[..., 1] = (k * r * sx)[:, None] * np.sin(phi)[None, :]
    q[..., 2] = (k * r * x)[:, None] * np.ones(n_phi)[None, :]
    return q


def tns_a_direct(k, mu, f, ks_tab, pk_tab, qmin, qmax,
                 n_q=513, n_y=513, n_phi=16):
    """A(k,mu) by direct (ln q, ln y, phi) quadrature of

        A = k mu f int d^3q/(2pi)^3 (q.n/q^2)
              [B_sigma(q, k-q, -k) - B_sigma(q, k, -k-q)],

    each ordering integrated in ITS OWN singular-leg variable
    (y = |k-q|/k for the first, y = |k+q|/k for the second) with the
    same ln-y node placement and qmin floor on that leg as the jax
    side's region; phi by the (spectrally exact) uniform rule."""
    P = pk_interp(ks_tab, pk_tab)
    kvec = np.array([0.0, 0.0, k])
    nhat = np.array([np.sqrt(1.0 - mu**2), 0.0, mu])
    yfloor = qmin / k

    def ordering(sign):
        # sign=+1: singular leg |k-q|; sign=-1: singular leg |k+q|
        def panel(lnlo, lnhi):
            lnq = np.linspace(lnlo, lnhi, n_q)
            qmag = np.exp(lnq)
            rows = np.zeros(n_q)
            for i in range(n_q):
                r = qmag[i] / k
                ymin = max(abs(1.0 - r), yfloor)
                lny = np.linspace(np.log(ymin), np.log(1.0 + r), n_y)
                y = np.exp(lny)
                q = _qvec_grid(k, r, y, n_phi, sign)   # (ny, nphi, 3)
                muq_over_q = _dot(q, nhat) / _norm2(q)
                if sign > 0:
                    B = _bsigma_tree(P, f, nhat, q, kvec - q, -kvec)
                else:
                    B = _bsigma_tree(P, f, nhat, q, kvec, -kvec - q)
                phi_avg = np.mean(muq_over_q * B, axis=-1)
                rows[i] = simpson(phi_avg * y**2 / r, x=lny)
            return simpson(rows * (qmag / k) ** 3, x=lnq)

        lnmid = min(max(np.log(k), np.log(qmin)), np.log(qmax))
        return panel(np.log(qmin), lnmid) + panel(lnmid, np.log(qmax))

    # d^3q/(2pi)^3 = (2pi <.>_phi/(2pi)^3) k^3 r^3 dlnq (y^2/r) dlny;
    # (q.n/q^2) was evaluated dimensionfully inside the panels.
    return k * mu * f * (k**3 / (4.0 * np.pi**2)) \
        * (ordering(+1) - ordering(-1))


def tns_b_direct(k, mu, f, ks_tab, pk_tab, qmin, qmax,
                 pdt_tab=None, ptt_tab=None,
                 n_q=513, n_y=513, n_phi=16):
    """B(k,mu) by direct (ln q, ln y, phi) quadrature of

        B = (k mu f)^2 int d^3q/(2pi)^3 F(q) F(k-q),
        F(p) = (p.n/p^2) [P_dt(p) + f (p.n)^2/p^2 P_tt(p)]."""
    Pdt = pk_interp(ks_tab, pdt_tab if pdt_tab is not None else pk_tab)
    Ptt = pk_interp(ks_tab, ptt_tab if ptt_tab is not None else pk_tab)
    kvec = np.array([0.0, 0.0, k])
    nhat = np.array([np.sqrt(1.0 - mu**2), 0.0, mu])
    yfloor = qmin / k

    def Ffield(p):
        pz = _dot(p, nhat)
        p2 = _norm2(p)
        return (pz / p2) * (Pdt(np.sqrt(p2)) + f * (pz**2 / p2)
                            * Ptt(np.sqrt(p2)))

    def panel(lnlo, lnhi):
        lnq = np.linspace(lnlo, lnhi, n_q)
        qmag = np.exp(lnq)
        rows = np.zeros(n_q)
        for i in range(n_q):
            r = qmag[i] / k
            ymin = max(abs(1.0 - r), yfloor)
            lny = np.linspace(np.log(ymin), np.log(1.0 + r), n_y)
            y = np.exp(lny)
            q = _qvec_grid(k, r, y, n_phi, +1)
            phi_avg = np.mean(Ffield(q) * Ffield(kvec - q), axis=-1)
            rows[i] = simpson(phi_avg * y**2 / r, x=lny)
        return simpson(rows * (qmag / k) ** 3, x=lnq)

    lnmid = min(max(np.log(k), np.log(qmin)), np.log(qmax))
    integ = panel(np.log(qmin), lnmid) + panel(lnmid, np.log(qmax))
    # d^3q/(2pi)^3 = (2pi <.>_phi/(2pi)^3) k^3 r^3 dlnq (y^2/r) dlny,
    # and F was evaluated dimensionfully, so no further k powers.
    return (k * mu * f) ** 2 * k**3 / (4.0 * np.pi**2) * integ
