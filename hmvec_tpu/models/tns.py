"""TNS redshift-space power spectrum (EXTENSION).

The Taruya-Nishimichi-Saito (2010, arXiv:1006.0699) model adds the
A(k,mu) and B(k,mu) correction terms -- the velocity-density coupling
the Scoccimarro form drops -- to the nonlinear Kaiser bracket:

    P_s(k,mu) = D_FoG(k mu sigma_v)
                [ b^2 P_dd + 2 b f mu^2 P_dt + f^2 mu^4 P_tt
                  + b^3 A(k,mu; beta) + b^4 B(k,mu; beta) ],
    beta = f/b,

(sigma_v the LOS damping scale in Mpc, the repo-wide rsd.py
convention -- the physical linear-theory choice is f * sigma_v_lin,
the tns_power default),

the standard model of BOSS/DESI full-shape RSD analyses.  The reference
(simonsobs/hmvec) has no redshift-space modeling at all; this sits on
top of the one-loop velocity spectra in models/spt.pk_velocity_1loop.

Nothing here is transcribed from the paper's appendix: the reduced 2-D
kernels in models/_tns_kernels.py are DERIVED from the defining
integrals (tree-level B_sigma with F2/G2 kernels, analytic azimuthal
average) by tools/gen_tns_kernels.py with sympy, and the assembled
terms are validated against an independent explicit-3-D-vector
numerical twin that keeps both bispectrum orderings and integrates phi
numerically (hmvec_tpu/twin/tns.py, tests/test_tns.py).  The linear-
bias scaling b^3 A(beta), b^4 B(beta) is exact for delta_g = b delta
(each a-field contributes b(1 + beta mu^2 theta/delta-structure); it is
checked in tests against the b = 1 evaluation).

TPU shape: the (m, n)-indexed mu/f polynomial structure means ALL the
mu and f dependence is analytic -- the 27 kernel coefficients are
contracted once per k against Gauss-Legendre (ln q, ln y) node grids as
a single stacked (nterm, nk, nq, ny) -> (nterm, nk) tensor reduction
(MXU-shaped, same geometry/substitution as models/spt.p22), and
evaluating P_s at any (mu, f, b, sigma_v) afterwards is O(nk) --
Fisher/MCMC loops over growth and bias parameters re-use the integrals
for free.  Everything is jit- and grad-safe (fixed node counts, no
data-dependent control flow).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.weights import leggauss_cached
from ._tns_kernels import a_kernels, b_kernels
from .spt import _pk_eval, _default_qrange
from .rsd import _fog, _legendre


def _ab_panel(ks, lnk_tab, lnp_tab, lnpdt_tab, lnptt_tab, lnlo, lnhi,
              tq, wq0, tx, wx, yfl):
    """One outer ln-q panel of ALL 27 TNS kernel integrals.

    Same (r, y) geometry as spt._p22_panel: inner integral in
    y = |k-q|/k on ln-spaced nodes from max(|1-r|, qmin/k) to 1+r
    (the qmin floor excludes |k-q| < qmin -- and, through the q -> -q
    mapping of the second bispectrum ordering, |k+q| < qmin -- exactly
    as the twin does).  Returns ({A key: (nk,)}, {B key: (nk,)})."""
    ks = jnp.asarray(ks)
    lnq = lnlo[:, None] + (lnhi - lnlo)[:, None] * tq[None, :]  # (nk,nq)
    wq = (lnhi - lnlo)[:, None] * wq0[None, :]
    q = jnp.exp(lnq)
    r = (q / ks[:, None])[..., None]                            # (nk,nq,1)
    ymin = jnp.maximum(jnp.abs(1.0 - r), yfl[:, None, None])
    lny = jnp.log(ymin) + (jnp.log(1.0 + r) - jnp.log(ymin)) * tx
    wy = jnp.log((1.0 + r) / ymin) * wx                         # (nk,nq,ny)
    y = jnp.exp(lny)

    ka = a_kernels(r, y)
    kb = b_kernels(r, y)

    # P evaluations shared across all terms
    P_r = _pk_eval(lnk_tab, lnp_tab, q)                         # (nk,nq)
    P_y = _pk_eval(lnk_tab, lnp_tab, ks[:, None, None] * y)     # (nk,nq,ny)
    P_k = _pk_eval(lnk_tab, lnp_tab, ks)                        # (nk,)
    Pdt_r = _pk_eval(lnk_tab, lnpdt_tab, q)
    Pdt_y = _pk_eval(lnk_tab, lnpdt_tab, ks[:, None, None] * y)
    Ptt_r = _pk_eval(lnk_tab, lnptt_tab, q)
    Ptt_y = _pk_eval(lnk_tab, lnptt_tab, ks[:, None, None] * y)

    a_base = {"ry": P_r[..., None] * P_y,
              "rk": (P_r * P_k[:, None])[..., None],
              "yk": P_y * P_k[:, None, None]}
    b_base = {"dd": Pdt_r[..., None] * Pdt_y,
              "dt": Pdt_r[..., None] * Ptt_y,
              "td": Ptt_r[..., None] * Pdt_y,
              "tt": Ptt_r[..., None] * Ptt_y}

    def contract(kerns, bases):
        out = {}
        for (m, n, j), C in kerns.items():
            inner = jnp.sum(wy * C * bases[j], axis=-1)         # (nk,nq)
            val = jnp.sum(wq * inner, axis=-1)                  # (nk,)
            key = (m, n)
            out[key] = out.get(key, 0.0) + val
        return out

    return contract(ka, a_base), contract(kb, b_base)


def tns_ab_integrals(ks, ks_tab, pk_tab, pdt_tab=None, ptt_tab=None,
                     n_q=256, n_x=128, qmin=None, qmax=None,
                     r_max=1000.0):
    """The mu/f-independent TNS integrals:

        A(k,mu,f) = (mu f)   sum_{m,n} mu^m f^n I^A_mn(k),
        B(k,mu,f) = (mu f)^2 sum_{m,n} mu^m f^n I^B_mn(k),

    returned as {"A": {(m,n): (nk,)}, "B": {(m,n): (nk,)}} with the
    k^3/4pi^2 normalization folded in.  pk_tab: the LINEAR power (the
    A/B terms are one-loop order, so tree-level spectra inside);
    pdt_tab/ptt_tab optionally replace the B-term's P_dt/P_tt legs
    (default: pk_tab).  Outer ln-q integral split at q = k, same
    quadrature design as spt.p22.

    r_max caps the q support at q <= r_max * k (per k).  The A-term
    reduced kernels cancel catastrophically in f64 at r = q/k >~ 3e3
    (pointwise values grow like r^4 while the exact y-integral stays
    O(1): the two bispectrum orderings cancel only after integration),
    while the PHYSICAL UV tail of A is converged to <~1e-3 by r ~ 1e3
    (measured: A(k=0.02) = -586.3 / -583.2 / -583.5 at r_max =
    300/1000/2000, garbage beyond 3000).  The cap only binds when the
    table's qmax exceeds r_max*k, i.e. for the lowest ks."""
    ks = jnp.asarray(ks)
    lnk_tab = jnp.log(jnp.asarray(ks_tab))
    lnp_tab = jnp.log(jnp.asarray(pk_tab))
    lnpdt = lnp_tab if pdt_tab is None else jnp.log(jnp.asarray(pdt_tab))
    lnptt = lnp_tab if ptt_tab is None else jnp.log(jnp.asarray(ptt_tab))
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
    hi = jnp.minimum(jnp.full(ks.shape, np.log(qmax)),
                     jnp.log(ks) + np.log(r_max))
    mid = jnp.clip(jnp.log(ks), lo, hi)
    yfl = qmin / ks
    a1, b1 = _ab_panel(ks, lnk_tab, lnp_tab, lnpdt, lnptt, lo, mid,
                       tq, wq0, tx, wx, yfl)
    a2, b2 = _ab_panel(ks, lnk_tab, lnp_tab, lnpdt, lnptt, mid, hi,
                       tq, wq0, tx, wx, yfl)
    norm = ks**3 / (4.0 * jnp.pi**2)
    A = {k_: norm * (a1[k_] + a2[k_]) for k_ in a1}
    B = {k_: norm * (b1[k_] + b2[k_]) for k_ in b1}
    return {"A": A, "B": B}


def tns_a_term(ks, mu, f, ab, b=1.0):
    """b^3 A(k, mu; beta = f/b) from tns_ab_integrals output (exact
    linear-bias scaling).  mu may be scalar or (nmu,); returns
    broadcast (..., nk)."""
    mu = jnp.asarray(mu)[..., None]
    beta = f / b
    out = 0.0
    for (m, n), I in ab["A"].items():
        out = out + mu**m * beta**n * I
    return b**3 * (mu * beta) * out


def tns_b_term(ks, mu, f, ab, b=1.0):
    """b^4 B(k, mu; beta = f/b) from tns_ab_integrals output."""
    mu = jnp.asarray(mu)[..., None]
    beta = f / b
    out = 0.0
    for (m, n), I in ab["B"].items():
        out = out + mu**m * beta**n * I
    return b**4 * (mu * beta) ** 2 * out


def tns_pk_mu(ks, mus, p_dd, p_dt, p_tt, b, f, ab, sigma_v=0.0,
              fog="gaussian"):
    """The full TNS redshift-space P_s(k, mu): nonlinear Kaiser bracket
    (one-loop P_dd/P_dt/P_tt from spt.pk_velocity_1loop) + A + B terms
    (ab = tns_ab_integrals(...)), times the FoG factor.  Returns
    (nmu, nk)."""
    ks = jnp.asarray(ks)
    mus = jnp.asarray(mus)
    mu = mus[:, None]
    core = (b**2 * jnp.asarray(p_dd)[None, :]
            + 2.0 * b * f * mu**2 * jnp.asarray(p_dt)[None, :]
            + f**2 * mu**4 * jnp.asarray(p_tt)[None, :]
            + tns_a_term(ks, mus, f, ab, b=b)
            + tns_b_term(ks, mus, f, ab, b=b))
    return _fog(ks[None, :] * mu, sigma_v, fog) * core


def tns_multipoles(ks, p_dd, p_dt, p_tt, b, f, ab, sigma_v=0.0,
                   ells=(0, 2, 4), fog="gaussian", n_mu=32):
    """Legendre multipoles of tns_pk_mu (Gauss-Legendre in mu).
    Returns {ell: (nk,)}."""
    x_np, w_np = leggauss_cached(n_mu)
    mus = jnp.asarray(x_np)
    w = jnp.asarray(w_np)
    ps = tns_pk_mu(ks, mus, p_dd, p_dt, p_tt, b, f, ab, sigma_v, fog)
    out = {}
    for ell in ells:
        wl = w * _legendre(ell, mus) * (2.0 * ell + 1.0) / 2.0
        out[ell] = jnp.einsum("m,mk->k", wl, ps)
    return out


def tns_power(ks, ks_tab, pk_tab, b=1.0, f=0.5, sigma_v=None,
              fog="gaussian", one_loop=True, n_q=256, n_x=128,
              qmin=None, qmax=None, ells=(0, 2, 4), n_mu=32):
    """Convenience end-to-end TNS multipoles from a linear power table:
    one-loop P_dd/P_dt/P_tt (or tree-level if one_loop=False), A/B from
    the same table, sigma_v defaulting to the linear-theory damping
    scale f * rsd.sigma_v_lin.  Returns (multipole dict, diagnostics
    dict)."""
    from .spt import pk_velocity_1loop
    from .rsd import sigma_v_lin
    ks = jnp.asarray(ks)
    if one_loop:
        pv = pk_velocity_1loop(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x,
                               qmin=qmin, qmax=qmax)
    else:
        lnk = jnp.log(jnp.asarray(ks_tab))
        lnp = jnp.log(jnp.asarray(pk_tab))
        Pl = _pk_eval(lnk, lnp, ks)
        pv = {"dd": Pl, "dt": Pl, "tt": Pl}
    ab = tns_ab_integrals(ks, ks_tab, pk_tab, n_q=n_q, n_x=n_x,
                          qmin=qmin, qmax=qmax)
    if sigma_v is None:
        sigma_v = f * sigma_v_lin(ks_tab, pk_tab)
    mp = tns_multipoles(ks, pv["dd"], pv["dt"], pv["tt"], b, f, ab,
                        sigma_v=sigma_v, fog=fog, ells=ells, n_mu=n_mu)
    return mp, {"pk_velocity": pv, "ab": ab, "sigma_v": sigma_v}
