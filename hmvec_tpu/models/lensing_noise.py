"""CMB instrument noise and quadratic-estimator lensing noise N0.

EXTENSION beyond the reference: hmvec's kSZ forecasting consumes a total
CMB TT spectrum `Cls` supplied by the caller (reference ksz.py:290-336 --
in practice produced by external codes), and its CMB-lensing cross
forecasts have no reconstruction-noise model at all.  This module makes
those forecasts self-contained:

* `white_noise_nl`: the Knox instrument noise
  N_l = (DT)^2 exp(+l(l+1) theta_fwhm^2 / (8 ln 2)) in muK^2 (beam
  deconvolved), the standard map-noise model every forecast uses;
* `total_cl_tt`: theory (table or the built-in boltzlite solver via
  `Cosmology.get_cmb_cls`) + noise -> the integer-l `Cls` array the kSZ
  layer wants (models/ksz.py:100-149);
* `n0_flat_sky`: flat-sky Hu-Okamoto (2002) quadratic-estimator lensing
  reconstruction noise for the TT, EE and EB estimators,

      N0^{phiphi}(L) = [ int d^2 l1 / (2 pi)^2
                         f_a(l1, l2)^2 / (D_a C^tot_{l1} C^tot_{l2}) ]^{-1},

  l2 = L - l1, with the standard response kernels (L = l1 + l2 throughout,
  angles measured from L):

      f_TT = C^TT_{l1} (L.l1) + C^TT_{l2} (L.l2),              D = 2
      f_EE = [C^EE_{l1} (L.l1) + C^EE_{l2} (L.l2)] cos 2(p1-p2), D = 2
      f_EB = C^EE_{l1} (L.l1) sin 2(p1-p2),                     D = 1
             (denominator C^EE,tot_{l1} C^BB,tot_{l2})

  evaluated as one fused Gauss-Legendre double quadrature (log-l x angle)
  vmapped over L -- no per-L python loops, everything MXU/VPU-shaped.
  `n0_minimum_variance` combines estimators by inverse variance (the
  usual approximation that drops inter-estimator covariances);
* the FULL Hu-Okamoto family: `n0_pair_flat_sky` extends the above to
  all five estimators (adds TE with its non-diagonal optimal weight
  mixing C^TT/C^EE/C^TE totals, and TB), `n0_cross_flat_sky` evaluates
  the inter-estimator covariance N^{(ab)(cd)} (HO02 eq. 17; the
  even {TT,TE,EE} and odd {EB,TB} sectors decouple exactly), and
  `n0_mv_flat_sky` performs the exact minimum-variance combination
  [1^T N^{-1} 1]^{-1} with the full per-L covariance matrix -- the MV
  noise real analyses quote.  Self-consistency N_(ab)(ab) = N_ab (an
  identity only the OPTIMAL weights satisfy) is pinned in tests along
  with an independent dense twin for TE/TB and the crosses;
* `n0_tt_fullsky`: the EXACT full-sky TT N0 from the spherical-harmonic
  response (closed-form 3j^2 via gammaln, `threej000_sq`) -- an
  independent formalism that cross-validates the flat-sky module at
  L >> 1 (measured convergence 5% at L=40 -> 0.6% at L=600 with no
  shared constants) and stays exact at the lowest L;
* `n0_eb_iterative`: CMB-S4-style iterative internal delensing (the
  Smith-2012 rho^2 / residual-BB fixed point), with `lensed_bb_from_ee`
  exactly linear in C_pp.

TPU-first notes: the theory spectra enter as dense integer-l arrays and
are sampled at the off-grid |L - l1| by `jnp.interp` (exact at nodes,
linear between -- sub-0.1% against the independent dense-trapz twin);
the whole (n_L, n_l, n_theta) integrand is one broadcast expression.

Conventions: phi is the lensing potential; kappa = l(l+1) phi / 2, so
`n0_kappa = (L (L+1) / 2)^2 n0_phi` (matching the package's C_kk).
Validated against an independent numpy dense-grid twin and convergence /
physical-scaling properties in tests/test_lensing_noise.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..utils.weights import leggauss_cached

__all__ = ["white_noise_nl", "total_cl_tt", "n0_flat_sky",
           "n0_pair_flat_sky", "n0_cross_flat_sky", "n0_mv_flat_sky",
           "n0_minimum_variance", "n0_kappa_from_phi",
           "lensed_bb_from_ee", "n0_eb_iterative",
           "threej000_sq", "n0_tt_fullsky", "n1_tt_flat_sky"]

_ARCMIN = np.pi / (180.0 * 60.0)


def white_noise_nl(ells, noise_uk_arcmin, beam_fwhm_arcmin=0.0):
    """Beam-deconvolved white noise spectrum in muK^2.

    noise_uk_arcmin: map depth DT in muK-arcmin (use sqrt(2) x the
    temperature depth for Q/U polarization noise).
    """
    ells = jnp.asarray(ells, dtype=jnp.result_type(float))
    dt = jnp.asarray(noise_uk_arcmin) * _ARCMIN
    theta = jnp.asarray(beam_fwhm_arcmin) * _ARCMIN
    bl2 = jnp.exp(ells * (ells + 1.0) * theta**2 / (8.0 * np.log(2.0)))
    return dt**2 * bl2


def total_cl_tt(cl_tt, noise_uk_arcmin, beam_fwhm_arcmin=0.0):
    """Total TT spectrum C_l + N_l on l = 0..lmax from a raw-Cl theory
    row (muK^2), ready for the kSZ layer's integer-l `Cls` argument
    (models/ksz.py:100).  Rows 0,1 are zeroed (monopole/dipole)."""
    cl_tt = jnp.asarray(cl_tt)
    ells = jnp.arange(cl_tt.shape[0], dtype=cl_tt.dtype)
    tot = cl_tt + white_noise_nl(ells, noise_uk_arcmin, beam_fwhm_arcmin)
    return tot.at[:2].set(0.0)


def _interp_cl(cl, l):
    """Sample an integer-l spectrum at (possibly fractional) l."""
    grid = jnp.arange(cl.shape[0], dtype=l.dtype)
    return jnp.interp(l, grid, cl)


def n0_flat_sky(Ls, est, cl_grad, cl_total, cl_total2=None,
                lmin=30, lmax=None, n_l=400, n_theta=256):
    """Flat-sky quadratic-estimator N0^{phiphi}(L).

    est: 'TT', 'EE' or 'EB'.
    cl_grad: the theory spectrum in the response f (TT for 'TT', EE for
        'EE'/'EB'), raw C_l in muK^2 on integer l from 0.
    cl_total: total (theory+noise) spectrum of the first leg (TT for
        'TT', EE for 'EE'/'EB').
    cl_total2: total spectrum of the second leg where it differs
        ('EB': the BB total). Defaults to cl_total.
    lmin, lmax: multipole range of modes used by the estimator
        (lmax defaults to len(cl_grad)-1).
    n_l, n_theta: Gauss-Legendre orders of the ln(l) x angle quadrature.

    Returns N0(L) with Ls any array of reconstruction multipoles.
    """
    cl_grad = jnp.asarray(cl_grad, dtype=jnp.float64)
    cl_total = jnp.asarray(cl_total, dtype=jnp.float64)
    cl_total2 = cl_total if cl_total2 is None else jnp.asarray(
        cl_total2, dtype=jnp.float64)
    if lmax is None:
        lmax = cl_grad.shape[0] - 1
    lmin = float(lmin)
    lmax = float(lmax)

    # GL nodes: u in ln l1 over [ln lmin, ln lmax]; t = theta in [0, pi]
    # (integrand symmetric under theta -> -theta, factor 2)
    xu, wu = leggauss_cached(int(n_l))
    xt, wt = leggauss_cached(int(n_theta))
    lnl = 0.5 * (np.log(lmax) + np.log(lmin)) \
        + 0.5 * (np.log(lmax) - np.log(lmin)) * xu
    wl = 0.5 * (np.log(lmax) - np.log(lmin)) * wu
    th = 0.5 * np.pi * (xt + 1.0)
    wth = 0.5 * np.pi * wt
    l1 = jnp.asarray(np.exp(lnl))[:, None]          # (n_l, 1)
    ct = jnp.asarray(np.cos(th))[None, :]           # (1, n_theta)
    st = jnp.asarray(np.sin(th))[None, :]
    wgt = jnp.asarray(wl)[:, None] * jnp.asarray(wth)[None, :] \
        * l1**2                                      # d^2l = l1 dl1 dθ, dl1 = l1 du

    c1g = _interp_cl(cl_grad, l1[:, 0])[:, None]
    c1t = _interp_cl(cl_total, l1[:, 0])[:, None]

    def one_L(L):
        l2 = jnp.sqrt(jnp.maximum(L**2 + l1**2 - 2.0 * L * l1 * ct, 1e-30))
        Ldotl1 = L * l1 * ct
        Ldotl2 = L**2 - Ldotl1
        c2g = _interp_cl(cl_grad, l2)
        # angle factors: cos/sin of 2(phi1 - phi2) from the triangle
        cosd = (L * ct - l1) / l2
        sind = L * st / l2
        cos2d = 2.0 * cosd**2 - 1.0
        sin2d = 2.0 * sind * cosd
        if est == "TT":
            f = c1g * Ldotl1 + c2g * Ldotl2
            denom_cl2 = _interp_cl(cl_total, l2)
            D = 2.0
        elif est == "EE":
            f = (c1g * Ldotl1 + c2g * Ldotl2) * cos2d
            denom_cl2 = _interp_cl(cl_total, l2)
            D = 2.0
        elif est == "EB":
            f = c1g * Ldotl1 * sin2d
            denom_cl2 = _interp_cl(cl_total2, l2)
            D = 1.0
        else:
            raise ValueError(f"unknown estimator {est!r}; use TT/EE/EB")
        valid = (l2 >= lmin) & (l2 <= lmax)
        integrand = jnp.where(valid, f**2 / (D * c1t * denom_cl2), 0.0)
        # factor 2 for theta in [0, pi] only
        integral = 2.0 * jnp.sum(wgt * integrand) / (2.0 * np.pi) ** 2
        return 1.0 / integral

    Ls = jnp.asarray(Ls, dtype=jnp.float64)
    return jax.vmap(one_L)(jnp.atleast_1d(Ls))


def n0_kappa_from_phi(Ls, n0_phi):
    """Convert N0^{phiphi} to convergence units: kappa = L(L+1) phi / 2,
    matching the package's C_kk convention."""
    Ls = jnp.asarray(Ls, dtype=jnp.float64)
    return (Ls * (Ls + 1.0) / 2.0) ** 2 * jnp.asarray(n0_phi)


def n0_minimum_variance(n0s):
    """Inverse-variance combination of independent estimators,
    N0_mv = (sum_a 1/N0_a)^{-1} -- the standard approximation that
    neglects inter-estimator covariances (exact when they vanish)."""
    n0s = [jnp.asarray(n) for n in n0s]
    return 1.0 / sum(1.0 / n for n in n0s)


# ---------------------------------------------------------------------------
# Full Hu-Okamoto (2002) estimator family: TT, TE, EE, EB, TB, their
# cross-covariances N^{(ab)(cd)}, and the exact minimum-variance
# combination.  Spectra enter as dicts keyed 'TT'/'EE'/'BB'/'TE' so the
# TE estimator's non-diagonal optimal weight (which mixes all four) has
# everything it needs; the single-pair `n0_flat_sky` above remains the
# lightweight entry point for TT/EE/EB.
# ---------------------------------------------------------------------------

# (leg1 field spectrum, leg2 field spectrum) of each estimator's two legs
_EST_LEGS = {"TT": ("TT", "TT"), "TE": ("TT", "EE"), "EE": ("EE", "EE"),
             "EB": ("EE", "BB"), "TB": ("TT", "BB")}
# which theory spectrum carries the lensing response f of each estimator
_EST_GRAD = {"TT": "TT", "TE": "TE", "EE": "EE", "EB": "EE", "TB": "TE"}


def _nodes_flat_sky(lmin, lmax, n_l, n_theta):
    """Shared GL log-l x angle quadrature nodes (theta in [0, pi], the
    integrands below are even under theta -> -theta; factor 2 applied by
    the callers)."""
    xu, wu = leggauss_cached(int(n_l))
    xt, wt = leggauss_cached(int(n_theta))
    lnl = 0.5 * (np.log(lmax) + np.log(lmin)) \
        + 0.5 * (np.log(lmax) - np.log(lmin)) * xu
    wl = 0.5 * (np.log(lmax) - np.log(lmin)) * wu
    th = 0.5 * np.pi * (xt + 1.0)
    wth = 0.5 * np.pi * wt
    l1 = jnp.asarray(np.exp(lnl))[:, None]
    ct = jnp.asarray(np.cos(th))[None, :]
    st = jnp.asarray(np.sin(th))[None, :]
    wgt = jnp.asarray(wl)[:, None] * jnp.asarray(wth)[None, :] * l1**2
    return l1, ct, st, wgt


def _f_12(est, g1, g2, Ldotl1, Ldotl2, cos2d, sin2d):
    """Hu-Okamoto flat-sky response f_est(l1, l2); g1/g2 = the
    estimator's gradient spectrum at l1/l2, cos2d/sin2d = cos/sin of
    2(phi_1 - phi_2).  For the curl (field-rotation psi) mode, pass
    Ldotl_i -> the cross products (L x l_i); the spectrum/angle
    structure is identical (Namikawa et al. 2012 convention)."""
    if est == "TT":
        return g1 * Ldotl1 + g2 * Ldotl2
    if est == "EE":
        return (g1 * Ldotl1 + g2 * Ldotl2) * cos2d
    if est == "TE":
        return g1 * cos2d * Ldotl1 + g2 * Ldotl2
    if est in ("EB", "TB"):
        return g1 * Ldotl1 * sin2d
    raise ValueError(f"unknown estimator {est!r}")


def _f_21(est, g1, g2, Ldotl1, Ldotl2, cos2d, sin2d):
    """f_est(l2, l1): leg roles swapped.  phi_2 - phi_1 = -(phi_1 -
    phi_2), so cos 2(.) is unchanged and sin 2(.) flips sign."""
    if est in ("TT", "EE"):
        return _f_12(est, g1, g2, Ldotl1, Ldotl2, cos2d, sin2d)
    if est == "TE":
        return g2 * cos2d * Ldotl2 + g1 * Ldotl1
    if est in ("EB", "TB"):
        return -g2 * Ldotl2 * sin2d
    raise ValueError(f"unknown estimator {est!r}")


def _tot_xy(tots, x, y):
    """Total cross-spectrum pair lookup: TB and EB totals vanish (no
    parity-violating primary power, uncorrelated noise)."""
    key = x + y if x <= y else y + x
    if key in ("BE", "BT", "EB", "TB"):
        return None  # identically zero
    return tots[key if key in tots else key[::-1]]


def _est_FF(est, grads, tots, Ldotl1, Ldotl2, cos2d, sin2d):
    """f(l1,l2), F(l1,l2), F(l2,l1) for one estimator on the node grid.

    grads/tots: dicts mapping spectrum key -> (value at l1, value at l2)
    already interpolated onto the (n_l, 1) / (n_l, n_theta) node arrays.
    F is the optimal weight of Hu & Okamoto 2002 eq. (14)-(16): diagonal
    f/(2 C C) for TT/EE, f/(C^aa C^bb) for the uncorrelated-leg EB/TB,
    and the full non-diagonal form for TE (whose legs correlate through
    C^TE)."""
    gk = _EST_GRAD[est]
    g1, g2 = grads[gk]
    f12 = _f_12(est, g1, g2, Ldotl1, Ldotl2, cos2d, sin2d)
    f21 = _f_21(est, g1, g2, Ldotl1, Ldotl2, cos2d, sin2d)
    a, b = _EST_LEGS[est]
    ca1, ca2 = tots[a]
    cb1, cb2 = tots[b]
    if est in ("TT", "EE"):
        F12 = f12 / (2.0 * ca1 * cb2)
        F21 = F12
    elif est in ("EB", "TB"):
        F12 = f12 / (ca1 * cb2)
        F21 = f21 / (ca2 * cb1)
    else:  # TE
        cte1, cte2 = tots["TE"]
        denom = ca1 * cb2 * ca2 * cb1 - (cte1 * cte2) ** 2
        F12 = (cb1 * ca2 * f12 - cte1 * cte2 * f21) / denom
        F21 = (cb2 * ca1 * f21 - cte1 * cte2 * f12) / denom
    return f12, F12, F21


def _interp_spec_pair(spec, l1col, l2mat):
    s = jnp.asarray(spec, dtype=jnp.float64)
    return (_interp_cl(s, l1col[:, 0])[:, None], _interp_cl(s, l2mat))


def _qe_family_one_L(L, ests, cls_grad, cls_total, l1, ct, st,
                     lmin, lmax, mode="grad"):
    """Per-L node-grid quantities shared by the N0 / cross-N0 paths:
    returns (per-est dict of (f12, F12, F21), tots dict, valid mask).
    mode='curl' swaps the dot-product couplings (L.l_i) for the cross
    products (L x l_i) = +/- L l1 sin(theta) -- the field-rotation
    (psi) estimator's response; everything else is unchanged."""
    l2 = jnp.sqrt(jnp.maximum(L**2 + l1**2 - 2.0 * L * l1 * ct, 1e-30))
    if mode == "curl":
        Ldotl1 = L * l1 * st          # (L x l1)
        Ldotl2 = -Ldotl1              # l2 = L - l1 => L x l2 = -L x l1
    elif mode == "grad":
        Ldotl1 = L * l1 * ct
        Ldotl2 = L**2 - Ldotl1
    else:
        raise ValueError(f"unknown mode {mode!r}; use 'grad' or 'curl'")
    cosd = (L * ct - l1) / l2
    sind = L * st / l2
    cos2d = 2.0 * cosd**2 - 1.0
    sin2d = 2.0 * sind * cosd
    need_g = {_EST_GRAD[e] for e in ests}
    need_t = set()
    for e in ests:
        need_t.update(_EST_LEGS[e])
        if e == "TE":
            need_t.add("TE")
    if len(set(ests)) > 1:
        # cross terms sample every available total cross-spectrum
        need_t.update(k for k in ("TT", "EE", "BB", "TE")
                      if k in cls_total)
    grads = {k: _interp_spec_pair(cls_grad[k], l1, l2) for k in need_g}
    tots = {k: _interp_spec_pair(cls_total[k], l1, l2) for k in need_t}
    FF = {e: _est_FF(e, grads, tots, Ldotl1, Ldotl2, cos2d, sin2d)
          for e in ests}
    valid = (l2 >= lmin) & (l2 <= lmax)
    return FF, tots, valid


def _resolve_lrange(cls_grad, lmin, lmax):
    if lmax is None:
        lmax = min(np.asarray(c).shape[0] for c in cls_grad.values()) - 1
    return float(lmin), float(lmax)


def n0_pair_flat_sky(Ls, est, cls_grad, cls_total, lmin=30, lmax=None,
                     n_l=400, n_theta=256, mode="grad"):
    """N0^{phiphi}(L) for any of the five Hu-Okamoto estimators.

    est: 'TT' | 'TE' | 'EE' | 'EB' | 'TB'.
    cls_grad: dict of theory spectra entering the response f -- needs
        'TT' for TT, 'EE' for EE/EB, 'TE' for TE/TB.
    cls_total: dict of total (theory+noise) spectra -- 'TT', 'EE', 'BB'
        as the estimator's legs require, plus 'TE' for the TE
        estimator's non-diagonal optimal weight (noise is assumed
        uncorrelated between T and E, so the TE total is the theory TE).

    N0 = [int d^2 l1/(2pi)^2 f(l1,l2) F(l1,l2)]^{-1} with the optimal
    weights of Hu & Okamoto 2002 eq. (14)-(16); for TT/EE/EB this reduces
    exactly to `n0_flat_sky` (tested).  mode='curl' returns the
    reconstruction noise of the field-rotation (curl psi) estimator --
    the standard lensing systematics NULL TEST (no cosmological curl at
    leading order): same spectra, (L.l_i) -> (L x l_i) in the response
    (Namikawa, Yamauchi & Taruya 2012).  The grad-curl cross-N0 vanishes
    identically by angular parity, so the two reconstructions are
    uncorrelated and need no joint matrix.  EXTENSION beyond the
    reference (no reconstruction-noise model at all, SURVEY section 2)."""
    lmin, lmax = _resolve_lrange(cls_grad, lmin, lmax)
    l1, ct, st, wgt = _nodes_flat_sky(lmin, lmax, n_l, n_theta)
    cls_grad = {k: jnp.asarray(v, dtype=jnp.float64)
                for k, v in cls_grad.items()}
    cls_total = {k: jnp.asarray(v, dtype=jnp.float64)
                 for k, v in cls_total.items()}

    def one_L(L):
        FF, _, valid = _qe_family_one_L(L, (est,), cls_grad, cls_total,
                                        l1, ct, st, lmin, lmax, mode=mode)
        f12, F12, _ = FF[est]
        integrand = jnp.where(valid, f12 * F12, 0.0)
        return 1.0 / (2.0 * jnp.sum(wgt * integrand) / (2.0 * np.pi) ** 2)

    return jax.vmap(one_L)(jnp.atleast_1d(jnp.asarray(Ls,
                                                      dtype=jnp.float64)))


def n0_cross_flat_sky(Ls, est1, est2, cls_grad, cls_total, n0_1=None,
                      n0_2=None, lmin=30, lmax=None, n_l=400, n_theta=256,
                      mode="grad"):
    """Cross-covariance N^{(ab)(cd)}(L) between two quadratic estimators
    (Hu & Okamoto 2002 eq. 17):

        N_(ab)(cd) = N_ab N_cd int d^2 l1/(2pi)^2 F_ab(l1,l2)
                     [ F_cd(l1,l2) C^ac(l1) C^bd(l2)
                       + F_cd(l2,l1) C^ad(l1) C^bc(l2) ],

    all C totals (TB/EB totals vanish).  N_(ab)(ab) = N_ab exactly for
    the optimal weights -- a self-consistency identity the tests pin.
    n0_1/n0_2 may be passed to reuse precomputed auto-N0s; mode='curl'
    gives the covariances between the curl-mode estimators."""
    lmin, lmax = _resolve_lrange(cls_grad, lmin, lmax)
    l1, ct, st, wgt = _nodes_flat_sky(lmin, lmax, n_l, n_theta)
    cls_grad = {k: jnp.asarray(v, dtype=jnp.float64)
                for k, v in cls_grad.items()}
    cls_total = {k: jnp.asarray(v, dtype=jnp.float64)
                 for k, v in cls_total.items()}
    if n0_1 is None:
        n0_1 = n0_pair_flat_sky(Ls, est1, cls_grad, cls_total, lmin=lmin,
                                lmax=lmax, n_l=n_l, n_theta=n_theta,
                                mode=mode)
    if n0_2 is None:
        n0_2 = n0_pair_flat_sky(Ls, est2, cls_grad, cls_total, lmin=lmin,
                                lmax=lmax, n_l=n_l, n_theta=n_theta,
                                mode=mode)
    a, b = _EST_LEGS[est1][0][0], _EST_LEGS[est1][1][0]
    c, d = _EST_LEGS[est2][0][0], _EST_LEGS[est2][1][0]

    def one_L(L):
        FF, tots, valid = _qe_family_one_L(L, (est1, est2), cls_grad,
                                           cls_total, l1, ct, st,
                                           lmin, lmax, mode=mode)
        _, F12_1, _ = FF[est1]
        _, F12_2, F21_2 = FF[est2]
        cac, cbd = _tot_xy(tots, a, c), _tot_xy(tots, b, d)
        cad, cbc = _tot_xy(tots, a, d), _tot_xy(tots, b, c)
        term = jnp.zeros_like(F12_1)
        if cac is not None and cbd is not None:
            term = term + F12_2 * cac[0] * cbd[1]
        if cad is not None and cbc is not None:
            term = term + F21_2 * cad[0] * cbc[1]
        integrand = jnp.where(valid, F12_1 * term, 0.0)
        return 2.0 * jnp.sum(wgt * integrand) / (2.0 * np.pi) ** 2

    integ = jax.vmap(one_L)(jnp.atleast_1d(jnp.asarray(Ls,
                                                       dtype=jnp.float64)))
    return jnp.asarray(n0_1) * jnp.asarray(n0_2) * integ


def n0_mv_flat_sky(Ls, cls_grad, cls_total,
                   ests=("TT", "TE", "EE", "EB", "TB"),
                   lmin=30, lmax=None, n_l=400, n_theta=256,
                   return_matrix=False, mode="grad"):
    """Exact minimum-variance combination of quadratic estimators:

        N_mv(L) = [ 1^T N(L)^{-1} 1 ]^{-1},  w = N^{-1} 1 / (1^T N^{-1} 1)

    with N(L) the full estimator covariance matrix (auto N0s on the
    diagonal, Hu-Okamoto cross-N0s off it) -- the exact version of the
    `n0_minimum_variance` diagonal approximation.  Returns N_mv(L); with
    return_matrix=True also the (nL, n_est, n_est) matrix.  mode='curl'
    gives the combined curl null-test noise."""
    ests = tuple(ests)
    ne = len(ests)
    Ls = jnp.atleast_1d(jnp.asarray(Ls, dtype=jnp.float64))
    autos = {e: n0_pair_flat_sky(Ls, e, cls_grad, cls_total, lmin=lmin,
                                 lmax=lmax, n_l=n_l, n_theta=n_theta,
                                 mode=mode)
             for e in ests}
    N = jnp.zeros((Ls.shape[0], ne, ne), dtype=jnp.float64)
    for i, e1 in enumerate(ests):
        N = N.at[:, i, i].set(autos[e1])
        for j in range(i + 1, ne):
            e2 = ests[j]
            # cross-N0 between parity sectors (even {TT,TE,EE} x odd
            # {EB,TB}) vanishes identically: every C^ac C^bd / C^ad C^bc
            # product contains one TB or EB total, which is zero -- skip
            # the quadrature and leave the entry 0
            if e1.count("B") % 2 != e2.count("B") % 2:
                continue
            nij = n0_cross_flat_sky(Ls, e1, e2, cls_grad, cls_total,
                                    n0_1=autos[e1], n0_2=autos[e2],
                                    lmin=lmin, lmax=lmax, n_l=n_l,
                                    n_theta=n_theta, mode=mode)
            N = N.at[:, i, j].set(nij)
            N = N.at[:, j, i].set(nij)
    ones = jnp.broadcast_to(jnp.ones((ne,), dtype=jnp.float64),
                            (Ls.shape[0], ne))
    winv = jnp.linalg.solve(N, ones[..., None])[..., 0]
    n_mv = 1.0 / jnp.einsum("le->l", winv)
    if return_matrix:
        return n_mv, N
    return n_mv


def lensed_bb_from_ee(cl_ee, clpp, lmax_out=None, n_phi=256):
    """First-order lensing BB from EE and a (possibly residual) lensing
    potential: the T_sin2 convolution of models/lensed_cls.py with the
    TT/TE legs zeroed.  Host-side table plumbing; exactly LINEAR in
    clpp -- the property the iterative-delensing fixed point leans on
    (C_BB[C_pp (1-rho^2)] = C_BB[C_pp] - C_BB[C_pp rho^2])."""
    from .lensed_cls import lens_cls_flat_sky
    cl_ee = np.asarray(cl_ee, dtype=np.float64)
    unl = np.zeros((cl_ee.shape[0], 4))
    unl[:, 1] = cl_ee
    return lens_cls_flat_sky(unl, np.asarray(clpp, dtype=np.float64),
                             lmax_out=lmax_out, n_phi=n_phi)[:, 2]


def n0_eb_iterative(Ls, cl_ee_grad, cl_ee_total, clpp, nl_bb,
                    lmin=30, lmax=None, n_iter=8, tol=1e-3,
                    n_l=400, n_theta=256, n_phi=256, nodes=None,
                    return_info=False):
    """Iteratively delensed EB reconstruction noise N0^{phiphi}(L)
    (CMB-S4-style internal delensing, Smith et al. 2012 fixed point).

    The EB estimator's B-leg variance is mostly lensing BB, which the
    reconstruction itself can remove.  Iterate

        rho^2(L)  = C_pp / (C_pp + N0(L))       (reconstruction coherence)
        C_BB^res  = T_sin2[C_EE, C_pp (1 - rho^2)]
        N0        = n0_flat_sky('EB', ..., cl_total2 = C_BB^res + N_BB)

    from rho = 0 (fully lensed BB); N0 decreases monotonically to the
    fixed point in a few iterations at modern noise levels.

    Args beyond n0_flat_sky's: ``clpp`` raw C_phiphi on integer L
    (its length sets the delensed range); ``nl_bb`` instrument BB noise
    on integer l (white_noise_nl with sqrt(2) x the temperature depth);
    ``nodes`` the L nodes where N0 is evaluated each iteration (default
    ~24 log-spaced over [2, lmax_pp]; interpolated log-log onto integer
    L for rho^2).  Host-side outer loop (forecast plumbing); each
    iteration's quadratures are the jitted n0_flat_sky / lensing
    convolution programs.

    Returns N0 at ``Ls`` (phi-phi units); with return_info=True also a
    dict: 'n0_first' (un-delensed, at 'nodes'), 'n0_nodes', 'rho2' (per
    integer L), 'cl_bb_res', 'iters'.
    """
    cl_ee_grad = np.asarray(cl_ee_grad, dtype=np.float64)
    cl_ee_total = np.asarray(cl_ee_total, dtype=np.float64)
    clpp = np.asarray(clpp, dtype=np.float64)
    nl_bb = np.asarray(nl_bb, dtype=np.float64)
    if lmax is None:
        lmax = cl_ee_grad.shape[0] - 1
    lmax_pp = clpp.shape[0] - 1
    if nodes is None:
        nodes = np.unique(np.round(np.geomspace(2.0, lmax_pp, 24)))
    nodes = np.asarray(nodes, dtype=np.float64)
    lpp = np.arange(lmax_pp + 1, dtype=np.float64)
    nlb = np.zeros(int(lmax) + 1)
    n = min(nl_bb.shape[0], nlb.shape[0])
    nlb[:n] = nl_bb[:n]

    def n0_eval(Lq, cl_bb_tot):
        return np.asarray(n0_flat_sky(Lq, "EB", cl_ee_grad, cl_ee_total,
                                      cl_total2=cl_bb_tot, lmin=lmin,
                                      lmax=lmax, n_l=n_l, n_theta=n_theta))

    cl_bb_tot = lensed_bb_from_ee(cl_ee_grad, clpp, lmax_out=lmax,
                                  n_phi=n_phi) + nlb
    n0_nodes = n0_eval(nodes, cl_bb_tot)
    n0_first = n0_nodes.copy()
    rho2 = np.zeros_like(lpp)
    iters = 0
    for it in range(int(n_iter)):
        n0_int = np.exp(np.interp(np.log(np.maximum(lpp, 2.0)),
                                  np.log(nodes), np.log(n0_nodes)))
        rho2 = np.where(clpp > 0.0, clpp / (clpp + n0_int), 0.0)
        bb_res = lensed_bb_from_ee(cl_ee_grad, clpp * (1.0 - rho2),
                                   lmax_out=lmax, n_phi=n_phi)
        cl_bb_tot = bb_res + nlb
        n0_new = n0_eval(nodes, cl_bb_tot)
        change = float(np.max(np.abs(n0_new / n0_nodes - 1.0)))
        n0_nodes = n0_new
        iters = it + 1
        if change < tol:
            break
    out = n0_eval(np.atleast_1d(np.asarray(Ls, dtype=np.float64)),
                  cl_bb_tot)
    if return_info:
        return out, {"n0_first": n0_first, "n0_nodes": n0_nodes,
                     "nodes": nodes, "rho2": rho2,
                     "cl_bb_res": cl_bb_tot - nlb, "iters": iters}
    return out


def threej000_sq(l1, l2, l3):
    """(l1 l2 l3; 0 0 0)^2, exact closed form via gammaln (f64).

    Zero when J = l1+l2+l3 is odd or the triangle inequality fails;
    otherwise

        3j^2 = (J-2l1)! (J-2l2)! (J-2l3)! / (J+1)!
               * [ (J/2)! / ((J/2-l1)! (J/2-l2)! (J/2-l3)!) ]^2.

    Only the SQUARE is exposed: the full-sky N0 needs f^2 and the two
    response terms share one 3j, so the (-1)^{J/2} sign cancels.
    Relative accuracy ~1e-11 at l ~ 5000 (f64 eps on logGamma ~ 5e4).
    """
    l1 = jnp.asarray(l1, dtype=jnp.float64)
    l2 = jnp.asarray(l2, dtype=jnp.float64)
    l3 = jnp.asarray(l3, dtype=jnp.float64)
    J = l1 + l2 + l3
    g = J / 2.0
    even = jnp.mod(J, 2.0) == 0.0
    tri = (l3 >= jnp.abs(l1 - l2)) & (l3 <= l1 + l2)
    ok = even & tri
    # clamp the factorial args to keep gammaln finite where masked out
    a1 = jnp.where(ok, J - 2.0 * l1, 0.0)
    a2 = jnp.where(ok, J - 2.0 * l2, 0.0)
    a3 = jnp.where(ok, J - 2.0 * l3, 0.0)
    b1 = jnp.where(ok, g - l1, 0.0)
    b2 = jnp.where(ok, g - l2, 0.0)
    b3 = jnp.where(ok, g - l3, 0.0)
    gl = gammaln
    ln = (gl(a1 + 1.0) + gl(a2 + 1.0) + gl(a3 + 1.0) - gl(J + 2.0)
          + 2.0 * (gl(g + 1.0) - gl(b1 + 1.0) - gl(b2 + 1.0)
                   - gl(b3 + 1.0)))
    return jnp.where(ok, jnp.exp(ln), 0.0)


def _n0_tt_fullsky_one(L, cl_grad, cl_total, lmin, lmax, width):
    """1/A_L for one reconstruction multipole (see n0_tt_fullsky)."""
    l1 = jnp.arange(float(lmin), float(lmax) + 1.0)[:, None]   # (n1, 1)
    j = jnp.arange(float(width))[None, :]                      # (1, W)
    l2 = jnp.abs(l1 - L) + j                                   # (n1, W)
    valid = (j <= 2.0 * jnp.minimum(l1, L)) & (l2 >= float(lmin)) \
        & (l2 <= float(lmax))
    l2c = jnp.where(valid, l2, l1 + L)      # safe in-triangle placeholder
    w2 = threej000_sq(l1, jnp.full_like(l2c, L), l2c)
    # f_{l1 L l2} = pref * 3j * [ C_{l1} (L(L+1)+l1(l1+1)-l2(l2+1))
    #                           + C_{l2} (L(L+1)+l2(l2+1)-l1(l1+1)) ] / 2
    LL = L * (L + 1.0)
    s1 = l1 * (l1 + 1.0)
    s2 = l2c * (l2c + 1.0)
    c1g = _interp_cl(cl_grad, l1[:, 0])[:, None]
    c2g = _interp_cl(cl_grad, l2c)
    bracket = 0.5 * (c1g * (LL + s1 - s2) + c2g * (LL + s2 - s1))
    pref2 = (2.0 * l1 + 1.0) * (2.0 * L + 1.0) * (2.0 * l2c + 1.0) \
        / (4.0 * jnp.pi)
    f2 = pref2 * w2 * bracket**2
    c1t = _interp_cl(cl_total, l1[:, 0])[:, None]
    c2t = _interp_cl(cl_total, l2c)
    inv_a = jnp.sum(jnp.where(valid, f2 / (2.0 * c1t * c2t), 0.0)) \
        / (2.0 * L + 1.0)
    return 1.0 / inv_a


def _n1_tt_one(L, cl_grad, cl_total, clpp, lmin, lmax, n_l, n_theta,
               n_s, n_alpha):
    """2 * Term1 integral of the N1 derivation (see n1_tt_flat_sky);
    returns N1 / N0^2 (the caller multiplies by A_L^2 = N0^2)."""
    lmax_pp = clpp.shape[0] - 1

    # l1: GL in ln r over [lmin, lmax] x midpoint angle over [0, 2pi)
    xu, wu = leggauss_cached(int(n_l))
    lnr = 0.5 * (np.log(lmax) + np.log(lmin)) \
        + 0.5 * (np.log(lmax) - np.log(lmin)) * xu
    wr = 0.5 * (np.log(lmax) - np.log(lmin)) * wu
    r1 = np.exp(lnr)
    t1 = (np.arange(n_theta) + 0.5) * (2.0 * np.pi / n_theta)
    w1 = (r1**2 * wr)[:, None] * (2.0 * np.pi / n_theta)   # d^2 l1 weight

    # s: GL in ln s over [2, lmax_pp] x midpoint alpha over [0, pi) x 2
    xs_, ws_ = leggauss_cached(int(n_s))
    lns = 0.5 * (np.log(lmax_pp) + np.log(2.0)) \
        + 0.5 * (np.log(lmax_pp) - np.log(2.0)) * xs_
    wss = 0.5 * (np.log(lmax_pp) - np.log(2.0)) * ws_
    rs = np.exp(lns)
    al = (np.arange(n_alpha) + 0.5) * (np.pi / n_alpha)
    w2 = 2.0 * (rs**2 * wss)[:, None] * (np.pi / n_alpha)  # d^2 s weight

    # components, broadcast (n_l, n_theta, n_s, n_alpha); L along x
    l1x = jnp.asarray(np.cos(t1))[None, :, None, None] \
        * jnp.asarray(r1)[:, None, None, None]
    l1y = jnp.asarray(np.sin(t1))[None, :, None, None] \
        * jnp.asarray(r1)[:, None, None, None]
    sx = jnp.asarray(np.cos(al))[None, None, None, :] \
        * jnp.asarray(rs)[None, None, :, None]
    sy = jnp.asarray(np.sin(al))[None, None, None, :] \
        * jnp.asarray(rs)[None, None, :, None]
    l2x, l2y = L - l1x, -l1y
    l3x, l3y = sx - l1x, sy - l1y
    l4x, l4y = -L - l3x, -l3y

    m1 = jnp.sqrt(l1x**2 + l1y**2)
    m2 = jnp.sqrt(l2x**2 + l2y**2)
    m3 = jnp.sqrt(jnp.maximum(l3x**2 + l3y**2, 1e-30))
    m4 = jnp.sqrt(jnp.maximum(l4x**2 + l4y**2, 1e-30))
    c1, c2 = _interp_cl(cl_grad, m1), _interp_cl(cl_grad, m2)
    c3, c4 = _interp_cl(cl_grad, m3), _interp_cl(cl_grad, m4)

    def fdot(ca, ax, ay, cb, bx, by):
        # f(a, b) = C_a (a+b).a + C_b (a+b).b
        kx, ky = ax + bx, ay + by
        return ca * (kx * ax + ky * ay) + cb * (kx * bx + ky * by)

    f12 = fdot(c1, l1x, l1y, c2, l2x, l2y)
    f34 = fdot(c3, l3x, l3y, c4, l4x, l4y)
    f13 = fdot(c1, l1x, l1y, c3, l3x, l3y)
    f24 = fdot(c2, l2x, l2y, c4, l4x, l4y)

    t1_ = _interp_cl(cl_total, m1)
    t2_ = _interp_cl(cl_total, m2)
    t3_ = _interp_cl(cl_total, m3)
    t4_ = _interp_cl(cl_total, m4)
    band = ((m1 >= lmin) & (m1 <= lmax) & (m2 >= lmin) & (m2 <= lmax)
            & (m3 >= lmin) & (m3 <= lmax) & (m4 >= lmin) & (m4 <= lmax))
    F12 = jnp.where(band, f12 / (2.0 * t1_ * t2_), 0.0)
    F34 = jnp.where(band, f34 / (2.0 * t3_ * t4_), 0.0)

    cpp_s = _interp_cl(clpp, jnp.sqrt(sx**2 + sy**2))
    integrand = F12 * F34 * f13 * f24 * cpp_s
    w = jnp.asarray(w1)[:, :, None, None] * jnp.asarray(w2)[None, None]
    return 2.0 * jnp.sum(w * integrand) / (2.0 * np.pi) ** 4


def n1_tt_flat_sky(Ls, cl_grad, cl_total, clpp, lmin=30, lmax=None,
                   n_l=96, n_theta=64, n_s=64, n_alpha=32, n0_phi=None):
    """Flat-sky N1 bias of the TT quadratic estimator (the O(C_pp)
    secondary-coupling noise that adds to N0).

    Derivation (from scratch; Wick contractions of the first-order
    lensed T(l) = T0(l) - int (l-m).m phi(l-m) T0(m) d^2m/(2pi)^2):
    with <T(a)T(b)> = f(a, b) phi(a+b), f(a,b) = C_a (a+b).a +
    C_b (a+b).b, the estimator phi_hat(L) = A_L int F(l1, L-l1) T T
    (F = f/(2 C^tot C^tot), A_L = N0) has the connected secondary
    4-point contribution

        N1(L) = A_L^2 int int [d^2 l1 d^2 l3 / (2pi)^4] F(l1,l2)
                F(l3,l4) [ C_pp(|l1+l3|) f(l1,l3) f(l2,l4)
                         + C_pp(|l1+l4|) f(l1,l4) f(l2,l3) ],
        l2 = L - l1,  l4 = -L - l3.

    Substituting s = l1 + l3 in the first term makes the steep C_pp(s)
    weight its own log-radial x angle quadrature (the integrand is
    PEAKED at small s where C_pp ~ s^-4 -- a naive (l1, l3) grid
    misses it); the second term equals the first under the relabeling
    l3 <-> l4 (F is symmetric in its arguments), giving the factor 2.

    Validated against an independent dense-grid numpy twin
    (twin/lensing_noise.n1_tt_dense, piecewise-linear-s x midpoint
    grids): converged agreement 0.1% (L=100), 0.8% (400), 5% (800).
    Default quadrature orders are ~1% converged at L <= 400 and ~3% at
    L = 800 against a 2x-refined reference (measured); the whole
    (n_l x n_theta x n_s x n_alpha) integrand is one broadcast
    expression per L.

    n0_phi: optionally pass the per-L N0 (same band/cuts) to skip the
    internal n0_flat_sky call.  Returns N1^{phiphi} at Ls.
    """
    cl_grad = jnp.asarray(cl_grad, dtype=jnp.float64)
    cl_total = jnp.asarray(cl_total, dtype=jnp.float64)
    clpp = jnp.asarray(clpp, dtype=jnp.float64)
    if lmax is None:
        lmax = cl_grad.shape[0] - 1
    Ls = np.atleast_1d(np.asarray(Ls, dtype=np.float64))
    if n0_phi is None:
        n0_phi = n0_flat_sky(Ls, "TT", cl_grad, cl_total, lmin=lmin,
                             lmax=lmax)
    n0_phi = jnp.asarray(n0_phi)
    fn = jax.jit(_n1_tt_one, static_argnames=("lmin", "lmax", "n_l",
                                              "n_theta", "n_s", "n_alpha"))
    core = [fn(float(L), cl_grad, cl_total, clpp, lmin=float(lmin),
               lmax=float(lmax), n_l=int(n_l), n_theta=int(n_theta),
               n_s=int(n_s), n_alpha=int(n_alpha)) for L in Ls]
    return n0_phi**2 * jnp.stack(core)


def n0_tt_fullsky(Ls, cl_grad, cl_total, lmin=30, lmax=None):
    """EXACT full-sky TT quadratic-estimator N0^{phiphi}(L).

    Independent formalism from n0_flat_sky: the spherical-harmonic
    response, derived from scratch (no transcription).  Lensing couples
    T_{l1 m1} T_{l2 m2} off the diagonal,

        <T_{l1 m1} T_{l2 m2}> = sum_{LM} (-1)^M (l1 l2 L; m1 m2 -M)
                                 f_{l1 L l2} phi_{LM},

    where the gradient integral int Y*_{l1} grad Y_L . grad Y_{l2} =
    (1/2)[L(L+1) + l2(l2+1) - l1(l1+1)] int Y*_{l1} Y_L Y_{l2} (exact
    spherical identity) and the Gaunt integral give

        f = (1/2) sqrt((2l1+1)(2L+1)(2l2+1)/4pi) (l1 L l2; 0 0 0)
            * [ C_{l1} (L(L+1)+l1(l1+1)-l2(l2+1))
              + C_{l2} (L(L+1)+l2(l2+1)-l1(l1+1)) ].

    The inverse-variance-weighted unbiased estimator then has

        N0(L) = A_L,   A_L^{-1} = (1/(2L+1)) sum_{l1 l2}
                                   f^2 / (2 C^tot_{l1} C^tot_{l2}).

    In the flat limit (1/2)[L(L+1)+l1(l1+1)-l2(l2+1)] -> L.l1 with
    l2 = L - l1, recovering n0_flat_sky's f_TT = C_{l1} L.l1 +
    C_{l2} L.l2 -- so agreement at L >> 1 (tested at ~1%) validates
    BOTH modules' conventions with no shared code or fitted constants,
    while this path stays exact at the lowest L where flat-sky errs.

    O(lmax x min(2L+1, 2lmax)) exact 3j^2 evaluations per L (gammaln
    closed form), evaluated as one masked (n_l1, width) array --
    MXU/VPU-shaped, no Python loops over multipoles.
    """
    cl_grad = jnp.asarray(cl_grad, dtype=jnp.float64)
    cl_total = jnp.asarray(cl_total, dtype=jnp.float64)
    if lmax is None:
        lmax = cl_grad.shape[0] - 1
    Ls = np.atleast_1d(np.asarray(Ls, dtype=np.float64))
    width = int(2 * min(int(Ls.max()), int(lmax)) + 1)
    fn = jax.jit(_n0_tt_fullsky_one,
                 static_argnames=("lmin", "lmax", "width"))
    out = [fn(float(L), cl_grad, cl_total, lmin=int(lmin),
              lmax=int(lmax), width=width) for L in Ls]
    return jnp.stack(out)
