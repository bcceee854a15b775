"""SZ cluster-count forecasting: observable-mass scatter and completeness.

EXTENSION beyond the reference: hmvec exercises the sharp-threshold cluster
abundance only as a manual szar/hmf cross-check (reference bin/tests.py:73-131,
no API); real SZ count cosmology needs the observable layer between the mass
function and the data — a scaling relation with intrinsic scatter and a
survey detection threshold.  This module adds that layer on top of any
`HaloModel` mass function, keeping every piece jit/grad-safe so survey
forecasts can differentiate through (cosmology + scaling-relation) jointly.

Model (Planck-2013-like, arXiv:1303.5080 Eq. 7 parameterization):

    ln Ybar(M, z) = ln Y* + alpha ln(M / Mpivot) + beta ln E(z)

with lognormal intrinsic scatter ``sigma_lnY`` around ln Ybar.  A cluster is
detected when its observed Y exceeds q x sigma_noise(z) (q = detection SNR);
for Gaussian measurement noise folded in quadrature the completeness is the
lognormal survival function

    chi(M, z) = P(Y > q sigma_N | M, z)
              = 1/2 erfc( [ln(q sigma_N(z)) - ln Ybar(M, z)]
                          / (sqrt(2) sigma_tot) ).

Counts are the completeness-weighted mass-function integral over the
comoving volume (same dV/dz convention as HaloModel.cluster_counts):

    dN/dz = fsky * 4 pi chi(z)^2 / H(z) * int dM n(M, z) chi(M, z).

``counts_q_bins`` generalizes the threshold to SNR bins [q_i, q_{i+1}) for a
binned number-count likelihood: the in-bin probability is a difference of
two survival functions.

All mass/redshift reductions are static-weight trapz contractions on the
instance grids; scaling-relation parameters (lnYstar, alpha, beta,
sigma_lnY) and sigma_noise may be traced, so Fisher derivatives with respect
to both cosmology and the scaling relation come from one `jacfwd`.

Oracle: explicit-loop numpy/scipy twin (twin/cluster_counts.py) +
sharp-threshold limit (sigma -> 0 recovers a mass-limit step) in
tests/test_cluster_counts.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import erfc

from ..utils.weights import trapz_weights

# Planck-2013 XX baseline values (Eq. 7 / Table 1): alpha, beta = 2/3 fixed
# slope convention, sigma_lnY ~ 0.127 * ln 10.  Mpivot = 6e14 Msun (3e14/0.7
# x h-ish conventions vary; this module takes ALL of them as inputs and only
# defaults here).
DEFAULT_SCALING = {
    "lnYstar": np.log(1e-4),   # arbitrary Y units; only q sigma_N must match
    "alpha": 1.79,
    "beta": 2.0 / 3.0,
    "Mpivot": 6e14,
    "sigma_lnY": 0.127 * np.log(10.0),
}


def ln_ybar(ms, ez, lnYstar, alpha, beta, Mpivot):
    """ln Ybar(M, z) on the (z, m) grid; ``ez`` is E(z) = H(z)/H0."""
    lms = jnp.log(jnp.asarray(ms) / Mpivot)[None, :]
    return lnYstar + alpha * lms + beta * jnp.log(jnp.asarray(ez))[:, None]


def completeness(ms, ez, q, sigma_noise, lnYstar=None, alpha=None, beta=None,
                 Mpivot=None, sigma_lnY=None, sigma_meas_ln=0.0):
    """Detection probability chi(M, z) above SNR ``q``.

    ``sigma_noise``: survey noise level sigma_N(z) in Y units — scalar or
    (nz,).  ``sigma_meas_ln``: optional extra lognormal measurement scatter,
    added in quadrature with the intrinsic ``sigma_lnY``.
    Returns the (nz, nm) completeness grid in [0, 1].
    """
    d = DEFAULT_SCALING
    lnYstar = d["lnYstar"] if lnYstar is None else lnYstar
    alpha = d["alpha"] if alpha is None else alpha
    beta = d["beta"] if beta is None else beta
    Mpivot = d["Mpivot"] if Mpivot is None else Mpivot
    sigma_lnY = d["sigma_lnY"] if sigma_lnY is None else sigma_lnY
    lnyb = ln_ybar(ms, ez, lnYstar, alpha, beta, Mpivot)
    sig = jnp.sqrt(jnp.asarray(sigma_lnY) ** 2 + jnp.asarray(sigma_meas_ln) ** 2)
    lim = jnp.log(q * jnp.atleast_1d(jnp.asarray(sigma_noise)))[..., None]
    # double-where: an infinite threshold (q = inf bin edge) must give
    # survival 0 with ZERO gradient -- the naive path chains
    # d/dsigma erfc((inf - lnyb)/sigma) into exp(-inf) * inf = NaN
    finite = jnp.isfinite(lim)
    lim_safe = jnp.where(finite, lim, 0.0)
    surv = 0.5 * erfc((lim_safe - lnyb) / (jnp.sqrt(2.0) * sig))
    return jnp.where(finite, surv, 0.0)


def dndz_detected(zs, ms, nzm, chis, hzs, ez, q, sigma_noise, fsky=1.0,
                  **scaling):
    """(dN/dz, N_total) of detected clusters.

    ``nzm``: (nz, nm) mass function from HaloModel.get_nzm(); ``chis``/
    ``hzs``: comoving distance and H(z) [1/Mpc] on ``zs``; ``ez`` = E(z).
    The sharp-threshold limit (sigma_lnY -> 0, sigma_meas_ln = 0) recovers
    HaloModel.cluster_counts with mmin = M_lim(z).
    """
    comp = completeness(ms, ez, q, sigma_noise, **scaling)
    wm = jnp.asarray(trapz_weights(np.asarray(ms)))
    n_of_z = (jnp.asarray(nzm) * comp) @ wm
    dvdz = 4.0 * jnp.pi * jnp.asarray(chis) ** 2 / jnp.asarray(hzs)
    dndz = fsky * dvdz * n_of_z
    wz = jnp.asarray(trapz_weights(np.asarray(zs)))
    return dndz, dndz @ wz


def counts_q_bins(zs, ms, nzm, chis, hzs, ez, q_edges, sigma_noise,
                  fsky=1.0, z_edges=None, **scaling):
    """Binned expected counts N_{z-bin, q-bin} for a count likelihood.

    ``q_edges``: SNR bin edges (nq+1,), last bin may use jnp.inf;
    ``z_edges``: optional redshift bin edges — omitted, returns the
    (nz, nq) dN/dz grid instead of z-integrated bins.
    The in-bin probability is the difference of two completeness grids
    (survival functions), so the columns sum exactly to the single-
    threshold result at q_edges[0] when the last edge is inf.
    """
    q_edges = jnp.asarray(q_edges)
    wm = jnp.asarray(trapz_weights(np.asarray(ms)))
    dvdz = 4.0 * jnp.pi * jnp.asarray(chis) ** 2 / jnp.asarray(hzs)

    def surv(q):
        return completeness(ms, ez, q, sigma_noise, **scaling)

    # (nq+1, nz, nm) survival stack -> (nq, nz, nm) bin probabilities
    # jnp.inf edge: erfc(+inf) = 0 exactly, no special-casing needed
    S = jnp.stack([surv(q) for q in q_edges])
    Pbin = S[:-1] - S[1:]
    dndz_q = fsky * dvdz[None, :] * ((jnp.asarray(nzm)[None] * Pbin) @ wm)
    dndz_q = jnp.moveaxis(dndz_q, 0, -1)                    # (nz, nq)
    if z_edges is None:
        return dndz_q
    zs = np.asarray(zs)
    wz = trapz_weights(zs)
    z_edges = np.asarray(z_edges)
    rows = []
    for lo, hi in zip(z_edges[:-1], z_edges[1:]):
        sel = (zs >= lo) & (zs < hi)
        # per-bin trapz restricted to the bin's grid points
        wbin = trapz_weights(zs[sel]) if sel.sum() > 1 else np.zeros(0)
        rows.append(jnp.moveaxis(dndz_q[sel], 0, -1) @ jnp.asarray(wbin)
                    if sel.sum() > 1 else jnp.zeros(dndz_q.shape[1]))
    return jnp.stack(rows)                                   # (nzbin, nq)


def mass_limit(zs, ez, q, sigma_noise, lnYstar=None, alpha=None, beta=None,
               Mpivot=None, **_ignored):
    """Sharp-threshold detection mass M_lim(z): Ybar(M_lim, z) = q sigma_N.

    Closed form from the power-law relation; the sigma -> 0 limit of the
    completeness is a step at this mass.
    """
    d = DEFAULT_SCALING
    lnYstar = d["lnYstar"] if lnYstar is None else lnYstar
    alpha = d["alpha"] if alpha is None else alpha
    beta = d["beta"] if beta is None else beta
    Mpivot = d["Mpivot"] if Mpivot is None else Mpivot
    del zs
    lim = jnp.log(q * jnp.atleast_1d(jnp.asarray(sigma_noise)))
    lnm = (lim - lnYstar - beta * jnp.log(jnp.asarray(ez))) / alpha
    return Mpivot * jnp.exp(lnm)


# --------------------------------------------------- sample variance (SSC)

def _sinc(x):
    """sin(x)/x with a Taylor guard at the origin."""
    xs = jnp.where(jnp.abs(x) < 1e-6, 1.0, x)
    return jnp.where(jnp.abs(x) < 1e-6, 1.0 - x**2 / 6.0, jnp.sin(xs) / xs)


def _interp_loglog_rows(ks, P_rows, K):
    """Interpolate each row of P_rows (nb, nk) at K (shared (nq,) query)
    linearly in (ln k, ln P); flat-clipped at the edges.  P must be
    positive (guarded at 1e-300)."""
    lks = jnp.log(jnp.asarray(ks))
    lnP = jnp.log(jnp.maximum(jnp.asarray(P_rows), 1e-300))
    lK = jnp.log(K)
    i = jnp.clip(jnp.searchsorted(lks, lK) - 1, 0, lks.size - 2)
    t = jnp.clip((lK - lks[i]) / (lks[i + 1] - lks[i]), 0.0, 1.0)
    p0 = lnP[:, i]
    p1 = lnP[:, i + 1]
    return jnp.exp(p0 + t[None, :] * (p1 - p0))


def window_sigma2(zedges, zs, chis, ks_lin, plin, fsky,
                  n_kr=2048, kr_max=0.3, n_kperp=257, kperp_max=2.0):
    """Covariance sigma^2_ij of the volume-averaged background density
    between redshift-bin survey windows (the sample-variance kernel of
    cluster counts; Hu & Kravtsov 2003, Lima & Hu 2004):

      sigma^2_ij = 2 int_0^inf dk_r/(2pi) cos(k_r (c_i - c_j))
                       sinc(k_r D_i/2) sinc(k_r D_j/2)
                   int dk_perp k_perp/(2pi) W_d(k_perp R_i) W_d(k_perp R_j)
                       P_ij(sqrt(k_r^2 + k_perp^2))

    (the k_r integral runs over the full real line; the integrand's real
    part is even, hence the factor 2)

    -- the flat-sky separable window: a radial top-hat over each bin's
    [chi_i^-, chi_i^+] (center c_i, width D_i) times the survey disk
    W_d = 2 J1(x)/x of angular radius theta_s = arccos(1 - 2 fsky) at the
    bin-center distance (R_i = c_i theta_s).  P_ij = sqrt(P_i P_j) with
    P_i the linear power at the bin-center redshift (exactly D(z_i)D(z_j)
    P for linear growth).

    TPU shape: both cos(k_r dc_ij) (via the angle-difference identity)
    and the windows factor per-bin, so sigma^2 = A W A^T + B W B^T --
    two (nb, n_kr*n_kperp) x diag-weight matmuls, no per-pair loops.

    EXTENSION beyond the reference (no covariance of any kind there);
    oracle: independent 1D real-space double-interval integral of the
    Gaussian-P spectrum in the R -> 0 limit plus PSD/decay properties
    (tests/test_cluster_counts.py).
    """
    zedges = np.asarray(zedges, dtype=float)
    zs_j = jnp.asarray(zs)
    chis = jnp.asarray(chis)
    chi_e = jnp.interp(jnp.asarray(zedges), zs_j, chis)
    c = 0.5 * (chi_e[1:] + chi_e[:-1])                     # (nb,) centers
    D = chi_e[1:] - chi_e[:-1]                             # (nb,) widths
    zc = 0.5 * (zedges[1:] + zedges[:-1])

    # P at the bin-center redshifts: z-lerp of the (nz, nk) table
    plin = jnp.atleast_2d(jnp.asarray(plin))
    nz = plin.shape[0]
    if nz > 1:
        iz = jnp.clip(jnp.searchsorted(zs_j, jnp.asarray(zc)) - 1, 0, nz - 2)
        tz = jnp.clip((jnp.asarray(zc) - zs_j[iz])
                      / (zs_j[iz + 1] - zs_j[iz]), 0.0, 1.0)
        P_b = plin[iz] * (1.0 - tz)[:, None] + plin[iz + 1] * tz[:, None]
    else:
        P_b = jnp.broadcast_to(plin[0][None, :], (zc.size, plin.shape[1]))

    theta_s = np.arccos(1.0 - 2.0 * float(fsky))
    R = c * theta_s                                        # (nb,)

    # quadrature grids: linear k_r (cos(k_r c) oscillates at ~2pi/c),
    # log k_perp (disk window + power decay)
    kr = jnp.linspace(0.0, kr_max, n_kr)
    wkr = jnp.asarray(trapz_weights(np.asarray(kr)))
    kp = jnp.geomspace(1e-5, kperp_max, n_kperp)
    wkp = jnp.asarray(trapz_weights(np.asarray(kp)))

    K = jnp.sqrt(kr[:, None] ** 2 + kp[None, :] ** 2)      # (nkr, nkp)
    Q = jnp.sqrt(_interp_loglog_rows(ks_lin, P_b, K.reshape(-1)))
    Q = Q.reshape((c.size,) + K.shape)                     # (nb, nkr, nkp)

    from ..ops.special import disk_window
    rad = _sinc(kr[None, :] * D[:, None] / 2.0)            # (nb, nkr)
    disk = disk_window(kp[None, :] * R[:, None])           # (nb, nkp)
    base = rad[:, :, None] * disk[:, None, :] * Q          # (nb, nkr, nkp)
    A = base * jnp.cos(kr[None, :, None] * c[:, None, None])
    B = base * jnp.sin(kr[None, :, None] * c[:, None, None])
    # 2x: the even-in-k_r integrand folded onto k_r >= 0
    w = (2.0 * wkr[:, None] * (wkp * kp)[None, :] / (2.0 * jnp.pi) ** 2)
    Af = A.reshape(c.size, -1)
    Bf = B.reshape(c.size, -1)
    wf = w.reshape(-1)
    return (Af * wf[None, :]) @ Af.T + (Bf * wf[None, :]) @ Bf.T


def counts_covariance(N_i, bN_i, sigma2_ij):
    """Binned cluster-count covariance: Poisson + sample variance,

      Cov_ij = delta_ij N_i + <bN>_i <bN>_j sigma^2_ij

    (Hu & Kravtsov 2003 Eq. 4 structure).  N_i: expected counts per bin;
    bN_i: bias-weighted counts per bin; sigma2_ij from window_sigma2."""
    N_i = jnp.asarray(N_i)
    bN_i = jnp.asarray(bN_i)
    return jnp.diag(N_i) + bN_i[:, None] * bN_i[None, :] * sigma2_ij
