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
