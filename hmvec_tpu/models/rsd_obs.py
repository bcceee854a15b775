"""Observational redshift-space effects + forecasting (EXTENSION).

Alcock-Paczynski (AP) coordinate distortions and the Gaussian
multipole covariance -- together with models/rsd.py and models/tns.py
this completes a BOSS/DESI-style full-shape forecasting stack, all
jit/grad-safe (Fisher derivatives with respect to alpha_par/alpha_perp,
b, f, sigma_v come from jax.jacfwd for free).  The reference has no
redshift-space machinery at all.

AP: when the fiducial cosmology used to convert angles/redshifts to
distances differs from the true one, the observed wavenumbers are
rescaled anisotropically (alpha_par = H_fid/H_true along the line of
sight, alpha_perp = D_A_true/D_A_fid across it):

    k_true  = k_obs * sqrt[(mu_obs/a_par)^2 + (1-mu_obs^2)/a_perp^2],
    mu_true = (mu_obs/a_par) / sqrt[...],
    P_obs(k_obs, mu_obs) = P_s(k_true, mu_true) / (a_par a_perp^2).

Covariance (Gaussian mode counting, Grieb et al. 2016 thin-shell
limit):

    Cov[P_l(k), P_l'(k)] = (2l+1)(2l'+1) * 2/N_k *
        int_0^1 dmu L_l L_l' [P_s(k,mu) + 1/nbar]^2,
    N_k = V k^2 dk / (2 pi^2)   (modes in the shell; mu-symmetric
                                 pairs already counted once).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.weights import leggauss_cached
from .rsd import _fog, _legendre


def _interp_rows(ks, table, kpts):
    """Linear-in-ln-k interpolation of a (nk,) table at kpts (any
    shape), flat extrapolation (AP shifts stay near the table for
    alpha ~ 1; sign-indefinite tables excluded from log-log)."""
    return jnp.interp(jnp.log(kpts), jnp.log(jnp.asarray(ks)),
                      jnp.asarray(table))


def tns_pk_mu_points(kpts, mupts, ks, p_dd, p_dt, p_tt, b, f, ab,
                     sigma_v=0.0, fog="gaussian"):
    """TNS P_s at POINTWISE (k, mu) pairs (any common shape), with the
    k-tabulated ingredients (p_dd/p_dt/p_tt on ks; ab from
    tns_ab_integrals) interpolated linearly in ln k.  The mu/f/b
    dependence is analytic, so off-grid evaluation costs only the
    1-D interpolations -- this is the AP evaluation primitive."""
    from .tns import tns_ab_integrals  # noqa: F401  (doc pointer)
    kpts = jnp.asarray(kpts)
    mu = jnp.asarray(mupts)
    pdd = _interp_rows(ks, p_dd, kpts)
    pdt = _interp_rows(ks, p_dt, kpts)
    ptt = _interp_rows(ks, p_tt, kpts)
    beta = f / b
    A = 0.0
    for (m, n), I in ab["A"].items():
        A = A + mu**m * beta**n * _interp_rows(ks, I, kpts)
    B = 0.0
    for (m, n), I in ab["B"].items():
        B = B + mu**m * beta**n * _interp_rows(ks, I, kpts)
    core = (b**2 * pdd + 2.0 * b * f * mu**2 * pdt + f**2 * mu**4 * ptt
            + b**3 * (mu * beta) * A + b**4 * (mu * beta) ** 2 * B)
    return _fog(kpts * mu, sigma_v, fog) * core


def ap_shift(ks_obs, mus_obs, alpha_par, alpha_perp):
    """Observed -> true (k, mu): returns (k_true, mu_true) on the
    (nmu, nk) outer grid."""
    k = jnp.asarray(ks_obs)[None, :]
    mu = jnp.asarray(mus_obs)[:, None]
    fac = jnp.sqrt((mu / alpha_par) ** 2 + (1.0 - mu**2) / alpha_perp**2)
    return k * fac, (mu / alpha_par) / fac


def ap_multipoles(ks_obs, pk_mu_points_fn, alpha_par=1.0,
                  alpha_perp=1.0, ells=(0, 2, 4), n_mu=32):
    """Observed multipoles under AP distortion:

        P_l^obs(k') = (2l+1)/2 int dmu' L_l(mu')
                      P_s(k(k',mu'), mu(k',mu')) / (a_par a_perp^2)

    pk_mu_points_fn(kpts, mupts) evaluates the TRUE-coordinate model
    pointwise (e.g. a closure over tns_pk_mu_points).  Gauss-Legendre
    in mu'; differentiable in the alphas."""
    x_np, w_np = leggauss_cached(n_mu)
    mus = jnp.asarray(x_np)
    w = jnp.asarray(w_np)
    kt, mut = ap_shift(ks_obs, mus, alpha_par, alpha_perp)
    ps = pk_mu_points_fn(kt, mut) / (alpha_par * alpha_perp**2)
    out = {}
    for ell in ells:
        wl = w * _legendre(ell, mus) * (2.0 * ell + 1.0) / 2.0
        out[ell] = jnp.einsum("m,mk->k", wl, ps)
    return out


def multipole_covariance(ks, pk_mu_points_fn, nbar, volume, dk=None,
                         ells=(0, 2, 4), n_mu=64):
    """Gaussian covariance of the power-spectrum multipoles in
    k-shells:

        C_{ll'}(k_i) = (2l+1)(2l'+1) (2/N_i)
                       int_0^1 dmu L_l L_l' [P_s(k_i,mu) + 1/nbar]^2,
        N_i = V k_i^2 dk_i / (2 pi^2).

    ks: shell centers; dk: shell widths (default: log-spaced widths
    from the ks themselves); nbar: tracer density [1/Mpc^3] (shot
    noise 1/nbar enters the diagonal kernel); volume [Mpc^3].
    Returns (nl, nl, nk) with l-order following `ells` -- block-
    diagonal in k (thin-shell Gaussian limit)."""
    ks = jnp.asarray(ks)
    if dk is None:
        lnk = jnp.log(ks)
        edges = jnp.concatenate([
            jnp.array([lnk[0] - 0.5 * (lnk[1] - lnk[0])]),
            0.5 * (lnk[1:] + lnk[:-1]),
            jnp.array([lnk[-1] + 0.5 * (lnk[-1] - lnk[-2])])])
        dk = jnp.exp(edges[1:]) - jnp.exp(edges[:-1])
    Nk = volume * ks**2 * jnp.asarray(dk) / (2.0 * jnp.pi**2)
    x_np, w_np = leggauss_cached(n_mu)
    # map GL nodes to [0, 1] (the integrand is mu-even)
    mus = jnp.asarray(0.5 * (x_np + 1.0))
    w = jnp.asarray(0.5 * w_np)
    kgrid = jnp.broadcast_to(ks[None, :], (len(x_np), len(ks)))
    mugrid = jnp.broadcast_to(mus[:, None], kgrid.shape)
    ptot = pk_mu_points_fn(kgrid, mugrid) + 1.0 / nbar     # (nmu, nk)
    legs = jnp.stack([_legendre(ell, mus) for ell in ells])  # (nl,nmu)
    integ = jnp.einsum("am,bm,m,mk->abk", legs, legs, w, ptot**2)
    pref = jnp.asarray([(2 * ell + 1) for ell in ells], dtype=ptot.dtype)
    return (pref[:, None, None] * pref[None, :, None]
            * 2.0 / Nk[None, None, :] * integ)


def threej000_sq(l1, l2, l3):
    """Exact (l1 l2 l3; 0 0 0)^2 Wigner-3j square as a Fraction
    (Racah closed form; zero unless the triangle holds and
    l1+l2+l3 is even).  Computed, not transcribed -- the window
    coupling coefficients below follow from this single formula."""
    from fractions import Fraction
    from math import factorial
    L = l1 + l2 + l3
    if L % 2 or abs(l1 - l2) > l3 or l3 > l1 + l2:
        return Fraction(0)
    g = L // 2
    num = (factorial(L - 2 * l1) * factorial(L - 2 * l2)
           * factorial(L - 2 * l3))
    pre = Fraction(num, factorial(L + 1))
    w = Fraction(factorial(g), factorial(g - l1) * factorial(g - l2)
                 * factorial(g - l3))
    return pre * w * w


def window_coupling(ells_out=(0, 2, 4), ells_in=(0, 2, 4),
                    ells_win=(0, 2, 4, 6, 8)):
    """The plane-parallel window mixing coefficients

        xi_hat_l(s) = sum_{l1, l2} C[l, l1, l2] xi_l1(s) Q_l2(s),
        C[l, l1, l2] = (2l+1) (l l1 l2; 0 0 0)^2

    (the projection of L_l1 L_l2 back onto L_l -- Wilson et al. 2017
    eq. 2.18-2.20 are exactly these numbers: C[0,2,2] = 1/5,
    C[2,2,2] = 2/7, C[4,2,2] = 18/35, ...).  Returns a float array
    (n_out, n_in, n_win)."""
    C = np.zeros((len(ells_out), len(ells_in), len(ells_win)))
    for a, l in enumerate(ells_out):
        for b, l1 in enumerate(ells_in):
            for c, l2 in enumerate(ells_win):
                C[a, b, c] = float((2 * l + 1) * threej000_sq(l, l1, l2))
    return C


def window_convolve_multipoles(ks, pk_ells, ss_win, q_ells,
                               ells_out=(0, 2, 4), ks_out=None):
    """Survey-window convolution of power-spectrum multipoles
    (plane-parallel / global line of sight):

        P_l(k) --FFTLog--> xi_l(s) --mix with Q_l2(s)--> xi_hat_l(s)
               --FFTLog--> P_hat_l(k)

    pk_ells: {l: (nk,)} on log-uniform ks; ss_win/q_ells: the window
    correlation multipoles Q_l(s) = RR_l(s)/RR_0(s->0)-style input
    ({l: (ns,)} on any s grid; interpolated onto the FFTLog s grid
    with flat left / zero right extrapolation -- Q_0 should be
    normalized to 1 at small s so an infinite survey is the identity).
    Wide-angle corrections are NOT included (plane-parallel only).
    Returns {l: (nk,)} on ks_out (default: the input ks).

    Validity: the inverse FFTLog's k^{-3/2} undressing amplifies FFT
    roundtrip noise toward the low-k edge of the reciprocal grid; with
    a realistic (decaying) P(k) sampled on a wide padded table the
    result is good to <~2e-4 for k in ~[0.005, 0.5] (oracle-tested),
    but the k -> 0 constant limit of a windowed spectrum is NOT
    recovered -- restrict use to the analysis range."""
    from ..ops.fftlog import fftlog_sphbessel_jl, fftlog_lnkr
    from .rsd import correlation_multipoles
    ks = np.asarray(ks)
    ks_out = ks if ks_out is None else np.asarray(ks_out)
    ells_in = tuple(sorted(pk_ells))
    ells_win = tuple(sorted(q_ells))
    ss, xi = correlation_multipoles(ks, pk_ells)
    lnss = jnp.log(jnp.asarray(ss))
    Q = {}
    for l2 in ells_win:
        q = jnp.asarray(q_ells[l2])
        Q[l2] = jnp.interp(lnss, jnp.log(jnp.asarray(ss_win)), q,
                           left=q[0], right=0.0)
    C = window_coupling(ells_out, ells_in, ells_win)
    lnkr0 = fftlog_lnkr(np.asarray(ss), mu=0.5)
    out = {}
    for a, l in enumerate(ells_out):
        xihat = 0.0
        for b, l1 in enumerate(ells_in):
            for c, l2 in enumerate(ells_win):
                if C[a, b, c] != 0.0:
                    xihat = xihat + C[a, b, c] * xi[l1] * Q[l2]
        kk, F = fftlog_sphbessel_jl(xihat, np.asarray(ss), l,
                                    lnkr=lnkr0)
        # P_l(k) = 4 pi (-i)^l int xi_l j_l(ks) s^2 ds, l even
        Pl = 4.0 * jnp.pi * (-1.0) ** (l // 2) * F
        out[l] = jnp.interp(jnp.log(jnp.asarray(ks_out)),
                            jnp.log(jnp.asarray(kk)), Pl)
    return out


def multipole_snr(mp, cov, ells=(0, 2, 4)):
    """Total detection SNR of the multipole datavector against a
    block-diagonal-in-k covariance: sqrt(sum_k P_l(k) C^-1_{ll'}(k)
    P_l'(k))."""
    P = jnp.stack([jnp.asarray(mp[ell]) for ell in ells])   # (nl, nk)
    C = jnp.moveaxis(jnp.asarray(cov), -1, 0)               # (nk, nl, nl)
    sol = jnp.linalg.solve(C, jnp.moveaxis(P, -1, 0)[..., None])[..., 0]
    return jnp.sqrt(jnp.sum(jnp.moveaxis(P, -1, 0) * sol))
