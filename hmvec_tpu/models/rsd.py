"""Redshift-space distortions and pairwise velocities (linear theory).

EXTENSION beyond the reference (simonsobs/hmvec exposes no redshift-space
statistics): the standard Kaiser anisotropic power spectrum with optional
Finger-of-God damping, its Legendre multipoles by fixed Gauss-Legendre
quadrature over mu (exact for the polynomial no-FoG integrand), the
configuration-space correlation multipoles xi_ell(s) by FFTLog
spherical-Bessel transforms, and the linear mean pairwise velocity
v12(r).  Everything is jit/grad-safe jnp with static node counts.

The growth rate f comes from this package's engine-free
``background.growth_rate_f`` (the reference needs CLASS for f,
hmvec/cosmology.py:345-350).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fftlog import (correlation_function, fftlog_sphbessel_jl,
                          fftlog_lnkr)


def kaiser_pk_mu(ks, mus, pk, b, f, sigma_v=0.0, fog="gaussian"):
    """Anisotropic galaxy power P_s(k, mu) = (b + f mu^2)^2 P(k) D_FoG.

    ks: (nk,); mus: (nmu,); pk: (..., nk); b, f, sigma_v scalars or
    (...)-shaped.
    D_FoG: 'gaussian' exp(-(k mu sigma_v)^2) or 'lorentzian'
    1/(1 + (k mu sigma_v)^2 / 2); sigma_v in Mpc (i.e. sigma_v = sigma_z/H).
    Returns (..., nmu, nk).
    """
    ks = jnp.asarray(ks)
    mus = jnp.asarray(mus)
    pk = jnp.asarray(pk)[..., None, :]
    b = jnp.asarray(b)[..., None, None]
    f = jnp.asarray(f)[..., None, None]
    sigma_v = jnp.asarray(sigma_v)[..., None, None]
    kmu = ks[None, :] * mus[:, None]
    kaiser = (b + f * mus[:, None] ** 2) ** 2
    x2 = (kmu * sigma_v) ** 2
    if fog == "gaussian":
        damp = jnp.exp(-x2)
    elif fog == "lorentzian":
        damp = 1.0 / (1.0 + x2 / 2.0)
    else:
        raise ValueError(fog)
    return kaiser * damp * pk


def _legendre(ell, x):
    if ell == 0:
        return jnp.ones_like(x)
    if ell == 2:
        return 0.5 * (3.0 * x**2 - 1.0)
    if ell == 4:
        return (35.0 * x**4 - 30.0 * x**2 + 3.0) / 8.0
    raise ValueError(ell)


def rsd_multipoles(ks, pk, b, f, sigma_v=0.0, ells=(0, 2, 4),
                   fog="gaussian", n_mu=32):
    """Legendre multipoles P_ell(k) = (2ell+1)/2 int_-1^1 P_s L_ell dmu.

    With sigma_v = 0 this reproduces the analytic Kaiser factors exactly
    (Gauss-Legendre is exact on the degree-8 polynomial integrand).
    Returns a dict {ell: (..., nk)}.
    """
    from ..utils.weights import leggauss_cached
    x_np, w_np = leggauss_cached(n_mu)
    mus = jnp.asarray(x_np)
    w = jnp.asarray(w_np)
    ps = kaiser_pk_mu(ks, mus, pk, b, f, sigma_v, fog)  # (..., nmu, nk)
    out = {}
    for ell in ells:
        wl = w * _legendre(ell, mus) * (2.0 * ell + 1.0) / 2.0
        out[ell] = jnp.einsum("m,...mk->...k", wl, ps)
    return out


def kaiser_multipole_factors(b, f):
    """The closed-form no-FoG Kaiser multipole prefactors
    (P_ell = factor_ell * P): ell = 0, 2, 4."""
    return {0: b**2 + 2.0 * b * f / 3.0 + f**2 / 5.0,
            2: 4.0 * b * f / 3.0 + 4.0 * f**2 / 7.0,
            4: 8.0 * f**2 / 35.0}


def correlation_multipoles(ks, pk_ells):
    """xi_ell(s) from power-spectrum multipoles by FFTLog:

        xi_ell(s) = (i^ell / 2 pi^2) int dk k^2 P_ell(k) j_ell(ks)

    pk_ells: dict {ell: (..., nk)} on the log-uniform ks (even ell only,
    so i^ell = (-1)^(ell/2) keeps everything real).  Returns
    (ss, {ell: xi_ell}) with every ell on ONE common reciprocal log grid
    (the ell = 0 low-ringing grid is forced on all ells -- the FFTLog
    phase offset is mu-dependent otherwise).
    """
    ks = np.asarray(ks)
    lnkr0 = fftlog_lnkr(ks, mu=0.5)
    out = {}
    ss = None
    for ell, pl in pk_ells.items():
        assert ell % 2 == 0, "even multipoles only"
        ss, F = fftlog_sphbessel_jl(jnp.asarray(pl), ks, ell, lnkr=lnkr0)
        out[ell] = (-1.0) ** (ell // 2) * F / (2.0 * jnp.pi**2)
    return ss, out


def sigma_v_lin(ks_tab, pk_tab):
    """Linear 1-D velocity dispersion in displacement units [Mpc]:

        sigma_v^2 = (1/6 pi^2) int dq P_lin(q)

    (v_rms = a H f sigma_v).  Trapezoid on the caller's log-spaced
    table -- the natural FoG scale for the Kaiser/Scoccimarro models.
    """
    ks_tab = jnp.asarray(ks_tab)
    pk_tab = jnp.asarray(pk_tab)
    val = jnp.trapezoid(pk_tab, ks_tab) / (6.0 * jnp.pi**2)
    return jnp.sqrt(val)


def _fog(kmu, sigma_v, fog):
    x2 = (kmu * sigma_v) ** 2
    if fog == "gaussian":
        return jnp.exp(-x2)
    if fog == "lorentzian":
        return 1.0 / (1.0 + x2 / 2.0)
    raise ValueError(fog)


def scoccimarro_pk_mu(ks, mus, p_dd, p_dt, p_tt, b, f, sigma_v=0.0,
                      fog="gaussian"):
    """Scoccimarro-2004 nonlinear redshift-space power (his eq. 71 with
    a phenomenological FoG factor):

        P_s(k, mu) = D_FoG(k mu sigma_v)
                     [b^2 P_dd + 2 b f mu^2 P_dt + f^2 mu^4 P_tt],

    with the one-loop density/velocity spectra from
    spt.pk_velocity_1loop (theta = -div v/(aHf), so P_dd = P_dt = P_tt
    recovers Kaiser exactly -- identity-tested).  ks (nk,), mus (nmu,),
    p_* (..., nk); returns (..., nmu, nk)."""
    ks = jnp.asarray(ks)
    mus = jnp.asarray(mus)
    p_dd = jnp.asarray(p_dd)[..., None, :]
    p_dt = jnp.asarray(p_dt)[..., None, :]
    p_tt = jnp.asarray(p_tt)[..., None, :]
    b = jnp.asarray(b)[..., None, None]
    f = jnp.asarray(f)[..., None, None]
    sigma_v = jnp.asarray(sigma_v)[..., None, None]
    mu = mus[:, None]
    kmu = ks[None, :] * mu
    core = (b**2 * p_dd + 2.0 * b * f * mu**2 * p_dt
            + f**2 * mu**4 * p_tt)
    return _fog(kmu, sigma_v, fog) * core


def scoccimarro_multipoles(ks, p_dd, p_dt, p_tt, b, f, sigma_v=0.0,
                           ells=(0, 2, 4), fog="gaussian", n_mu=32):
    """Legendre multipoles of scoccimarro_pk_mu (fixed Gauss-Legendre
    over mu, exact at sigma_v = 0).  Returns {ell: (..., nk)}."""
    from ..utils.weights import leggauss_cached
    x_np, w_np = leggauss_cached(n_mu)
    mus = jnp.asarray(x_np)
    w = jnp.asarray(w_np)
    ps = scoccimarro_pk_mu(ks, mus, p_dd, p_dt, p_tt, b, f, sigma_v, fog)
    out = {}
    for ell in ells:
        wl = w * _legendre(ell, mus) * (2.0 * ell + 1.0) / 2.0
        out[ell] = jnp.einsum("m,...mk->...k", wl, ps)
    return out


def mean_pairwise_velocity(ks, pk, f, aH, b=1.0):
    """Linear-theory mean pairwise (infall) velocity of tracers with
    linear bias b:

        v12(r) = -(2/3) f (aH) r  b xibar(r) / (1 + b^2 xi(r)),

    with xibar(r) = (3/r^3) int_0^r xi(s) s^2 ds evaluated spectrally:
    int_0^r j0(ks) s^2 ds = r^2 j1(kr)/k, so
    xibar(r) = (3 / (2 pi^2 r)) int dk k P(k) j1(kr).
    (pk is the MATTER power; the numerator carries one tracer bias from
    the density-velocity cross, the denominator the tracer pair weight
    b^2 xi -- the standard halo pairwise-velocity form, e.g. Sheth et
    al 2001 eq 17 linearized.)  b = 1 is the matter v12.

    aH: conformal H = a H(z) in km/s/Mpc -> v12 in km/s (r comoving Mpc).
    Returns (rs, v12) on the FFTLog reciprocal grid.  This is the
    kSZ-pairwise-velocity forecasting ingredient (e.g. Mueller et al
    2015-style); the reference has no configuration-space velocity
    statistics.
    """
    ks = np.asarray(ks)
    pk = jnp.asarray(pk)
    rs, xi = correlation_function(ks, pk)
    # xibar: j1 transform of P/k -> (1/2pi^2) int k^2 (P/(k r)) j1 ... fold
    # the 1/r outside:   int f(k) j1(kr) k^2 dk with f = P/k.
    # Share the j0 low-ringing grid so xi and xibar land on the same rs.
    _, F1 = fftlog_sphbessel_jl(pk / jnp.asarray(ks), ks, 1,
                                lnkr=fftlog_lnkr(ks, mu=0.5))
    xibar = 3.0 * F1 / (2.0 * jnp.pi**2) / jnp.asarray(np.asarray(rs))
    v12 = -(2.0 / 3.0) * f * aH * jnp.asarray(np.asarray(rs)) * b * xibar \
        / (1.0 + b**2 * xi)
    return rs, v12
