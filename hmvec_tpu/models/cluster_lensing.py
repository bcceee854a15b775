"""Cluster weak-lensing profiles: Sigma(R), kappa_1h, kappa_2h.

The reference delegates Sigma_NFW to the external `clusterlensing` package
(hmvec/hmvec.py:574-591); here the Wright & Brainerd (2000) closed form is
implemented natively (dropping the dependency), and the 2-halo kappa
(hmvec.py:598-622) replaces the per-theta/per-z python loops with one
vmapped J0 Hankel reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.special import j0
from ..ops.quadrature import trapz_traced
from .profiles import fcon


def sigma_nfw(R, rs, rhoscale):
    """NFW projected surface mass density Sigma(R) (Wright & Brainerd 2000).

    R: projected radius (Mpc), rs: scale radius, rhoscale: NFW density
    amplitude (Msun/Mpc^3).  Branchless in x = R/rs.
    """
    x = jnp.asarray(R) / rs
    eps = 1e-9
    x = jnp.where(jnp.abs(x - 1.0) < eps, 1.0 + eps, x)
    lo = x < 1.0
    s = jnp.where(lo, jnp.sqrt(jnp.abs(1.0 - x**2)), jnp.sqrt(jnp.abs(x**2 - 1.0)))
    F = jnp.where(lo, jnp.arctanh(jnp.minimum(s, 1.0 - 1e-15)) / s,
                  jnp.arctan(s) / s)
    f = (1.0 - F) / (x**2 - 1.0)
    return 2.0 * rs * rhoscale * f


def _gauss_legendre(n):
    import numpy as np
    from ..utils.weights import leggauss_cached
    x, w = leggauss_cached(n)
    return jnp.asarray(x), jnp.asarray(w)


def sigma_nfw_miscentered(R, rs, rhoscale, sig_off, n_off: int = 64,
                          n_ang: int = 128, off_max_sigmas: float = 5.0):
    """Miscentered NFW Sigma(R): Rayleigh-distributed centering offsets
    (clusterlensing SurfaceMassDensity(offsets=...) semantics, following
    Johnston et al 2007 / George et al 2012):

        Sigma_off(R) = int dRoff P(Roff) <Sigma(|R - Roff|)>_angle,
        P(Roff) = Roff/sig^2 exp(-Roff^2 / 2 sig^2).

    Both integrals are fixed Gauss-Legendre quadratures (jit/grad-safe);
    the C^1 kink of Sigma_NFW at R=rs limits convergence to ~3e-4 relative
    at the defaults (validated against adaptive scipy quadrature in
    tests/test_cluster_lensing_ext.py) -- far below any observational
    relevance of the miscentering nuisance.
    R: (..., ntheta); rs, rhoscale: broadcastable; sig_off: (...,) offset
    scale in the same length units as R.
    """
    xo, wo = _gauss_legendre(n_off)
    xa, wa = _gauss_legendre(n_ang)
    sig = jnp.asarray(sig_off)[..., None]
    # R_off nodes on (0, off_max_sigmas * sig]
    roff = (xo + 1.0) / 2.0 * off_max_sigmas * sig[..., None]   # (...,1,no)
    wroff = wo * off_max_sigmas * sig[..., None] / 2.0
    prayl = roff / sig[..., None] ** 2 * jnp.exp(
        -(roff**2) / (2.0 * sig[..., None] ** 2))
    # angle nodes on [0, pi], mean = (1/pi) int
    ang = (xa + 1.0) / 2.0 * jnp.pi                              # (na,)
    wang = wa / 2.0                                              # sums to 1
    Rb = jnp.asarray(R)[..., None, None]                         # (...,nt,1,1)
    ro = roff[..., None]                                         # (...,1,no,1)
    arg = jnp.sqrt(jnp.maximum(
        Rb**2 + ro**2 - 2.0 * Rb * ro * jnp.cos(ang), 1e-30))
    sig_c = sigma_nfw(arg, rs[..., None, None], rhoscale[..., None, None])
    sig_ang = (sig_c * wang).sum(-1)                             # (...,nt,no)
    return (sig_ang * prayl * wroff).sum(-1)


def sigma_1h_profiles(bg, zs, thetas, Ms, concs, sig_theta=None, delta=200,
                      rho="mean", rho_at_z=True, n_off: int = 64,
                      n_ang: int = 128):
    """1-halo Sigma(theta) per z (reference hmvec.py:574-591 semantics,
    without the clusterlensing dependency).  ``sig_theta`` is the Gaussian
    miscentering scale in radians; the reference converts it to a physical
    offset via the angular-diameter distance (hmvec.py:581) and hands it to
    clusterlensing -- reproduced here natively.

    Returns (nz, ntheta)."""
    from . import background as bgmod
    from .mass_function import R_from_M
    zs = jnp.asarray(zs)
    Ms = jnp.asarray(Ms)
    concs = jnp.asarray(concs)
    chis = bgmod.angular_diameter_distance(bg, zs)
    rbins = chis[:, None] * jnp.asarray(thetas)[None, :]
    rhofunc = (bgmod.rho_critical_z if rho == "critical"
               else bgmod.rho_matter_z)
    rhoz = zs if rho_at_z else zs * 0.0
    Rdeltas = R_from_M(Ms, rhofunc(bg, rhoz), delta=delta)
    rs = Rdeltas / concs
    rhocrits = bgmod.rho_critical_z(bg, zs)
    delta_c = Ms / 4.0 / jnp.pi / rs**3 / rhocrits / fcon(concs)
    if sig_theta is None:
        return sigma_nfw(rbins, rs[:, None], delta_c[:, None])
    offsets = chis * sig_theta                                 # (nz,)
    return sigma_nfw_miscentered(rbins, rs[:, None], delta_c[:, None],
                                 offsets, n_off=n_off, n_ang=n_ang)


def kappa_1h_profiles(bg, zs, thetas, Ms, concs, zsource, **kw):
    """kappa_1h = Sigma / Sigma_crit (reference hmvec.py:593-596)."""
    from . import background as bgmod
    sigma = sigma_1h_profiles(bg, zs, thetas, Ms, concs, **kw)
    sigmac = bgmod.sigma_crit(bg, zs, zsource)
    return sigma / sigmac[:, None]


def kappa_2h_profiles(bg, zs, ks, Pzk, bh_of_m, thetas, zsource,
                      lmin=100, lmax=10000):
    """2-halo kappa(theta) via a J0 Hankel sum over ell = k chi
    (reference hmvec.py:598-622, vectorized over theta and z).

    bh_of_m: (nz,) halo bias interpolated at the cluster masses.
    Returns (ntheta,) summed as the reference does (trapz over ell per
    theta, already z-resolved inside the integrand)."""
    from . import background as bgmod
    zs = jnp.asarray(zs)
    sigmac = bgmod.sigma_crit(bg, zs, zsource)
    rhomz = bgmod.rho_matter_z(bg, zs)
    chis = bgmod.comoving_radial_distance(bg, zs)
    DAz = bgmod.angular_diameter_distance(bg, zs)
    ells = jnp.asarray(ks)[None, :] * chis[:, None]      # (nz, nk)
    mask = (ells > lmin) & (ells < lmax)

    def one_theta(theta):
        integrand = (rhomz[:, None] * bh_of_m[:, None] * Pzk
                     / (1.0 + zs[:, None]) ** 3 / sigmac[:, None]
                     / DAz[:, None] ** 2 * j0(ells * theta) * ells
                     / (2.0 * jnp.pi))
        integrand = jnp.where(mask, integrand, 0.0)
        # trapz over the masked ell range per z, then the reference sums
        # implicitly by returning per-z; keep (nz,) resolution
        return jax.vmap(lambda ig, el: trapz_traced(ig, el))(integrand, ells)

    return jax.vmap(one_theta)(jnp.asarray(thetas))      # (ntheta, nz)
