"""Extended background quantities: conformal time, recombination, BAO.

Covers the reference's remaining CAMB-delegated background API
(hmvec/cosmology.py:693-762 conformal time / tau_star / z_of_tau,
:334-343 BAO rs/DV) with engine-free closed forms:

  * conformal time eta(z) = int_z^inf dz'/H(z') via the substitution
    u = 1/(1+z') (finite domain, Gauss-Legendre);
  * z_star from the Hu & Sugiyama (1996) fitting formula;
  * r_s(drag) from the Eisenstein-Hu sound horizon already used by the
    transfer function.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.weights import gauss_legendre
from . import background as bgmod
from .transfer import _eh_scales

_GLN, _GLW = gauss_legendre(256)
CSPEED_KMS = 299792.458


def conformal_time(bg, z):
    """eta(z) = int_z^inf c dz'/H(z') in Mpc (conformal lookback to z=inf).

    Substitution u = 1/(1+z'): eta = c int_0^{a(z)} du / (u^2 H(1/u - 1)).
    """
    z = jnp.asarray(z)
    a = 1.0 / (1.0 + z)
    u = a[..., None] * jnp.asarray(_GLN)          # (..., n)
    zz = 1.0 / jnp.maximum(u, 1e-12) - 1.0
    integrand = 1.0 / (u**2 * bgmod.e_of_z(bg, zz))
    return (CSPEED_KMS / bg.H0) * a * (integrand @ jnp.asarray(_GLW))


def conformal_age(bg):
    """Conformal age of the universe (eta at z=0)."""
    return conformal_time(bg, 0.0)


def z_star_hu_sugiyama(bg):
    """Recombination redshift fit (Hu & Sugiyama 1996 Eq E-1)."""
    ombh2 = bg.ombh2
    omh2 = bg.omch2 + bg.ombh2
    g1 = 0.0783 * ombh2**-0.238 / (1.0 + 39.5 * ombh2**0.763)
    g2 = 0.560 / (1.0 + 21.1 * ombh2**1.81)
    return 1048.0 * (1.0 + 0.00124 * ombh2**-0.738) * (1.0 + g1 * omh2**g2)


def tau_star(bg):
    """Conformal time at recombination (reference get_tau_star,
    cosmology.py:693-700 -- CAMB's tau_maxvis analogue via z_star fit)."""
    return conformal_time(bg, z_star_hu_sugiyama(bg))


def z_of_tau(bg, tau, num_iter: int = 80, zmax: float = 5e3):
    """Invert eta(z) (reference cosmology.py:703-710)."""
    tau = jnp.asarray(tau)
    lo = jnp.zeros_like(tau)
    hi = jnp.full_like(tau, zmax)
    import jax

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        val = conformal_time(bg, mid)
        # eta decreasing in z
        go_right = val > tau
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_iter, body, (lo, hi))
    return (lo + hi) / 2.0


def rs_drag_eh(bg):
    """Sound horizon at the drag epoch from the EH98 fitting forms, in Mpc
    (the same sh_d the transfer function uses; sh_d is in Mpc/h)."""
    s = _eh_scales(bg)
    return s["sh_d"] / s["h"]


def get_bao_rs_dV(bg, zs):
    """r_s(drag)/D_V(z) (reference cosmology.py:334-343)."""
    zs = jnp.atleast_1d(jnp.asarray(zs))
    Hzs = bgmod.hubble_parameter(bg, zs) / CSPEED_KMS
    D_As = bgmod.angular_diameter_distance(bg, zs)
    D_Vs = ((1.0 + zs) ** 2 * D_As**2 * zs / Hzs) ** (1.0 / 3.0)
    return rs_drag_eh(bg) / D_Vs


def theta_star_approx(bg):
    """100 * theta_s: acoustic angular scale from the EH98 sound horizon and
    the engine-free background (approximate analogue of CAMB's
    cosmomc_theta; accurate to ~0.5% -- fitting-formula limited)."""
    from . import background as bgmod
    zstar = z_star_hu_sugiyama(bg)
    rs = rs_drag_eh(bg)  # drag-epoch approximation to r_s(z*)
    da = bgmod.angular_diameter_distance(bg, zstar)
    return 100.0 * rs / ((1.0 + zstar) * da)


def solve_h0_from_theta100(params: dict, theta100: float,
                           lo: float = 40.0, hi: float = 100.0,
                           num_iter: int = 60) -> float:
    """Find H0 reproducing the requested 100*theta_s (reference accepts
    'theta100' via CAMB's cosmomc_theta, cosmology.py:140-147)."""
    from . import background as bgmod

    def theta_of_h0(h0):
        p = dict(params)
        p["H0"] = float(h0)
        return float(theta_star_approx(bgmod.background(p)))

    import numpy as np
    lo_v, hi_v = lo, hi
    for _ in range(num_iter):
        mid = (lo_v + hi_v) / 2.0
        # theta increases with H0 (rs fixed by omegas; D_A shrinks)
        if theta_of_h0(mid) < theta100:
            lo_v = mid
        else:
            hi_v = mid
    return (lo_v + hi_v) / 2.0


def cmb_lensing_limber(cosmo, lmax, nonlinear=False, nz: int = 100,
                       kmax: float = 10.0):
    """C_L^kappakappa by Limber over chi to the last-scattering surface
    (reference cmb_lensing_limber, cosmology.py:812-862).

    The reference uses the Weyl-potential spectrum from CAMB; engine-free we
    use the matter power with the Poisson relation
    P_Weyl = [3/2 Omega_m H0^2 (1+z)]^2 P_m / k^4 (documented deviation:
    exact for flat matter+Lambda, sub-percent for massless-nu LCDM).
    """
    import jax
    bg = cosmo.bg
    chistar = conformal_age(bg) - tau_star(bg)
    chis = jnp.linspace(0.0, chistar, nz)
    dchis = (chis[2:] - chis[:-2]) / 2.0
    chis = chis[1:-1]
    zs = bgmod.redshift_at_comoving_radial_distance(bg, chis)

    ls = jnp.arange(2.0, lmax + 1.0)
    H0_invmpc = bg.H0 / CSPEED_KMS
    pref = (1.5 * bg.omm0 * H0_invmpc**2) ** 2
    win = ((chistar - chis) / (chis**2 * chistar)) ** 2

    if nonlinear:
        # honors the cosmo.halofit version ('mead' -> HMcode, else Takahashi)
        pk_of = lambda kq: cosmo._get_matter_power(zs, kq, nonlinear=True)
    else:
        pk_of = lambda kq: cosmo.engine.plin(
            bg, zs, kq, accuracy=cosmo.accuracy,
            growth_mode=getattr(cosmo, "growth_mode", "closed"))

    # evaluate P at the per-(l, chi) curve via a dense log table + lerp
    ktab = jnp.geomspace(1e-4, kmax, 2048)
    Ptab = pk_of(ktab)                          # (nz-2, nk)
    lktab = jnp.log(ktab)

    def one_l(ell):
        k = (ell + 0.5) / chis
        lke = jnp.log(k)
        ik = jnp.clip(jnp.searchsorted(lktab, lke) - 1, 0, ktab.size - 2)
        t = (lke - lktab[ik]) / (lktab[ik + 1] - lktab[ik])
        rows = jnp.arange(chis.size)
        pv = Ptab[rows, ik] * (1 - t) + Ptab[rows, ik + 1] * t
        w = jnp.where((k < 1e-4) | (k >= kmax), 0.0, 1.0)
        # Weyl-potential Poisson factor (1+z)^2 P_m / k^4
        pweyl = pref * (1.0 + zs) ** 2 * pv / k**4
        return jnp.sum(dchis * w * pweyl * win)

    cl = jax.vmap(one_l)(ls) * (ls * (ls + 1.0)) ** 2
    return ls, cl
