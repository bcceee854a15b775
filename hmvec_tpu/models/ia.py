"""Intrinsic alignments (NLA) and lens magnification for Limber spectra.

EXTENSION beyond the reference: hmvec's Limber layer projects pure
density/lensing windows only (reference hmvec/cosmology.py:536-597), but a
measured cosmic-shear or galaxy-galaxy-lensing data vector also contains
the intrinsic-alignment terms (GI/II; Hirata & Seljak 2004) and the lens
magnification-bias terms.  This module provides both in the repo's Limber
window convention, so the systematics compose with every existing
C_kk/C_kg/C_gg output (and, through models/shear.py, with the real-space
xi_+/xi_-/gamma_t/w(theta) statistics).

Model: the nonlinear-linear-alignment (NLA) model of Bridle & King 2007 —
the intrinsic shape field traces the (nonlinear) density field with a
growth-suppressed amplitude

    delta_I(z) = F(z) delta,
    F(z) = -A_IA * (C1 rho_cr0) * Omega_m / D(z) * ((1+z)/(1+z0))^eta_IA,

with the standard normalization C1 rho_cr0 = 0.0134 (Bridle & King 2007;
the value used by the DES / KiDS pipelines), D(z) the linear growth factor
normalized to D(0) = 1, and an optional redshift power law (eta_IA, z0)
as in the DES Y1/Y3 parameterization.  "NLA" means P_mm here is the
*nonlinear* matter power (pass the halo-model or halofit grid).

Window convention (matches models/limber.py's ``limber_integral``, which
computes ``int dz H(z) W1 W2 P(z, (l+1/2)/chi) / chi^2``):

- density-type legs are dimensionless: a normalized n(z) for galaxy
  density, and F(z) * n(z) for intrinsic alignments;
- lensing-type legs carry the repo's ``lensing_window`` form, which
  already includes a 1/H(z) so that lensing x density and lensing x
  lensing integrands both come out in the standard form.

The magnification leg is ``(5 s_mag - 2) x lensing_window`` built with the
*lens* sample's dndz as the "source" distribution — number-count
magnification of a flux-limited sample with faint-end slope
s = dlog10 N(<m)/dm.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.quadrature import trapz_traced
from . import background as bgmod
from . import limber as limb

# C1 * rho_critical(z=0) in the standard NLA normalization
# (Bridle & King 2007, from the SuperCOSMOS measurement of Brown et al.).
C1_RHOCRIT = 0.0134


def nla_amplitude(bg, zs, A_ia=1.0, eta_ia=0.0, z0=0.62,
                  growth_mode="closed", growth_table=None):
    """F(z) = -A_IA (C1 rho_cr0) Om / D(z) * ((1+z)/(1+z0))^eta_IA.

    D(z) is normalized to D(0) = 1.  ``growth_mode="ode"`` (with an
    optional precomputed ``growth_table``) selects the true w0/wa growth,
    exactly as elsewhere in the package.
    """
    zs = jnp.asarray(zs)
    D = bgmod.d_growth(bg, 1.0 / (1.0 + zs), norm="z0norm",
                       mode=growth_mode, table=growth_table)
    return (-A_ia * C1_RHOCRIT * bg.omm0 / D
            * ((1.0 + zs) / (1.0 + z0)) ** eta_ia)


def _normed(dndz, gzs):
    dndz = jnp.asarray(dndz)
    return dndz / trapz_traced(dndz, gzs)


def ia_window(bg, gzs, dndz, A_ia=1.0, eta_ia=0.0, z0=0.62, **growth_kw):
    """Density-type IA leg on the evaluation grid: F(z) * normalized n(z)."""
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    return nla_amplitude(bg, gzs, A_ia, eta_ia, z0, **growth_kw) * _normed(dndz, gzs)


def magnification_window(bg, ezs, gzs, gdndz, s_mag):
    """Lensing-type magnification leg: (5 s_mag - 2) W_lens[lens dndz](z).

    s_mag is the faint-end number-count slope of the lens sample; at
    s_mag = 0.4 the magnification term vanishes identically.
    """
    return (5.0 * s_mag - 2.0) * limb.lensing_window(bg, ezs, gzs, gdndz)


# ---------------------------------------------------------------------------
# Intrinsic-alignment spectra
# ---------------------------------------------------------------------------

def C_II(bg, ells, zs, ks, Pmm, gzs, dndz1, dndz2=None,
         A_ia=1.0, eta_ia=0.0, z0=0.62, **growth_kw):
    """Intrinsic-intrinsic alignment spectrum of two source samples.

    Both samples share (A_ia, eta_ia, z0); pass dndz2=None for an auto
    spectrum.  Scales as A_ia^2.
    """
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    W1 = ia_window(bg, gzs, dndz1, A_ia, eta_ia, z0, **growth_kw)
    W2 = W1 if dndz2 is None else ia_window(bg, gzs, dndz2, A_ia, eta_ia,
                                            z0, **growth_kw)
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    return limb.limber_integral(ells, zs, ks, Pmm, gzs, W1, W2, hzs, chis)


def C_kI(bg, ells, zs, ks, Pmm, gzs, sdndz, A_ia=1.0, eta_ia=0.0, z0=0.62,
         lzs=None, ldndz=None, lwindow=None, **growth_kw):
    """GI term: lensing convergence x intrinsic alignment (one ordering).

    The lensing leg is the kernel of the *other* sample (delta-source at
    lzs, a dndz, or a precomputed lwindow); the IA leg belongs to the
    sample whose shapes are measured (sdndz).  Negative for A_ia > 0.
    """
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    WL = (limb.lensing_window(bg, gzs, lzs, ldndz)
          if lwindow is None else lwindow)
    WI = ia_window(bg, gzs, sdndz, A_ia, eta_ia, z0, **growth_kw)
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    return limb.limber_integral(ells, zs, ks, Pmm, gzs, WL, WI, hzs, chis)


def C_gI(bg, ells, zs, ks, Pgm, gzs, gdndz, sdndz,
         A_ia=1.0, eta_ia=0.0, z0=0.62, **growth_kw):
    """Lens density x source intrinsic alignment (gamma_t contamination).

    Needs the galaxy-matter spectrum Pgm (the IA field traces matter);
    only the physical overlap of lens and source dndz contributes.
    """
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    Wg = _normed(gdndz, gzs)
    WI = ia_window(bg, gzs, sdndz, A_ia, eta_ia, z0, **growth_kw)
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    return limb.limber_integral(ells, zs, ks, Pgm, gzs, Wg, WI, hzs, chis)


def shear_cls_with_ia(bg, ells, zs, ks, Pmm, gzs, sdndz1, sdndz2=None,
                      A_ia=1.0, eta_ia=0.0, z0=0.62, **growth_kw):
    """Observed cosmic-shear spectrum of bins (1, 2) with NLA alignments.

    Returns a dict with the 'GG', 'GI' (both orderings summed), 'II' and
    'total' E-mode convergence-normalized spectra:

        C^obs = C^GG + C^{G1 I2} + C^{G2 I1} + C^{I1 I2}.

    For an auto bin (sdndz2=None) the GI term carries the usual factor 2.
    """
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    WL1 = limb.lensing_window(bg, gzs, gzs, jnp.asarray(sdndz1))
    WI1 = ia_window(bg, gzs, sdndz1, A_ia, eta_ia, z0, **growth_kw)
    if sdndz2 is None:
        WL2, WI2 = WL1, WI1
    else:
        WL2 = limb.lensing_window(bg, gzs, gzs, jnp.asarray(sdndz2))
        WI2 = ia_window(bg, gzs, sdndz2, A_ia, eta_ia, z0, **growth_kw)

    def proj(Wa, Wb):
        return limb.limber_integral(ells, zs, ks, Pmm, gzs, Wa, Wb, hzs, chis)

    gg = proj(WL1, WL2)
    gi = proj(WL1, WI2) + proj(WL2, WI1)
    ii = proj(WI1, WI2)
    return {"GG": gg, "GI": gi, "II": ii, "total": gg + gi + ii}


# ---------------------------------------------------------------------------
# Magnification-bias spectra
# ---------------------------------------------------------------------------

def C_gg_mag(bg, ells, zs, ks, Pgg, Pgm, Pmm, gzs, gdndz, s_mag,
             gdndz2=None, s_mag2=None):
    """Galaxy clustering with lens magnification:

        C^obs_gg = C^gg + C^{g mu} + C^{mu g} + C^{mu mu},

    with mu the magnification field of each sample ((5s-2) x lensing
    kernel of its own dndz).  Returns a dict {'gg','gmu','mumu','total'}.
    Pgm is used for the cross terms and Pmm for mu-mu.
    """
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    Wg1 = _normed(gdndz, gzs)
    Wm1 = magnification_window(bg, gzs, gzs, jnp.asarray(gdndz), s_mag)
    if gdndz2 is None:
        Wg2, Wm2 = Wg1, Wm1
    else:
        s2 = s_mag if s_mag2 is None else s_mag2
        Wg2 = _normed(gdndz2, gzs)
        Wm2 = magnification_window(bg, gzs, gzs, jnp.asarray(gdndz2), s2)

    def proj(P, Wa, Wb):
        return limb.limber_integral(ells, zs, ks, P, gzs, Wa, Wb, hzs, chis)

    gg = proj(Pgg, Wg1, Wg2)
    gmu = proj(Pgm, Wg1, Wm2) + proj(Pgm, Wg2, Wm1)
    mumu = proj(Pmm, Wm1, Wm2)
    return {"gg": gg, "gmu": gmu, "mumu": mumu, "total": gg + gmu + mumu}


def C_kg_mag(bg, ells, zs, ks, Pgm, Pmm, gzs, gdndz, s_mag,
             lzs=None, ldndz=None, lwindow=None):
    """Lensing x galaxy cross with the lens-magnification term:

        C^obs_kg = C^{kappa g} + C^{kappa mu}.

    Returns {'kg', 'kmu', 'total'}; the magnification term uses Pmm.
    """
    gzs = jnp.atleast_1d(jnp.asarray(gzs))
    chis = bgmod.comoving_radial_distance(bg, gzs)
    hzs = bgmod.h_of_z(bg, gzs)
    WL = (limb.lensing_window(bg, gzs, lzs, ldndz)
          if lwindow is None else lwindow)
    Wg = _normed(gdndz, gzs)
    Wm = magnification_window(bg, gzs, gzs, jnp.asarray(gdndz), s_mag)
    kg = limb.limber_integral(ells, zs, ks, Pgm, gzs, WL, Wg, hzs, chis)
    kmu = limb.limber_integral(ells, zs, ks, Pmm, gzs, WL, Wm, hzs, chis)
    return {"kg": kg, "kmu": kmu, "total": kg + kmu}
