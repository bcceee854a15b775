"""Exact (non-Limber) angular power spectra for linear-theory tracers.

EXTENSION beyond the reference, which only ships the Limber projection
(`/root/reference/hmvec/cosmology.py:867-904`).  Limber errs at the
1-10% level for ell <~ 60 and for narrow windows; the exact linear
expression with separable growth is

    C_l^{XY} = (2/pi) int dk k^2 P_lin(k, 0) Delta_l^X(k) Delta_l^Y(k)

    Delta_l(k)       = int dchi  W(chi) D(chi) j_l(k chi)         (density)
    Delta_l^RSD(k)   = -int dchi W(chi) f(chi) D(chi) j_l''(k chi)
    Delta_l^kappa(k) = [l(l+1)/k^2] int dchi phi_kappa(chi) j_l(k chi)
      with phi_kappa = (3/2) Om_m H0^2 (1+z) D(chi) q(chi)/chi,
      q = (chi_s - chi)/chi_s  (or its dndz-weighted average)

where W(chi) dchi = b n(z) dz for number counts.

TPU mapping (the FFTLog / 2-FAST-style method): W D / chi^2 is sampled
on a static log-uniform chi grid, and the multi-ell spherical-Bessel
projection is ONE shared rfft + an (nl, nm) complex multiply against
host-precomputed Gamma-ratio kernels + one batched irfft
(ops/fftlog.fftlog_sphbessel_multi) -- no per-(l, k) quadrature and no
per-l loop on device.  j_l'' is assembled from the {l-2, l, l+2}
transforms on the SAME output k grid (shared low-ringing offset) with
static recurrence coefficients, so RSD costs one extra batched row set,
not a new algorithm.  The final k integral is a trapezoid in ln k.
Everything is jit- and grad-safe (static chi grid and ells).

Accuracy: the lensing kernel behaves as chi^{-1} at small chi, so the
FFTLog input is edge-tapered (cosine in ln chi) -- the dropped region
contributes O((k chi_min)^l), negligible for l >= 2.  Pinned against an
independent explicit numpy/scipy twin (twin/nonlimber.py) and against
the repo's own Limber pipeline at high ell in tests/test_nonlimber.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.fftlog import fftlog_sphbessel_multi, fftlog_lnkr
from ..ops.quadrature import trapz_traced
from . import background as bgmod

__all__ = [
    "chi_loggrid", "bessel_deltas", "bessel_deltas_j2pp",
    "bessel_deltas_over_x2", "galaxy_kernel", "lensing_kernel",
    "cl_from_deltas",
    "C_gg_exact", "C_kg_exact", "C_kk_exact",
    "C_gg_hybrid", "C_kk_hybrid",
]


def chi_loggrid(chi_min: float = 0.5, chi_max: float = 15000.0,
                n: int = 2048) -> np.ndarray:
    """Static (host) log-uniform comoving-distance grid [Mpc].

    The defaults cover z ~ 0 -> 20 for any reasonable background; the
    reciprocal FFTLog k grid then spans ~[7e-5, 2] 1/Mpc, enough for
    ell up to a few hundred at any window distance.
    """
    return np.geomspace(chi_min, chi_max, n)


def _edge_taper(n: int, frac: float) -> np.ndarray:
    """Cosine taper -> 0 at both ends over a ``frac`` fraction of the
    log grid (host, static).  Suppresses FFTLog wrap-around ringing from
    kernels that do not decay at the grid edges (lensing ~ 1/chi)."""
    m = max(int(round(frac * n)), 1)
    ramp = 0.5 * (1.0 - np.cos(np.pi * np.arange(m) / m))
    t = np.ones(n)
    t[:m] *= ramp
    t[n - m:] *= ramp[::-1]
    return t


def bessel_deltas(phi, chis, ells, taper_frac: float = 0.03):
    """Delta_l(k) = int dchi phi(chi) j_l(k chi) for all l in ``ells``.

    phi: (..., n) sampled on the log-uniform grid chis (n,).
    Returns (ks (n,), Delta (..., nl, n)) on the reciprocal FFTLog grid.
    """
    chis = np.asarray(chis, dtype=np.float64)
    taper = jnp.asarray(_edge_taper(chis.size, taper_frac) / chis**2)
    lnkr = fftlog_lnkr(chis, mu=0.5)
    return fftlog_sphbessel_multi(phi * taper, chis, tuple(int(l) for l in ells),
                                  lnkr=lnkr)


def _jpp_coeffs(l: int):
    """j_l'' = c_m j_{l-2} - c_0 j_l + c_p j_{l+2} (exact recurrence)."""
    cm = l * (l - 1.0) / ((2.0 * l + 1.0) * (2.0 * l - 1.0))
    c0 = (l**2 / ((2.0 * l + 1.0) * (2.0 * l - 1.0))
          + (l + 1.0) ** 2 / ((2.0 * l + 1.0) * (2.0 * l + 3.0)))
    cp = (l + 1.0) * (l + 2.0) / ((2.0 * l + 1.0) * (2.0 * l + 3.0))
    return cm, c0, cp


def bessel_deltas_j2pp(phi, chis, ells, taper_frac: float = 0.03):
    """Delta_l^{(2)}(k) = -int dchi phi(chi) j_l''(k chi): the RSD row.

    Applies j_l'' = [l(l-1)/((2l+1)(2l-1))] j_{l-2}
                    - [l^2/((2l+1)(2l-1)) + (l+1)^2/((2l+1)(2l+3))] j_l
                    + [(l+1)(l+2)/((2l+1)(2l+3))] j_{l+2}
    to the {l-2, l, l+2} multi-ell transforms, which share ONE output
    k grid by construction (shared low-ringing offset), so the
    combination is a static 3-term linear map over the l axis.
    """
    ells = [int(l) for l in ells]
    union = sorted({ln for l in ells for ln in (max(l - 2, 0), l, l + 2)})
    ks, F = bessel_deltas(phi, chis, union, taper_frac)
    idx = {l: i for i, l in enumerate(union)}
    rows = []
    for l in ells:
        cm, c0, cp = _jpp_coeffs(l)
        # l < 2 never occurs for observable multipoles (l >= 2), but keep
        # the l-2 leg well-defined: for l in {0, 1} the cm coefficient is 0.
        rows.append(-(cm * F[..., idx[max(l - 2, 0)], :]
                      - c0 * F[..., idx[l], :]
                      + cp * F[..., idx[l + 2], :]))
    return ks, jnp.stack(rows, axis=-2)


def bessel_deltas_over_x2(phi_t, chis, ells, taper_frac: float = 0.03):
    """int dchi phi_t(chi) j_l(k chi)/(k chi)^2: the lensing row.

    Naively multiplying the plain transform by 1/k^2 amplifies the
    FFTLog noise floor by up to 1e8 at the low-k end (measured: it
    destroys C_kappa for l <~ 10).  Instead the recurrence
        j_l(x)/x^2 = [(j_{l-2} + j_l)/(2l-1)
                      + (j_l + j_{l+2})/(2l+3)] / (2l+1)
    turns the 1/x^2 weight into a 3-term combination of PLAIN transforms
    of phi_t -- and the caller passes phi_t = phi_kappa * chi^2, which is
    bounded at chi -> 0 (phi_kappa ~ 1/chi), so the FFTLog input has no
    edge spike either.  Exact identity, no approximation.

    Requires l >= 2: the recurrence consumes j_{l-2}, so l in {0, 1}
    would need j_{-1}/j_{-2} legs this three-term form does not carry
    (substituting j_0 there is silently wrong by orders of magnitude,
    measured ~200x at l = 1).  Lensing observables only have l >= 2
    anyway; a ValueError keeps the failure loud.
    """
    ells = [int(l) for l in ells]
    if min(ells) < 2:
        raise ValueError(
            f"bessel_deltas_over_x2 requires all ells >= 2 (got min "
            f"{min(ells)}): the j_l/x^2 recurrence needs the j_(l-2) leg")
    union = sorted({ln for l in ells for ln in (max(l - 2, 0), l, l + 2)})
    ks, F = bessel_deltas(phi_t, chis, union, taper_frac)
    idx = {l: i for i, l in enumerate(union)}
    rows = []
    for l in ells:
        fm = F[..., idx[max(l - 2, 0)], :]
        f0 = F[..., idx[l], :]
        fp = F[..., idx[l + 2], :]
        rows.append(((fm + f0) / (2.0 * l - 1.0)
                     + (f0 + fp) / (2.0 * l + 3.0)) / (2.0 * l + 1.0))
    return ks, jnp.stack(rows, axis=-2)


def _growth_ratio(bg, zg, growth_mode: str, table=None):
    """D(z)/D(0) (norm-independent ratio)."""
    if growth_mode == "ode" and table is None:
        table = bgmod.growth_table(bg)
    d = bgmod.growth_unnormalized(bg, 1.0 / (1.0 + zg), mode=growth_mode,
                                  table=table)
    d0 = bgmod.growth_unnormalized(bg, jnp.asarray(1.0), mode=growth_mode,
                                   table=table)
    return d / d0


def galaxy_kernel(bg, chis, gzs, gdndz, bias=1.0, growth_mode: str = "closed",
                  table=None, with_growth_rate: bool = False):
    """phi_g(chi) = b n(z(chi)) H(z) D(z)/D(0) on the static chi grid.

    ``with_growth_rate=True`` additionally multiplies by f(z) = dlnD/dlna
    (the RSD kernel weight; bias is NOT applied to that variant by the
    callers).  n(z) is normalized to unit integral over gzs, matching the
    Limber convention (models/limber.py:_galaxy_windows).
    """
    chis_j = jnp.asarray(chis)
    zg = bgmod.redshift_at_comoving_radial_distance(bg, chis_j)
    gzs = jnp.asarray(gzs)
    dndz = jnp.asarray(gdndz)
    nz = jnp.interp(zg, gzs, dndz / trapz_traced(dndz, gzs),
                    left=0.0, right=0.0)
    H = bgmod.h_of_z(bg, zg)
    D = _growth_ratio(bg, zg, growth_mode, table)
    out = nz * H * D
    if with_growth_rate:
        f = bgmod.growth_rate_f(bg, zg, mode=growth_mode, table=table)
        return out * f
    return bias * out


def lensing_kernel(bg, chis, zs=None, dndz=None, growth_mode: str = "closed",
                   table=None):
    """phi_kappa(chi) = 1.5 Om_m H0^2 (1+z) D(chi) q(chi)/chi.

    q(chi) = (chi_s - chi)/chi_s for a delta-function source plane
    (zs scalar) or the dndz-weighted average (zs array + dndz), the same
    source conventions as models/limber.lensing_window.  The exact
    convergence transfer is then
        Delta_l^kappa(k) = l(l+1)/k^2 int dchi phi_kappa j_l(k chi);
    the l(l+1)/k^2 factor is diagonal in k and applied by the C_l
    assemblers, NOT here.
    """
    chis_j = jnp.asarray(chis)
    zg = bgmod.redshift_at_comoving_radial_distance(bg, chis_j)
    zs = jnp.atleast_1d(jnp.asarray(zs))
    chistar = bgmod.comoving_radial_distance(bg, zs)
    if zs.size == 1:
        q = jnp.where(zg <= zs[0], (chistar[0] - chis_j) / chistar[0], 0.0)
    else:
        dndz = jnp.asarray(dndz)
        nzn = dndz / trapz_traced(dndz, zs)
        integ = ((chistar[None, :] - chis_j[:, None]) / chistar[None, :]
                 * nzn[None, :])
        integ = jnp.where(zs[None, :] < zg[:, None], 0.0, integ)
        q = trapz_traced(integ, zs, axis=-1)
    H0 = bgmod.h_of_z(bg, 0.0)
    D = _growth_ratio(bg, zg, growth_mode, table)
    return 1.5 * bg.omm0 * H0**2 * (1.0 + zg) * D * q / chis_j


def _lnp_on_grid(ks_grid, ks_pk, pk0):
    """ln P interpolated in ln k with edge-slope (power-law) extrapolation."""
    lnks = jnp.log(jnp.asarray(ks_pk))
    lnp = jnp.log(jnp.asarray(pk0))
    lnk = jnp.log(jnp.asarray(ks_grid))
    i = jnp.clip(jnp.searchsorted(lnks, lnk) - 1, 0, lnks.size - 2)
    t = (lnk - lnks[i]) / (lnks[i + 1] - lnks[i])   # unclipped -> extrapolates
    return lnp[i] + t * (lnp[i + 1] - lnp[i])


def cl_from_deltas(ks_grid, d1, d2, ks_pk, pk0):
    """C_l = (2/pi) int dln k k^3 P(k, 0) Delta1_l(k) Delta2_l(k).

    ks_grid (nk,) log-uniform (the FFTLog output grid); d1, d2
    (..., nl, nk).  The trapezoid in ln k is exact to the grid's
    spectral resolution (dln k ~ 0.005 at the defaults).
    """
    ks_grid = jnp.asarray(ks_grid)
    P = jnp.exp(_lnp_on_grid(ks_grid, ks_pk, pk0))
    integ = ks_grid**3 * P * d1 * d2
    return (2.0 / jnp.pi) * trapz_traced(integ, jnp.log(ks_grid), axis=-1)


def _kappa_deltas(bg, chis, ells_t, zs, dndz, growth_mode, table):
    """Delta_l^kappa(k) = l(l+1) int dchi [phi_kappa chi^2] j_l/(k chi)^2."""
    phik = lensing_kernel(bg, chis, zs=zs, dndz=dndz,
                          growth_mode=growth_mode, table=table)
    ks, d = bessel_deltas_over_x2(phik * jnp.asarray(chis) ** 2, chis, ells_t)
    llp1 = jnp.asarray([l * (l + 1.0) for l in ells_t])
    return ks, llp1[:, None] * d


def C_gg_exact(bg, ells, ks, pk0, gzs, gdndz, bias=1.0, rsd: bool = False,
               smag=None, szs=None, growth_mode: str = "closed",
               chis=None, table=None):
    """Exact linear galaxy auto-spectrum (Limber analogue: limber.C_gg).

    pk0: linear P(k, z=0) on ks.  ``rsd=True`` adds the redshift-space
    (Kaiser) term via -j_l''; ``smag`` (slope of the cumulative number
    counts) adds the magnification-bias term (5 smag - 2) Delta^kappa
    with the galaxy's own dndz as sources (szs overrides the source
    z grid, defaulting to gzs).
    """
    if chis is None:
        chis = chi_loggrid()
    if growth_mode == "ode" and table is None:
        table = bgmod.growth_table(bg)
    phi = galaxy_kernel(bg, chis, gzs, gdndz, bias, growth_mode, table)
    ells_t = tuple(int(l) for l in np.asarray(ells))
    ksg, d = bessel_deltas(phi, chis, ells_t)
    if rsd:
        phif = galaxy_kernel(bg, chis, gzs, gdndz, 1.0, growth_mode, table,
                             with_growth_rate=True)
        _, drsd = bessel_deltas_j2pp(phif, chis, ells_t)
        d = d + drsd
    if smag is not None:
        _, dk = _kappa_deltas(bg, chis, ells_t,
                              gzs if szs is None else szs, gdndz,
                              growth_mode, table)
        d = d + (5.0 * smag - 2.0) * dk
    return cl_from_deltas(ksg, d, d, ks, pk0)


def C_kg_exact(bg, ells, ks, pk0, gzs, gdndz, bias=1.0, lzs=None, ldndz=None,
               rsd: bool = False, growth_mode: str = "closed", chis=None,
               table=None):
    """Exact linear lensing x galaxy cross-spectrum (analogue: limber.C_kg)."""
    if chis is None:
        chis = chi_loggrid()
    if growth_mode == "ode" and table is None:
        table = bgmod.growth_table(bg)
    ells_t = tuple(int(l) for l in np.asarray(ells))
    phig = galaxy_kernel(bg, chis, gzs, gdndz, bias, growth_mode, table)
    ksg, dg = bessel_deltas(phig, chis, ells_t)
    if rsd:
        phif = galaxy_kernel(bg, chis, gzs, gdndz, 1.0, growth_mode, table,
                             with_growth_rate=True)
        _, drsd = bessel_deltas_j2pp(phif, chis, ells_t)
        dg = dg + drsd
    _, dk = _kappa_deltas(bg, chis, ells_t, lzs, ldndz, growth_mode, table)
    return cl_from_deltas(ksg, dk, dg, ks, pk0)


def C_kk_exact(bg, ells, ks, pk0, lzs1=None, ldndz1=None, lzs2=None,
               ldndz2=None, growth_mode: str = "closed", chis=None,
               table=None):
    """Exact linear convergence auto/cross-spectrum (analogue: limber.C_kk).

    Carries the full l(l+1)/k^2 transfer (the Limber limit replaces it by
    1/chi^2 at k = (l + 1/2)/chi, an O(1/l^2) error this path does not
    make).  For CMB lensing pass lzs = z_star (~1090); the chi grid
    default reaches chi(z ~ 20) -- extend ``chis`` for the last-scattering
    kernel tail, or rely on the D(chi)/chi weighting making z > 20
    contributions negligible for l <= a few hundred.
    """
    if chis is None:
        chis = chi_loggrid()
    if growth_mode == "ode" and table is None:
        table = bgmod.growth_table(bg)
    ells_t = tuple(int(l) for l in np.asarray(ells))
    ksg, d1 = _kappa_deltas(bg, chis, ells_t, lzs1, ldndz1, growth_mode, table)
    if lzs2 is None and ldndz2 is None:
        d2 = d1
    else:
        _, d2 = _kappa_deltas(bg, chis, ells_t, lzs2, ldndz2, growth_mode,
                              table)
    return cl_from_deltas(ksg, d1, d2, ks, pk0)


# ----------------------------------------------------------------------
# Hybrid exact + Limber: exact low-ell behaviour for NONLINEAR
# (non-separable) spectra via the standard additive correction
#
#   C_hybrid = C_Limber[P_full] + ( C_exact[P_lin sep] - C_Limber[P_lin sep] )
#
# The bracket is the Limber projection error of the separable linear
# part -- exactly the piece that dominates the total Limber error at
# low ell (the nonlinear residual lives at high k, where Limber is
# already sub-percent), and it decays as O(1/ell^2) so the hybrid
# converges to the pure Limber of the full spectrum at high ell.  The
# exact side may carry RSD and magnification (absent from the Limber
# tier by construction), so those enter exactly where they matter.
# ----------------------------------------------------------------------

def _sep_pzk(bg, zs_nl, ks, pk0, growth_mode, table, bias=1.0):
    """bias^2 D(z)^2 pk0(k) on the Limber grid (the separable twin of the
    full nonlinear P fed to the Limber term)."""
    D = _growth_ratio(bg, jnp.asarray(zs_nl), growth_mode, table)
    return (bias**2 * D[:, None] ** 2) * jnp.asarray(pk0)[None, :]


def C_gg_hybrid(bg, ells, ks, pk0, zs_nl, pzk_nl, gzs, gdndz, bias=1.0,
                rsd: bool = False, smag=None, szs=None,
                growth_mode: str = "closed", chis=None, table=None,
                zmin=None, zmax=None):
    """Galaxy auto-spectrum with exact low-ell projection of the FULL
    nonlinear spectrum ``pzk_nl`` (on (zs_nl, ks)).

    ``pzk_nl`` is the already-biased P_gg(z, k) (e.g. halo-model 1h+2h);
    ``bias`` is the LINEAR bias used for the low-ell exact correction
    (at low ell the halo-model P_gg -> b^2 P_lin, so pass the effective
    window-averaged b; a few-percent mismatch only perturbs a term that
    is itself a small correction).  RSD/magnification enter through the
    exact part only -- the Limber tier has no analogue (reference
    cosmology.py:549-561), and both are low-ell effects for broad
    windows.
    """
    from . import limber as lim
    if growth_mode == "ode" and table is None:
        table = bgmod.growth_table(bg)
    cl_nl = lim.C_gg(bg, ells, zs_nl, ks, pzk_nl, gzs, gdndz,
                     zmin=zmin, zmax=zmax)
    pzk_sep = _sep_pzk(bg, zs_nl, ks, pk0, growth_mode, table, bias)
    cl_lin_limber = lim.C_gg(bg, ells, zs_nl, ks, pzk_sep, gzs, gdndz,
                             zmin=zmin, zmax=zmax)
    cl_lin_exact = C_gg_exact(bg, ells, ks, pk0, gzs, gdndz, bias=bias,
                              rsd=rsd, smag=smag, szs=szs,
                              growth_mode=growth_mode, chis=chis,
                              table=table)
    return cl_nl + (cl_lin_exact - cl_lin_limber)


def C_kk_hybrid(bg, ells, ks, pk0, zs_nl, pzk_nl, lzs1=None, ldndz1=None,
                lzs2=None, ldndz2=None, growth_mode: str = "closed",
                chis=None, table=None):
    """Convergence auto/cross-spectrum with exact low-ell projection of
    the FULL nonlinear matter spectrum ``pzk_nl`` (on (zs_nl, ks)); the
    low-ell correction additionally carries the exact l(l+1)/k^2 lensing
    transfer the Limber limit truncates (see C_kk_exact)."""
    from . import limber as lim
    if growth_mode == "ode" and table is None:
        table = bgmod.growth_table(bg)
    cl_nl = lim.C_kk(bg, ells, zs_nl, ks, pzk_nl, lzs1=lzs1, ldndz1=ldndz1,
                     lzs2=lzs2, ldndz2=ldndz2)
    pzk_sep = _sep_pzk(bg, zs_nl, ks, pk0, growth_mode, table)
    cl_lin_limber = lim.C_kk(bg, ells, zs_nl, ks, pzk_sep, lzs1=lzs1,
                             ldndz1=ldndz1, lzs2=lzs2, ldndz2=ldndz2)
    cl_lin_exact = C_kk_exact(bg, ells, ks, pk0, lzs1=lzs1, ldndz1=ldndz1,
                              lzs2=lzs2, ldndz2=ldndz2,
                              growth_mode=growth_mode, chis=chis,
                              table=table)
    return cl_nl + (cl_lin_exact - cl_lin_limber)
