"""Projected-field kSZ^2 x LSS cross-correlation.

EXTENSION beyond the reference: hmvec forecasts kSZ velocity
reconstruction (N_vv, SNR; reference hmvec/ksz.py:299-468) but ships no
API for the *projected-field* kSZ estimator -- cross-correlating the
SQUARE of a filtered CMB map with a tracer of large-scale structure
(Dore, Hennawi & Spergel 2004; Ferraro et al. 2016, PRD 94, 123526;
Hill et al. 2016; the class_sz implementation of Kusiak et al. 2021).
That estimator needs no redshifts for the CMB side and is how kSZ^2 x
(galaxies/lensing) has actually been detected, so it completes the
kSZ observable family next to the reconstruction forecasts.

Model.  The kSZ temperature is T(nhat) = int dchi K(z) q_r with
K(z) = T_CMB sigma_T n_e0 x_e e^-tau (1+z)^2 (models/ksz.py
ksz_radial_function, reference ksz.py:86-96) and q_r = (v_r/c) delta_e
the radial electron momentum.  For a filter f(l) applied to the map,

  C_l^{T_f^2 x g} = int d^2L/(2pi)^2 f(|L|) f(|l-L|) b(|L|, |l-L|, l)

with the projected (flat-sky Limber) hybrid bispectrum

  b(l1,l2,l3) = int dchi K^2(z) W_g(chi) / chi^4
                    B_{q_r q_r g}(k_i = (l_i+1/2)/chi; z).

The momentum bispectrum uses the standard large-scale-velocity
factorization (the same Ma & Fry squeezed treatment as the in-repo
kSZ auto spectrum, models/ksz.py get_ksz_auto_squeezed):
<(v delta_e)(v delta_e) delta_g> ~= <v_r^2> B_{eeg}, i.e.

  B_{q_r q_r g}(k1,k2,k3) ~= (vrms2(z)/3) B_{eeg}(k1,k2,k3)

with vrms2(z) = <(v/c)^2> = int dkL (f a H / kL)^2 P_mm^lin(kL,z)
k^2/(2pi^2) and B_{eeg} the full halo-model electron-electron-galaxy
bispectrum (models/bispectrum.py, 1h+2h+3h).  Velocity-density
connected corrections beyond the factorization are dropped, as in the
literature implementations.  The lensing contribution to <T_f^2 g>
(the dominant contaminant in real data) is a separate term the caller
can model with the in-repo lensing modules; it is NOT included here.

TPU notes: the (L, theta) filter convolution is one Gauss-Legendre
log-radial x angular tensor quadrature over ALL output ells at once --
every triangle configuration for every output ell goes through ONE
bispectrum evaluation (the bispectrum machinery is a batch of
two-gather leg lerps + static-weight mass contractions, no Python
loops), so the whole estimator is a single fused jit program.

Oracles (tests/test_projfield.py): closed-form Gaussian filter
convolution (exact 2D geometry of the quadrature), annulus measure
identity at l = 0, hybrid-bispectrum parity against the explicit-loop
numpy twin (twin/bispectrum.py) with independently assembled windows,
and filter/bispectrum linearity identities.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.quadrature import trapz_traced
from ..utils.weights import leggauss_cached
from . import background as bgmod
from .ksz import ksz_radial_function


# --------------------------------------------------------------- filters

def filter_from_table(ells, fells):
    """Linear-interpolation filter callable from a sampled f(l) table;
    zero outside the table's support (the filter defines the analysis
    band, so out-of-band modes must not contribute)."""
    ells = jnp.asarray(ells, dtype=jnp.float64)
    fells = jnp.asarray(fells, dtype=jnp.float64)

    def f(l):
        l = jnp.asarray(l)
        val = jnp.interp(l, ells, fells)
        return jnp.where((l < ells[0]) | (l > ells[-1]), 0.0, val)

    return f


def _as_filter(f_ell):
    if callable(f_ell):
        return f_ell
    ells, fells = f_ell
    return filter_from_table(ells, fells)


# ------------------------------------------------------- the convolution

def filtered_bispectrum_cl(ells_out, f_ell, b_fn, lmin, lmax,
                           n_radial=48, n_angle=24, ell_chunk=None):
    """C(l) = int d^2L/(2pi)^2 f(|L|) f(|l-L|) b(|L|, |l-L|, l).

    ``f_ell``: callable l -> f(l), or a (grid, values) table (zero
    outside the table).  ``b_fn``: maps three equal-length 1-D
    multipole arrays (l1, l2, l3) to the reduced bispectrum b(l1,l2,l3)
    (e.g. a closure over HaloModel.get_angular_bispectrum).  ``lmin``/
    ``lmax`` bound the |L| integration (the filter support).

    Quadrature: Gauss-Legendre in ln|L| on [ln lmin, ln lmax] (measure
    L dL = L^2 dlnL) x Gauss-Legendre in the angle on [0, pi] (doubled
    by symmetry).  All (n_out, n_radial, n_angle) triangle
    configurations are evaluated through ONE b_fn call; ``ell_chunk``
    splits the output ells across several b_fn calls when the halo-model
    leg tables ((nz, nm, n_triangles) per leg) would not fit in memory.
    """
    f = _as_filter(f_ell)
    ells_out = jnp.atleast_1d(jnp.asarray(ells_out, dtype=jnp.float64))
    if ell_chunk is not None and ells_out.size > ell_chunk:
        return jnp.concatenate([
            filtered_bispectrum_cl(ells_out[i:i + ell_chunk], f, b_fn,
                                   lmin, lmax, n_radial, n_angle)
            for i in range(0, ells_out.size, ell_chunk)])

    xr, wr = leggauss_cached(n_radial)
    la, lb = np.log(float(lmin)), np.log(float(lmax))
    lnL = 0.5 * (xr + 1.0) * (lb - la) + la
    wL = jnp.asarray(wr * 0.5 * (lb - la))
    L = jnp.exp(jnp.asarray(lnL))                       # (nr,)

    xa, wa = leggauss_cached(n_angle)
    theta = jnp.asarray(0.5 * (xa + 1.0) * np.pi)       # (na,)
    wth = jnp.asarray(wa * 0.5 * np.pi)

    lo = ells_out[:, None, None]                        # (no, 1, 1)
    L1 = jnp.broadcast_to(L[None, :, None],
                          (ells_out.size, L.size, theta.size))
    L2 = jnp.sqrt(jnp.maximum(
        lo**2 + L1**2 - 2.0 * lo * L1 * jnp.cos(theta[None, None, :]),
        0.0))
    L3 = jnp.broadcast_to(lo, L1.shape)

    b = b_fn(L1.reshape(-1), L2.reshape(-1), L3.reshape(-1))
    b = jnp.asarray(b).reshape(L1.shape)                # (no, nr, na)

    integrand = f(L1) * f(L2) * b * L1**2               # L^2 dlnL measure
    # angle integral doubled (theta -> 2pi - theta symmetry), /(2pi)^2
    inner = jnp.einsum("ora,a->or", integrand, wth)
    return 2.0 * jnp.einsum("or,r->o", inner, wL) / (2.0 * jnp.pi) ** 2


# ------------------------------------------- lensing contamination term

def bispectrum_ttg_lensing(cl_tt, cl_xg):
    """b_fn for the CMB-LENSING contribution to <T_f^2 x g> -- the
    dominant contaminant of the projected-field kSZ^2 estimator in real
    data (Ferraro et al. 2016 sec. III; Hill et al. 2016).

    First-order lensing T~ = T + grad(phi).grad(T) gives, for a tracer g
    correlated with the lensing potential (vectors v1 + v2 + v3 = 0):

      <T~(v1) T~(v2) g(v3)> = -C^{phi g}(l3) [ (v3.v1) C^TT(l1)
                                             + (v3.v2) C^TT(l2) ].

    This module's convolution parameterizes triangles as v3 = v1 + v2
    (l1 = |L|, l2 = |l-L|, l3 = |l|), i.e. v3 -> -v3 of the symmetric
    convention, so in magnitudes (law of cosines):

      b(l1,l2,l3) = [ (l3^2 + l1^2 - l2^2)/2 * C^TT(l1)
                    + (l3^2 + l2^2 - l1^2)/2 * C^TT(l2) ] * C^{phi g}(l3).

    ``cl_tt``/``cl_xg``: integer-l indexed tables (C^{phi g} = C^{phi phi}
    for g = phi).  For a density tracer, C^{phi g} > 0 and decaying C^TT
    make the term negative -- lensing smooths small-scale power where g
    is overdense.  Validated at map level against flatsky synthesis +
    first-order lensing (tests/test_projfield.py), pinning this module's
    convolution normalization through an independent route.
    """
    cl_tt = jnp.asarray(cl_tt, dtype=jnp.float64)
    cl_xg = jnp.asarray(cl_xg, dtype=jnp.float64)
    grid_t = jnp.arange(cl_tt.shape[0], dtype=jnp.float64)
    grid_x = jnp.arange(cl_xg.shape[0], dtype=jnp.float64)

    def b_fn(l1, l2, l3):
        ct1 = jnp.interp(l1, grid_t, cl_tt, right=0.0)
        ct2 = jnp.interp(l2, grid_t, cl_tt, right=0.0)
        cx3 = jnp.interp(l3, grid_x, cl_xg, right=0.0)
        d31 = 0.5 * (l3**2 + l1**2 - l2**2)
        d32 = 0.5 * (l3**2 + l2**2 - l1**2)
        return (d31 * ct1 + d32 * ct2) * cx3

    return b_fn


def cl_t2_lensing(ells_out, f_ell, cl_tt, cl_xg, lmin, lmax,
                  n_radial=64, n_angle=48):
    """Lensing contribution to the filtered-squared-map cross spectrum
    C_l^{T_f^2 x g}: the filtered_bispectrum_cl convolution of
    bispectrum_ttg_lensing.  Subtract this (with the measured C^TT and a
    modeled C^{phi g}) from a measured projected-field spectrum before
    interpreting it as kSZ^2."""
    return filtered_bispectrum_cl(ells_out, f_ell,
                                  bispectrum_ttg_lensing(cl_tt, cl_xg),
                                  lmin, lmax, n_radial=n_radial,
                                  n_angle=n_angle)


# ------------------------------------------------- estimator noise / SNR

def cl_t2_t2_gaussian(ells_out, f_ell, cl_total, lmin, lmax,
                      n_radial=64, n_angle=48):
    """Gaussian (disconnected) auto-spectrum of the mean-subtracted
    filtered-squared map s = T_f^2 - <T_f^2>:

      C^{ss}(l) = 2 int d^2L/(2pi)^2 [f^2 C^tot](|L|) [f^2 C^tot](|l-L|)

    -- the noise spectrum of the projected-field estimator (the analogue
    of N0 for a quadratic estimator with trivial weights).  ``cl_total``:
    integer-l table of the TOTAL map spectrum (signal + foregrounds +
    noise, beam-convolved consistently with f).  Reuses the filter
    convolution with the filter squared and b = 2 C^tot(l1) C^tot(l2).
    MC-validated against Gaussian map synthesis (tests/test_projfield.py).
    """
    f = _as_filter(f_ell)
    cl_total = jnp.asarray(cl_total, dtype=jnp.float64)
    grid = jnp.arange(cl_total.shape[0], dtype=jnp.float64)

    def f2(l):
        return f(l) ** 2

    def b_fn(l1, l2, l3):
        c1 = jnp.interp(l1, grid, cl_total, right=0.0)
        c2 = jnp.interp(l2, grid, cl_total, right=0.0)
        return 2.0 * c1 * c2

    return filtered_bispectrum_cl(ells_out, f2, b_fn, lmin, lmax,
                                  n_radial=n_radial, n_angle=n_angle)


def ksz2_snr(ells, cl_sg, cl_ss, cl_gg, fsky, delta_ell=None):
    """Gaussian bandpower SNR of a projected-field cross-spectrum:

      SNR^2 = sum_b (C^{sg}_b)^2 (2 l_b + 1) dl_b fsky
                    / (C^{ss}_b C^{gg}_b + (C^{sg}_b)^2).

    ``ells``: band centers (delta_ell defaults to their spacing);
    ``cl_gg`` must include shot noise.  Returns (per-band SNR^2, total
    SNR)."""
    ells = jnp.asarray(ells, dtype=jnp.float64)
    if delta_ell is None:
        e = jnp.concatenate([ells[:1], ells, ells[-1:]])
        delta_ell = 0.5 * (e[2:] - e[:-2])
    cl_sg = jnp.asarray(cl_sg)
    var = (jnp.asarray(cl_ss) * jnp.asarray(cl_gg) + cl_sg**2)
    snr2 = (cl_sg**2 / var * (2.0 * ells + 1.0)
            * jnp.asarray(delta_ell) * fsky)
    return snr2, jnp.sqrt(jnp.sum(snr2))


# ------------------------------------------------------ the kSZ assembly

def vrms2_linear(hm, zs=None, kLs=None):
    """<(v/c)^2>(z) = int dkL (f a H / kL)^2 P_mm^lin(kL, z) kL^2/(2pi^2)
    -- the same linear-theory velocity variance as the Ma & Fry squeezed
    kSZ auto path (models/ksz.py:444-445; reference ksz.py:806-810)."""
    if zs is None:
        zs = hm.zs
    zs = jnp.atleast_1d(jnp.asarray(zs))
    if kLs is None:
        kLs = np.geomspace(1e-4, 3.0, 200)
    kLs = jnp.asarray(kLs)
    p = hm.P_lin_slow(kLs, zs)                           # (nz, nkL)
    faH = (hm.get_growth_rate_f(zs) / (1.0 + zs) * hm.h_of_z(zs))
    integrand = p * faH[:, None] ** 2                    # (faH/k)^2 k^2 P
    return trapz_traced(integrand, kLs, axis=-1) / (2.0 * jnp.pi**2)


def ksz_t_windows(hm, zs=None, gdndz=None, xe=1, tau=0, gasfrac=0.9,
                  vrms2=None):
    """Per-z windows for the two kSZ temperature legs and the galaxy leg
    in the projected_bispectrum convention (per-chi window = H x W):

      W_T = sqrt(vrms2/3) K(z) / H(z)      (each momentum leg carries
                                            one factor of v_rms/sqrt(3))
      W_g = dndz / int dndz dz             (None -> uniform in z).

    Returns (W_T, W_g, zs)."""
    if zs is None:
        zs = hm.zs
    zs = jnp.atleast_1d(jnp.asarray(zs))
    if zs.size < 2:
        raise ValueError("the projected hybrid bispectrum integrates over "
                         "z: build the HaloModel with >= 2 redshifts")
    if vrms2 is None:
        vrms2 = vrms2_linear(hm, zs)
    K = ksz_radial_function(zs, hm.ombh2, hm.YHe, gasfrac=gasfrac,
                            xe=xe, tau=tau, params=hm.p)
    H = hm.h_of_z(zs)
    W_T = jnp.sqrt(jnp.asarray(vrms2) / 3.0) * K / H
    if gdndz is None:
        W_g = jnp.ones_like(zs)
        if zs.size > 1:
            W_g = W_g / trapz_traced(W_g, zs)
    else:
        W_g = jnp.asarray(gdndz) / trapz_traced(jnp.asarray(gdndz), zs)
    return W_T, W_g, zs


def hybrid_bispectrum_ttg(hm, ells1, ells2, ells3, gdndz=None,
                          name_e="e", name_g="g", terms="total",
                          xe=1, tau=0, gasfrac=0.9, vrms2=None):
    """Projected hybrid bispectrum b_{TTg}(l1,l2,l3) in uK^2: the two T
    legs carry the kSZ radial kernel and the large-scale velocity rms,
    the third leg the normalized galaxy dndz; the 3D bispectrum is the
    halo-model B_{eeg} of the registered electron and HOD tracers."""
    W_T, W_g, _ = ksz_t_windows(hm, None, gdndz, xe, tau, gasfrac, vrms2)
    return hm.get_angular_bispectrum(ells1, ells2, ells3, name=name_e,
                                     name2=name_e, name3=name_g,
                                     Wz1s=W_T, Wz2s=W_T, Wz3s=W_g,
                                     terms=terms)


def cl_ksz2_galaxy(hm, ells_out, f_ell, lmin=None, lmax=None, gdndz=None,
                   name_e="e", name_g="g", terms="total", xe=1, tau=0,
                   gasfrac=0.9, vrms2=None, n_radial=48, n_angle=24,
                   ell_chunk=None):
    """Projected-field kSZ^2 x galaxy cross power C_l^{T_f^2 g} in uK^2.

    ``hm``: a HaloModel (or kSZ) instance with an electron profile
    ``name_e`` and an HOD ``name_g`` registered; its k grid should reach
    ~lmax/chi(z_min).  ``f_ell``: the map filter (callable or (grid,
    values) table -- typically b_l/C_l^total).  ``lmin``/``lmax``
    default to the filter table's support and bound the internal |L|
    integral.  ``gdndz``: galaxy dndz on hm.zs (None = uniform).
    ``vrms2``: override <v^2>(z) (defaults to linear theory on the
    instance cosmology).  Returns (n_ell,) C_l values.
    """
    if lmin is None or lmax is None:
        if callable(f_ell):
            raise ValueError("lmin/lmax are required for a callable filter")
        grid = np.asarray(f_ell[0], dtype=float)
        lmin = grid[0] if lmin is None else lmin
        lmax = grid[-1] if lmax is None else lmax
    W_T, W_g, _ = ksz_t_windows(hm, None, gdndz, xe, tau, gasfrac, vrms2)

    def b_fn(l1, l2, l3):
        return hm.get_angular_bispectrum(l1, l2, l3, name=name_e,
                                         name2=name_e, name3=name_g,
                                         Wz1s=W_T, Wz2s=W_T, Wz3s=W_g,
                                         terms=terms)

    return filtered_bispectrum_cl(ells_out, f_ell, b_fn, lmin, lmax,
                                  n_radial=n_radial, n_angle=n_angle,
                                  ell_chunk=ell_chunk)


def cl_ksz2_kappa(hm, ells_out, f_ell, lmin=None, lmax=None,
                  zstar=1089.0, name_e="e", name_matter="nfw",
                  terms="total", xe=1, tau=0, gasfrac=0.9, vrms2=None,
                  n_radial=48, n_angle=24, ell_chunk=None):
    """Projected-field kSZ^2 x CMB-lensing-convergence cross power
    C_l^{T_f^2 kappa} in uK^2 (the Hill et al. 2016 companion observable
    to the galaxy cross): the third bispectrum leg is the matter tracer
    through the CMB lensing window W_kappa(z -> zstar).

    The halo model's zs grid is the integration support -- it should
    span the redshifts where the electron pressure of the W_kappa
    overlap lives (z ~ 0.1-4 in practice)."""
    from .limber import lensing_window
    if lmin is None or lmax is None:
        if callable(f_ell):
            raise ValueError("lmin/lmax are required for a callable filter")
        grid = np.asarray(f_ell[0], dtype=float)
        lmin = grid[0] if lmin is None else lmin
        lmax = grid[-1] if lmax is None else lmax
    W_T, _, zs = ksz_t_windows(hm, None, None, xe, tau, gasfrac, vrms2)
    W_k = lensing_window(hm.bg, zs, zstar)

    def b_fn(l1, l2, l3):
        return hm.get_angular_bispectrum(l1, l2, l3, name=name_e,
                                         name2=name_e, name3=name_matter,
                                         Wz1s=W_T, Wz2s=W_T, Wz3s=W_k,
                                         terms=terms)

    return filtered_bispectrum_cl(ells_out, f_ell, b_fn, lmin, lmax,
                                  n_radial=n_radial, n_angle=n_angle,
                                  ell_chunk=ell_chunk)
