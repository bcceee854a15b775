"""Flat-sky Gaussian map simulation + FFT-domain lensing reconstruction.

EXTENSION beyond the reference (which is spectrum-level only): a
map-level pipeline on the periodic flat-sky torus --

* `synth_gaussian`: Gaussian random fields with a prescribed C(l)
  (one rfft-free full-complex route: T = ifft2(fft2(w) sqrt(C(l)))
  with white w ~ N(0, 1/a^2) per pixel, which is real, exact, and
  batch/vmap-friendly);
* `map_power`: annulus-binned auto/cross power estimates (the exact
  inverse of the synthesis convention);
* `lens_map_first_order`: T + grad(phi).grad(T) evaluated spectrally
  (exact to O(phi) -- the order at which the quadratic estimator's
  response is defined, so the normalization test below is clean);
* `lens_map`: full remapping T(x + grad(phi)) by bilinear interpolation
  on the periodic grid (jax map_coordinates, mode='wrap');
* `qe_tt`: the flat-sky TT quadratic estimator in its separable
  real-space form.  With f_TT = C_{l1} L.l1 + C_{l2} L.l2 and weights
  f/(2 C^tot C^tot), the unnormalized estimator is

      ghat(L) = L . FFT[ (grad T_W)(x) T_I(x) ](L),
      T_I = T(l)/C^tot_l,   T_W = C^grad_l T(l)/C^tot_l,

  (the two symmetric halves of f are equal after relabeling, canceling
  the 1/2), and phi_hat(L) = N0(L) ghat(L) with the SAME N0 the
  analytic module computes (models/lensing_noise.n0_flat_sky).  A
  Monte-Carlo cross-correlation <phi_hat phi*>/<phi phi*> = 1 then
  tests that normalization through a route independent of both the
  flat-sky quadrature AND the full-sky 3j formalism
  (tests/test_flatsky.py; measured unity to ~2% per L-bin).

Everything is jit/vmap-compatible (static grid shapes, no Python loops
over modes); batched synthesis + reconstruction of many sims is one XLA
program (examples/lensing_qe_sim.py).

Conventions: grid n x n, pixel a rad, area Omega = (n a)^2; continuum
transform T(l) = a^2 FFT2[T](k); <|T(l)|^2> = Omega C(l).  C_l arrays
are indexed by integer l and sampled on the |l| grid by jnp.interp.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fourier_grid", "synth_gaussian", "map_power", "fourier_power",
           "lens_map_first_order", "lens_map", "qe_tt",
           "synth_pol", "eb_from_qu", "qe_eb"]

_ARCMIN = np.pi / (180.0 * 60.0)


def fourier_grid(n: int, pix_arcmin: float):
    """(lx, ly, lmod) for an n x n grid with the given pixel size.

    lx/ly are the angular wavenumbers of numpy's fft2 layout (rad^-1,
    i.e. multipoles); lmod = |l| with the (0,0) element left at 0.
    """
    a = pix_arcmin * _ARCMIN
    freqs = np.fft.fftfreq(n, d=a) * 2.0 * np.pi
    lx = jnp.asarray(freqs)[None, :]
    ly = jnp.asarray(freqs)[:, None]
    lmod = jnp.sqrt(lx**2 + ly**2)
    return lx, ly, lmod


def _cl_on_grid(cl, lmod):
    cl = jnp.asarray(cl)
    grid = jnp.arange(cl.shape[0], dtype=lmod.dtype)
    return jnp.interp(lmod, grid, cl, right=0.0)


def synth_gaussian(key, n: int, pix_arcmin: float, cl):
    """Real Gaussian map with spectrum C(l) (cl indexed by integer l).

    T = ifft2( fft2(w) sqrt(C(|l|)) ) with w white, Var(w_pix) = 1/a^2:
    then <|a^2 FFT T|^2> = Omega C exactly, at every realization count.
    """
    a = pix_arcmin * _ARCMIN
    w = jax.random.normal(key, (n, n)) / a
    lmod = fourier_grid(n, pix_arcmin)[2]
    tk = jnp.fft.fft2(w) * jnp.sqrt(_cl_on_grid(cl, lmod))
    return jnp.fft.ifft2(tk).real


def fourier_power(f1k, f2k, pix_arcmin: float, bin_edges):
    """Annulus-binned cross power of two fields given their (discrete)
    fft2 arrays: C_hat = (a^2/n^2) <Re F1 F2*> per bin -- the exact
    inverse of synth_gaussian's convention.  Returns (L_mid, C_hat)."""
    n = f1k.shape[0]
    a = pix_arcmin * _ARCMIN
    lmod = fourier_grid(n, pix_arcmin)[2]
    p = (f1k * jnp.conj(f2k)).real * (a**2 / n**2)
    edges = jnp.asarray(bin_edges)
    idx = jnp.digitize(lmod.ravel(), edges) - 1
    nb = edges.shape[0] - 1
    inb = (idx >= 0) & (idx < nb)
    idxc = jnp.where(inb, idx, 0)
    w = inb.astype(p.dtype)
    sums = jnp.zeros(nb, p.dtype).at[idxc].add(p.ravel() * w)
    cnts = jnp.zeros(nb, p.dtype).at[idxc].add(w)
    mids = 0.5 * (edges[:-1] + edges[1:])
    return mids, sums / jnp.maximum(cnts, 1.0)


def map_power(map1, map2, pix_arcmin: float, bin_edges):
    """Annulus-binned cross power of two real-space maps (auto if map1
    is map2); see fourier_power."""
    f1 = jnp.fft.fft2(map1)
    f2 = f1 if map2 is map1 else jnp.fft.fft2(map2)
    return fourier_power(f1, f2, pix_arcmin, bin_edges)


def _grad_maps(fk, lx, ly):
    """Real-space gradient of a field given its full-complex FFT."""
    gx = jnp.fft.ifft2(1j * lx * fk).real
    gy = jnp.fft.ifft2(1j * ly * fk).real
    return gx, gy


def lens_map_first_order(t, phi, pix_arcmin: float):
    """T + grad(phi).grad(T), both gradients spectral: exact to O(phi).

    This IS the coupling the quadratic estimator's response function is
    derived from, so reconstruction on these maps tests the estimator
    normalization with no interpolation systematics.
    """
    n = t.shape[0]
    lx, ly, _ = fourier_grid(n, pix_arcmin)
    tx, ty = _grad_maps(jnp.fft.fft2(t), lx, ly)
    px, py = _grad_maps(jnp.fft.fft2(phi), lx, ly)
    return t + px * tx + py * ty


def _fft_pad(fk, o: int):
    """Zero-pad a full fft2 array to an o-times finer grid (band-limited
    Fourier interpolation); the o^2 factor keeps real-space values.
    The shared Nyquist row/col carries ~zero power for band-limited
    inputs (l_nyq >> lmax) and is copied, not split."""
    n = fk.shape[0]
    h = n // 2
    out = jnp.zeros((o * n, o * n), dtype=fk.dtype)
    out = out.at[:h, :h].set(fk[:h, :h])
    out = out.at[:h, -h:].set(fk[:h, -h:])
    out = out.at[-h:, :h].set(fk[-h:, :h])
    out = out.at[-h:, -h:].set(fk[-h:, -h:])
    return out * (o * o)


def lens_map(t, phi, pix_arcmin: float, oversample: int = 2):
    """Fully remapped T(x + grad(phi)(x)) at the coarse pixel centers.

    All-orders simulator: both T and the deflection field are Fourier-
    interpolated onto an `oversample`-times finer grid (exact for
    band-limited fields), remapped there by bilinear interpolation, and
    the coarse pixel centers are read back (every o-th sample -- no
    extra smoothing).  The bilinear transfer deficit ~ (1-cos(l a_f))/3
    in amplitude falls ~ o^2: at l = 2000 with 1' pixels it is ~11% in
    power at o=1 and ~3% at o=2 (measured in the QE response,
    examples/lensing_qe_sim.py); raise `oversample` for tighter work.
    """
    from jax.scipy.ndimage import map_coordinates
    n = t.shape[0]
    o = int(oversample)
    a = pix_arcmin * _ARCMIN
    af = a / o
    tf = t if o == 1 else jnp.fft.ifft2(_fft_pad(jnp.fft.fft2(t), o)).real
    # deflections sampled AT the coarse centers are exact from the
    # coarse FFT (band-limited field); only T needs the fine grid
    lx, ly, _ = fourier_grid(n, pix_arcmin)
    px, py = _grad_maps(jnp.fft.fft2(phi), lx, ly)
    rows = float(o) * jnp.arange(n, dtype=t.dtype)
    yy = rows[:, None] + py / af     # axis 0 varies with ly
    xx = rows[None, :] + px / af
    return map_coordinates(tf, [yy, xx], order=1, mode="wrap")


def qe_tt(tmap, pix_arcmin: float, cl_grad, cl_total, n0_phi,
          lmin=30, lmax=3000):
    """Normalized flat-sky TT quadratic estimator phi_hat(l) (complex
    fft2 layout).

    cl_grad/cl_total: response / filter spectra on integer l (same
    meaning as models/lensing_noise.n0_flat_sky); n0_phi: N0^{phiphi}
    on integer L (from n0_flat_sky, interpolated onto the |L| grid) --
    using it as the normalization makes <phi_hat phi*> unbiased iff
    n0_flat_sky's normalization is correct, which is exactly what the
    Monte-Carlo test pins.  Modes with |l| outside [lmin, lmax] are
    dropped from the filters; the output is zeroed outside
    [2, len(n0_phi)-1].
    """
    n = tmap.shape[0]
    lx, ly, lmod = fourier_grid(n, pix_arcmin)
    tk = jnp.fft.fft2(tmap)
    band = (lmod >= lmin) & (lmod <= lmax)
    ctot = _cl_on_grid(cl_total, lmod)
    inv = jnp.where(band & (ctot > 0.0), 1.0 / jnp.where(ctot > 0, ctot, 1.0),
                    0.0)
    ti_k = tk * inv
    tw_k = ti_k * _cl_on_grid(cl_grad, lmod)
    ti = jnp.fft.ifft2(ti_k).real
    wx, wy = _grad_maps(tw_k, lx, ly)
    # ghat(L) = -i L_j Ptilde_j(L) with P_j = (d_j W) I; in discrete fft2
    # units (F = continuum/a^2) the a^2 factors cancel between the field
    # filters and the product transform, leaving
    #   phi_hat(L) = -i N0(L) [ lx FFT(P_x) + ly FFT(P_y) ](L).
    gk = lx * jnp.fft.fft2(wx * ti) + ly * jnp.fft.fft2(wy * ti)
    n0 = jnp.asarray(n0_phi)
    lout = (lmod >= 2.0) & (lmod <= float(n0.shape[0] - 1))
    return jnp.where(lout, -1j * gk * _cl_on_grid(n0, lmod), 0.0)


def _spin2_phases(n: int, pix_arcmin: float):
    """cos(2 psi_l), sin(2 psi_l) on the fft2 grid (0 at l = 0)."""
    lx, ly, lmod = fourier_grid(n, pix_arcmin)
    m2 = jnp.where(lmod > 0.0, lmod**2, 1.0)
    c2 = jnp.where(lmod > 0.0, (lx**2 - ly**2) / m2, 0.0)
    s2 = jnp.where(lmod > 0.0, 2.0 * lx * ly / m2, 0.0)
    return c2, s2


def synth_pol(key, n: int, pix_arcmin: float, cl_ee, cl_bb=None):
    """(Q, U) real maps from EE (and optionally BB) spectra.

    E/B are synthesized like synth_gaussian and rotated to Q/U by the
    spin-2 phases: Q(l) = cos(2psi) E - sin(2psi) B, U(l) = sin(2psi) E
    + cos(2psi) B.
    """
    a = pix_arcmin * _ARCMIN
    k1, k2 = jax.random.split(key)
    lmod = fourier_grid(n, pix_arcmin)[2]
    ek = jnp.fft.fft2(jax.random.normal(k1, (n, n)) / a) \
        * jnp.sqrt(_cl_on_grid(cl_ee, lmod))
    if cl_bb is None:
        bk = jnp.zeros_like(ek)
    else:
        bk = jnp.fft.fft2(jax.random.normal(k2, (n, n)) / a) \
            * jnp.sqrt(_cl_on_grid(cl_bb, lmod))
    c2, s2 = _spin2_phases(n, pix_arcmin)
    q = jnp.fft.ifft2(c2 * ek - s2 * bk).real
    u = jnp.fft.ifft2(s2 * ek + c2 * bk).real
    return q, u


def eb_from_qu(qmap, umap, pix_arcmin: float):
    """(E_k, B_k) fft2 arrays from Q/U maps (inverse spin rotation)."""
    n = qmap.shape[0]
    c2, s2 = _spin2_phases(n, pix_arcmin)
    qk = jnp.fft.fft2(qmap)
    uk = jnp.fft.fft2(umap)
    return c2 * qk + s2 * uk, -s2 * qk + c2 * uk


def qe_eb(qmap, umap, pix_arcmin: float, cl_ee_grad, cl_ee_total,
          cl_bb_total, n0_phi, lmin=30, lmax=3000):
    """Normalized flat-sky EB quadratic estimator phi_hat(l).

    Separable real-space form of f_EB = C^EE_{l1} (L.l1) sin 2(psi1 -
    psi2) with weights f / (C^EE,tot_{l1} C^BB,tot_{l2}) (the D=1
    convention of models/lensing_noise.n0_flat_sky, whose N0 is the
    normalization): expanding the sine,

      phi_hat(L) = -i N0(L) L . ( FFT[(grad We_s) Ib_c]
                                 - FFT[(grad We_c) Ib_s] ),
      We_{s/c}(l) = sin/cos(2psi) C^EE_l E(l)/C^EE,tot_l,
      Ib_{c/s}(x) = ifft[ cos/sin(2psi) B(l)/C^BB,tot_l ].

    The Monte-Carlo response test (tests/test_flatsky.py) pins this
    convention chain -- estimator, spin rotations AND n0_flat_sky's EB
    normalization -- end to end.
    """
    n = qmap.shape[0]
    lx, ly, lmod = fourier_grid(n, pix_arcmin)
    c2, s2 = _spin2_phases(n, pix_arcmin)
    ek, bk = eb_from_qu(qmap, umap, pix_arcmin)
    band = (lmod >= lmin) & (lmod <= lmax)
    cet = _cl_on_grid(cl_ee_total, lmod)
    cbt = _cl_on_grid(cl_bb_total, lmod)
    we = jnp.where(band & (cet > 0.0), _cl_on_grid(cl_ee_grad, lmod)
                   / jnp.where(cet > 0.0, cet, 1.0), 0.0) * ek
    ib = jnp.where(band & (cbt > 0.0),
                   1.0 / jnp.where(cbt > 0.0, cbt, 1.0), 0.0) * bk
    ib_c = jnp.fft.ifft2(c2 * ib).real
    ib_s = jnp.fft.ifft2(s2 * ib).real
    wex_s, wey_s = _grad_maps(s2 * we, lx, ly)
    wex_c, wey_c = _grad_maps(c2 * we, lx, ly)
    px = wex_s * ib_c - wex_c * ib_s
    py = wey_s * ib_c - wey_c * ib_s
    gk = lx * jnp.fft.fft2(px) + ly * jnp.fft.fft2(py)
    n0 = jnp.asarray(n0_phi)
    lout = (lmod >= 2.0) & (lmod <= float(n0.shape[0] - 1))
    return jnp.where(lout, -1j * gk * _cl_on_grid(n0, lmod), 0.0)
