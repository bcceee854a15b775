"""Batched real->Fourier profile transform: the flagship TPU kernel.

The reference transforms halo profiles rho(x) -> u(k) with one numpy rfft
over the (z, m, x) grid followed by a *python double loop* re-interpolating
each (z, m) row onto the target ks (hmvec/fft.py:56-115; the loop at
:97-115 is the documented bottleneck, README.rst:7-10).

TPU-native redesign:

  1. The sine DFT  u_i = step * sum_j y_j sin(2 pi i j / N)  is evaluated as
     ONE batched matmul  (B, N) @ (N, nk)  against a static sine matrix --
     it lands on the MXU (f32/bf16) or the vector unit (f64), with no
     complex dtypes (this TPU has no complex128).  For large N (e.g. the
     NFW default nxs=40000) a complex64 rfft path avoids materializing the
     DFT matrix.

  2. The per-(z,m) resample is closed-form index algebra: the source grid
     kt_i = i * dkt is uniform, so the interpolation position of target k
     for scale s = r_s (1+z) is simply p = k s / dkt -- a gather + lerp over
     the whole (z, m, k) grid at once.  Boundary semantics match the
     reference exactly: flat extrapolation at low k (left=u[first positive
     kt]) and zero above the Nyquist kt (fft.py:107).

Both steps are jit-able and differentiable.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _sine_matrix(n: int, nk: int, dtype_str: str):
    """S[j, i] = sin(2 pi i j / n) as a static host-side array."""
    j = np.arange(n)[:, None]
    i = np.arange(nk)[None, :]
    # compute the phase in f64 modulo n to keep sin arguments small
    phase = 2.0 * np.pi * ((j * i) % n) / n
    return np.sin(phase).astype(dtype_str)


def sine_dft(y, step, method: str = "auto", mixed_chunks: int = 16):
    """-Im[rfft(y)] * step along the last axis (the reference's fft_integral
    core, fft.py:35-51) without complex128.

    y: (..., N) real.  Returns (..., N//2+1).

    Methods:
      'fft'     -- rfft (c128 on CPU = exact; c64 on TPU, ~2e-7 rel-to-peak)
      'matmul'  -- dense DFT matmul in the input dtype (f64 on TPU runs on
                   the slow emulated dot path: exact but ~21 GMAC/s)
      'mixed'   -- double-single MXU path: split y and the sine matrix into
                   (hi, lo) f32 pairs, run 3 f32 matmuls on the MXU per
                   N-chunk, accumulate chunk results in f64.  ~50x faster
                   than 'matmul' on TPU at ~1e-6 relative-to-peak accuracy
                   (in-chunk f32 accumulation is the floor).
      'mixed32' -- like 'mixed' but with y already f32 (2 matmuls: y
                   against the hi and lo matrix parts, f64 chunk
                   accumulation).  Input-quantization noise is spectrally
                   flat and ~1e-8 of peak, so accuracy matches 'mixed'.
      'auto'    -- CPU: fft (exact).  TPU: fft for power-of-two N (the XLA
                   TPU FFT is fast there, ~2e-7 rel-to-peak), else mixed
                   (XLA's FFT slows ~3x on non-pow2 N like the reference's
                   default nxs=5000, and the f64 matmul path is ~12x slower
                   than mixed); f32 input always takes mixed32.
    """
    n = y.shape[-1]
    nk = n // 2 + 1
    if method == "auto":
        on_cpu = jax.default_backend() == "cpu"
        if on_cpu:
            method = "fft"
        elif y.dtype == jnp.float32:
            method = "mixed32"
        elif y.dtype != jnp.float64:
            method = "matmul"
        else:
            method = "fft" if (n & (n - 1)) == 0 else "mixed"
    if method == "fft":
        if y.dtype == jnp.float64 and jax.default_backend() != "cpu":
            # TPU: no complex128 -- run the FFT in c64, keep f64 elsewhere
            out = -jnp.fft.rfft(y.astype(jnp.float32)).imag.astype(y.dtype)
        else:
            out = -jnp.fft.rfft(y).imag
        return out * step
    if method == "matmul":
        s = jnp.asarray(_sine_matrix(n, nk, str(y.dtype)))
        out = jax.lax.dot_general(
            y, s, dimension_numbers=(((y.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=y.dtype)
        return out * step
    if method == "mixed":
        return _sine_dft_mixed(y, step, mixed_chunks)
    if method == "mixed32":
        return _sine_dft_mixed32(y, step, mixed_chunks)
    raise ValueError(method)


def _split_hi_lo(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _sine_dft_mixed(y, step, chunks: int):
    """Double-single sine DFT: 3 f32 MXU matmuls per N-chunk, f64 chunk
    accumulation.  y: (..., N) f64."""
    n = y.shape[-1]
    nk = n // 2 + 1
    # pad N to a multiple of chunks
    nc = -(-n // chunks)
    pad = nc * chunks - n
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    s64 = _sine_matrix(n, nk, "float64")
    if pad:
        s64 = np.pad(s64, [(0, pad), (0, 0)])
    sh = jnp.asarray(s64.astype(np.float32))
    sl = jnp.asarray((s64 - s64.astype(np.float32)).astype(np.float32))
    sh = sh.reshape(chunks, nc, nk)
    sl = sl.reshape(chunks, nc, nk)

    batch = y.shape[:-1]
    yb = y.reshape(-1, chunks, nc)
    yh, yl = _split_hi_lo(yb)

    def mm(a, b):  # (B, C, nc) x (C, nc, nk) -> (C, B, nk)
        # HIGHEST forces true-f32 MXU passes; the TPU default is
        # bf16-class and costs ~5e-4 relative in the oscillatory sums
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    main = mm(yh, sh).astype(jnp.float64)
    cross = (mm(yh, sl) + mm(yl, sh)).astype(jnp.float64)
    out = (main + cross).sum(axis=0)          # f64 chunk accumulation
    return out.reshape(*batch, nk) * step


def _sine_dft_mixed32(y, step, chunks: int):
    """mixed-path variant for f32 input: 2 f32 MXU matmuls per N-chunk
    (y vs the hi/lo sine-matrix parts), f64 chunk accumulation."""
    n = y.shape[-1]
    nk = n // 2 + 1
    nc = -(-n // chunks)
    pad = nc * chunks - n
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    s64 = _sine_matrix(n, nk, "float64")
    if pad:
        s64 = np.pad(s64, [(0, pad), (0, 0)])
    sh = jnp.asarray(s64.astype(np.float32)).reshape(chunks, nc, nk)
    sl = jnp.asarray((s64 - s64.astype(np.float32)).astype(np.float32)
                     ).reshape(chunks, nc, nk)

    batch = y.shape[:-1]
    yb = y.reshape(-1, chunks, nc).astype(jnp.float32)

    def mm(a, b):  # (B, C, nc) x (C, nc, nk) -> (C, B, nk)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    out = (mm(yb, sh).astype(jnp.float64)
           + mm(yb, sl).astype(jnp.float64)).sum(axis=0)
    return out.reshape(*batch, nk) * step


@functools.lru_cache(maxsize=8)
def _sine_matrix_scaled(n: int, nk: int, step: float,
                        mass_col: bool = False):
    """S'[j, i] = sin(2 pi i j / n) * step / kt_i with kt_i = i * dkt,
    dkt = 2 pi / (n * step): the DFT matmul then directly produces
    u(kt) = -Im[rfft] * step / kt with ZERO per-element normalization ops
    on the (batch, nk) output grid (the round-2 config-2 profile: ~20 ms
    of f64 ukt/kts normalization materialization, DEVNOTES.md).  Column 0
    (kt = 0) is zeroed -- that entry is never sampled by the resample --
    OR, with mass_col, repurposed as the trapz mass-norm weights
    x_j dx_j (so the SAME matmul emits mnorm = trapz(y x, x) for free:
    the DFT input is y = rho theta x, and trapz(rho theta x^2) is a dot
    of y with x_j w_j)."""
    j = np.arange(n)[:, None]
    i = np.arange(nk)[None, :]
    phase = 2.0 * np.pi * ((j * i) % n) / n
    s = np.sin(phase)
    kt = np.arange(nk) * (2.0 * np.pi / (n * step))
    with np.errstate(divide="ignore"):
        col = np.where(kt == 0, 0.0, step / np.where(kt == 0, 1.0, kt))
    out = s * col[None, :]
    if mass_col:
        # the sample grid is xs = linspace(0, xmax, n+1)[1:], so the true
        # spacing is dx = step * n/(n-1) (step is the reference's
        # extent/N quirk); trapz weights (dx/2, dx, ..., dx, dx/2)
        dx = step * n / (n - 1.0)
        w = np.full(n, dx)
        w[0] *= 0.5
        w[-1] *= 0.5
        out[:, 0] = (np.arange(n) + 1.0) * dx * w
    return out


def _sine_dft_mixed32_scaled(y, step: float, chunks: int = 4,
                             mass_col: bool = False, acc_dtype=None):
    """f32-input double-single MXU sine DFT with step/kt folded into the
    static matrix: returns u(kt) = sine_dft(y, step)/kt directly (column 0
    = 0, or the mass norm when mass_col).  2 f32 MXU matmuls per N-chunk;
    cross-chunk accumulation in ``acc_dtype`` (default f64 -- chunk
    partials of an oscillatory sum can cancel; pass jnp.float32 to trade
    ~1e-7-class accuracy for dropping the last f64 full-grid work)."""
    n = y.shape[-1]
    nk = n // 2 + 1
    nc = -(-n // chunks)
    pad = nc * chunks - n
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    s64 = _sine_matrix_scaled(n, nk, float(step), mass_col)
    if pad:
        s64 = np.pad(s64, [(0, pad), (0, 0)])
    sh = jnp.asarray(s64.astype(np.float32)).reshape(chunks, nc, nk)
    sl = jnp.asarray((s64 - s64.astype(np.float32)).astype(np.float32)
                     ).reshape(chunks, nc, nk)

    batch = y.shape[:-1]
    yb = y.reshape(-1, chunks, nc).astype(jnp.float32)

    def mm(a, b):  # (B, C, nc) x (C, nc, nk) -> (C, B, nk)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    acc = acc_dtype or jnp.float64
    out = (mm(yb, sh).astype(acc) + mm(yb, sl).astype(acc)).sum(axis=0)
    return out.reshape(*batch, nk)


def fft_integral(x, y):
    """int_0^inf dx x sin(kx) y(x) -> (ks, uk), with the reference's
    rfft conventions (fft.py:35-51, including its step = extent/N
    quirk), via the matmul sine-DFT (no complex128/f64 FFT on TPU).
    Standalone validator; check against ``analytic_fft_integral`` for
    y = exp(-x^2/2)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[-1]
    step = (x[-1] - x[0]) / n
    uk = sine_dft(x * y, step)
    ks = jnp.arange(n // 2 + 1) * 2.0 * jnp.pi / (n * step)
    return ks, uk


def analytic_fft_integral(ks):
    """Closed form of ``fft_integral`` for y = exp(-x^2/2):
    sqrt(pi/2) k exp(-k^2/2) (reference fft.py:53)."""
    ks = jnp.asarray(ks)
    return jnp.sqrt(jnp.pi / 2.0) * jnp.exp(-(ks**2) / 2.0) * ks


def uk_fft(rhofunc, rvir, dr: float = 0.001, rmax: float = 100):
    """Standalone validator: u(k) of a radial profile by sine transform
    (reference fft.py:8-19 semantics)."""
    rvir = jnp.asarray(rvir)
    rs = jnp.arange(dr, rmax, dr)
    rhos = rhofunc(rs)
    theta = (rs <= rvir[..., None]).astype(rhos.dtype)
    integrand = rhos * theta
    dx = jnp.diff(rs)
    prof = integrand * rs**2
    m = jnp.sum((prof[..., 1:] + prof[..., :-1]) * dx / 2.0,
                axis=-1) * 4.0 * jnp.pi
    n = rs.shape[-1]
    step = (rs[-1] - rs[0]) / n
    ukt = sine_dft(integrand * rs, step)
    kts = jnp.arange(n // 2 + 1) * 2.0 * jnp.pi / (n * step)
    uk = 4.0 * jnp.pi * ukt / jnp.where(kts == 0, 1.0, kts) / m[..., None]
    return kts, uk


def uk_brute_force(r, rho, rvir, ks):
    """Standalone validator: direct quadrature of the profile transform
    (reference fft.py:22-33 semantics)."""
    r = jnp.asarray(r)
    rho = jnp.asarray(rho)
    sel = r < rvir
    w = sel.astype(rho.dtype)
    dx = jnp.diff(r)

    def trap(y):
        return jnp.sum((y[..., 1:] + y[..., :-1]) * dx / 2.0, axis=-1)

    m = trap(rho * w * r**2) * 4.0 * jnp.pi
    sinkr = jnp.sin(r[:, None] * jnp.asarray(ks)[None, :])
    integrand = 4.0 * jnp.pi * r[:, None] * sinkr * (rho * w)[:, None] \
        / jnp.asarray(ks)[None, :]
    return trap(integrand.T) / m


def _pair_lerp_gather(u, i0, frac):
    """Reference lowering: two dynamic gathers + lerp (used on CPU and as
    the differentiation rule -- gathers transpose to scatters cleanly)."""
    u0 = jnp.take_along_axis(u, i0, axis=-1)
    u1 = jnp.take_along_axis(u, i0 + 1, axis=-1)
    return u0 + frac * (u1 - u0)


@jax.custom_jvp
def _pair_lerp_tpu(u, i0, frac):
    """lerp(u, i0, frac) with the Pallas in-VMEM pair-selection kernel.

    XLA's elementwise dynamic gather costs ~25 ns/element on this TPU
    (~230 ms on the config-2 grid; tools/microbench_resample.py), so the
    primal runs the mask-reduction kernel instead -- ~1e-15-relative f64
    (49-bit double-single pairs + exact one-hot selection).
    Differentiation falls back
    to the gather form via the custom_jvp below (tangents are linear in
    u/frac, so reverse mode transposes them to scatters automatically).
    """
    from .pallas_resample import select_pairs
    u0, u1 = select_pairs(u, i0)
    return u0 + frac * (u1 - u0)


@_pair_lerp_tpu.defjvp
def _pair_lerp_tpu_jvp(primals, tangents):
    u, i0, frac = primals
    du, _di0, dfrac = tangents
    u0 = jnp.take_along_axis(u, i0, axis=-1)
    u1 = jnp.take_along_axis(u, i0 + 1, axis=-1)
    val = u0 + frac * (u1 - u0)
    du0 = jnp.take_along_axis(du, i0, axis=-1)
    du1 = jnp.take_along_axis(du, i0 + 1, axis=-1)
    dval = du0 + frac * (du1 - du0) + dfrac * (u1 - u0)
    return val, dval


def resample_uniform_source(u, dkt, scales, ks, method: str = "auto"):
    """Vectorized replacement for the reference's _interp_loop (fft.py:97-115).

    u:      (..., nkt) profile transform on the uniform grid kt_i = i*dkt
    scales: (...,)      per-profile scale s = r_s * (1+z); the physical
                        output grid is kout_i = kt_i / s
    ks:     (nk,)       target wavenumbers
    method: 'auto' (pallas kernel on TPU, gathers on CPU) | 'gather' |
            'pallas'

    For each batch element, np.interp(ks, kout[1:], u[1:], left=u[1],
    right=0) reduces to interpolation at fractional index p = k*s/dkt.
    """
    nkt = u.shape[-1]
    p = jnp.asarray(ks) * scales[..., None] / dkt      # (..., nk)
    # clamp to the valid lerp window [1, nkt-2]; boundary handled below
    i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 1, nkt - 2)
    frac = p - i0
    if method == "auto":
        method = "gather" if jax.default_backend() == "cpu" else "pallas"
    if method == "pallas":
        val = _pair_lerp_tpu(u, i0, frac)
    else:
        val = _pair_lerp_gather(u, i0, frac)
    left = u[..., 1:2]                                 # flat below first kt>0
    val = jnp.where(p < 1.0, left, val)
    val = jnp.where(p > nkt - 1.0, 0.0, val)           # zero above Nyquist
    return val


def generic_profile_fft(rhofunc_x, cmaxs, rss, zs, ks, xmax, nxs,
                        do_mass_norm: bool = True, method: str = "auto",
                        sample_dtype=None):
    """Profile transform u(k|z,m) (reference: fft.py:56-94, TPU-native).

    rhofunc_x: callable sampling the profile on xs (returns (nz,nm,nxs) or
               (nxs,) to broadcast)
    cmaxs:     (nz,nm) dimensionless cutoff (e.g. concentration)
    rss:       (nz,nm) scale radii in Mpc (physical)
    zs:        (nz,) redshifts (for the physical->comoving k conversion)
    ks:        (nk,) target comoving wavenumbers
    sample_dtype: dtype for the profile sampling stage.  None = auto:
               float32 on TPU (the (z,m,nxs) exp/log stage runs on native
               f32 instead of emulated f64; the cutoff mask stays f64-exact
               and the mass norm accumulates in f64, so the deviation is
               ~1e-7 relative -- far below the 1e-5 twin-parity gate),
               float64 on CPU (bit-level parity with the numpy twin).
    Returns (ks, u) with u of shape (nz, nm, nk).

    Matches the reference's sampling conventions exactly, including its
    step = (xs[-1]-xs[0])/nxs (slightly different from the true spacing,
    fft.py:46-48).
    """
    xs_np = np.linspace(0.0, xmax, nxs + 1)[1:]
    xs = jnp.asarray(xs_np)
    step = (xs_np[-1] - xs_np[0]) / nxs
    dkt = 2.0 * np.pi / (nxs * step)

    if sample_dtype is None:
        sample_dtype = (jnp.float32 if jax.default_backend() != "cpu"
                        else jnp.float64)
    rhos = rhofunc_x(xs.astype(sample_dtype))
    if rhos.ndim == 1:
        rhos = rhos[None, None, :]
    # cutoff mask from the f64 grid (a sample landing within f32-eps of
    # the cutoff must not flip inclusion relative to the twin)
    theta = (xs[None, None, :] <= cmaxs[..., None]).astype(rhos.dtype)
    integrand = theta * rhos
    xs_s = xs.astype(rhos.dtype)
    y = integrand * xs_s[None, None, :]
    scales = rss * (1.0 + jnp.asarray(zs))[:, None]
    if (method == "auto" and y.dtype == jnp.float32
            and jax.default_backend() != "cpu"):
        # TPU f32-sampling fast path: step/kt folded into the static sine
        # matrix, the mass norm emitted by the SAME matmul (column 0) and
        # deferred past the resample (a per-(z,m) scalar commutes with
        # the kt-axis lerp exactly), and the pair selection run in pure
        # f32 -- no per-element f64 work on the (z,m,nkt) grid at all
        # (round-2 profile: that chain cost ~20 ms, DEVNOTES.md).
        # f32 cross-chunk accumulation: measured 2.6 ms vs 9.9 ms for the
        # f64-accumulated variant at BETTER accuracy (1.4e-7 vs 2.2e-7
        # rel-to-peak -- the chunk-add error sits below the in-chunk f32
        # floor), so the fast path now has NO f64 full-grid work at all
        uk_over_kt = _sine_dft_mixed32_scaled(y, step,
                                              mass_col=do_mass_norm,
                                              acc_dtype=jnp.float32)
        uk_res = resample_uniform_source(uk_over_kt, dkt, scales, ks)
        if do_mass_norm:
            # reciprocal-multiply: one div per (z,m) row instead of 4M
            out = uk_res * (1.0 / uk_over_kt[..., 0:1])
        else:
            out = uk_res
        return jnp.asarray(ks), out.astype(jnp.float64)

    if do_mass_norm:
        dx = jnp.diff(xs_s)
        prof = integrand * xs_s[None, None, :] ** 2
        # f64 accumulation even for f32 samples (positive-term sum)
        mnorm = jnp.sum((prof[..., 1:] + prof[..., :-1]) * dx / 2.0,
                        axis=-1, dtype=jnp.float64).astype(jnp.float64)
    else:
        mnorm = jnp.ones(rhos.shape[:-1], dtype=jnp.float64)

    ukt = sine_dft(y, step, method=method)
    kts = jnp.arange(ukt.shape[-1], dtype=jnp.float64) * dkt
    # u(kt) = ukt / kt / mnorm ; kt=0 entry is junk but never sampled
    uk = (ukt.astype(jnp.float64)
          / jnp.where(kts == 0, 1.0, kts)[None, None, :] / mnorm[..., None])

    return jnp.asarray(ks), resample_uniform_source(uk, dkt, scales, ks)
