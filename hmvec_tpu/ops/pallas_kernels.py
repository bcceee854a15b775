"""Pallas TPU kernels: fused analytic-NFW u(k) fast path.

The f64 XLA path (models/profiles.nfw_uk_analytic) is exact but runs on the
emulated double-single pipeline; its long Clenshaw dependency chains also
materialize (z,m,k)-sized temporaries in HBM.  This kernel computes the
whole profile -- trig range reduction, Si/Ci auxiliaries, NFW assembly --
in f32 inside VMEM tiles: one HBM read of the inputs, one write of u(k).

Accuracy: ~1.5e-6 worst-case absolute on u (adversarial sweep over
c in [1.2, 30], r_s to 3, k to 100, z to 3; typical grids ~6e-7); end-to-end Pmm/Pgg/Pgm hold
~1e-6 relative vs the f64 twin.  Three mechanisms carry the precision on
pure-f32 hardware:
  * phases x = k r_s (1+z) (up to ~1e3) in double-single -- Dekker
    TwoProduct of f64-split factors, Cody-Waite on the hi word;
  * double-single Clenshaw for the Si/Ci Chebyshev sums (plain f32
    recurrences accumulate ~1e-5) with hi/lo coefficient tables;
  * DIFFERENCE-form assembly: Si((1+c)x)-Si(x) via the auxiliary
    functions (both Si ~ pi/2 at large x) and Ci((1+c)x)-Ci(x) via
    ln(1+c) (both Ci ~ ln x at tiny x), dodging the f32 ulp of the large
    constants.
The exact f64 XLA path remains the default (fast=False).

Pallas TPU has no f64 (Mosaic), hence the f32 design.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _sici_coeffs as _sc
from .sine_transform import _split_hi_lo as _split_f32

_EULER_GAMMA = np.float32(_sc.EULER_GAMMA)

# Cody-Waite split of 2*pi into exactly-representable f32 pieces
_TWO_PI_HI = np.float32(6.28125)
_TWO_PI_MID = np.float32(6.28318530717958647692 - 6.28125)
_TWO_PI_LO = np.float32(6.28318530717958647692 - 6.28125
                        - float(np.float32(6.28318530717958647692 - 6.28125)))
_INV_TWO_PI = np.float32(1.0 / (2.0 * np.pi))

# f32 hi/lo splits of the unified sici tables (degree 24 is overkill for
# f32; keep 16 terms, truncation < 1e-9).  The lo parts feed the
# double-single Clenshaw -- plain f32 Clenshaw accumulates ~1e-5 here.
_NCOEF = 16


def _split_table(t64):
    hi = t64[:_NCOEF].astype(np.float32)
    lo = (t64[:_NCOEF] - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


_A0, _A0L = _split_table(_sc.SICI_A0)
_A1, _A1L = _split_table(_sc.SICI_A1)
_A2, _A2L = _split_table(_sc.SICI_A2)
_B0, _B0L = _split_table(_sc.SICI_B0)
_B1, _B1L = _split_table(_sc.SICI_B1)
_B2, _B2L = _split_table(_sc.SICI_B2)
import math as _math  # noqa: E402

# short asymptotic tails (7 terms is past f32 resolution at x>40)
_F_ASY = np.array([(-1.0) ** i * _math.factorial(2 * i) for i in range(7)],
                  dtype=np.float32)
_G_ASY = np.array([(-1.0) ** i * _math.factorial(2 * i + 1) for i in range(7)],
                  dtype=np.float32)


_LN2_HI = np.float32(0.6931471824645996)   # exactly representable upper bits
_LN2_LO = np.float32(np.log(2.0) - 0.6931471824645996)
_SQRT2 = np.float32(np.sqrt(2.0))


def _log_f32(x):
    """Accurate f32 ln(x) for x > 0 (Mosaic's log intrinsic errs ~1e-4).

    Exponent/mantissa split by bit manipulation + atanh-series for the
    mantissa: max abs err ~1e-7.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    f = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32)  # f in [1, 2)
    big = f > _SQRT2
    f = jnp.where(big, f * np.float32(0.5), f)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    s = (f - 1.0) / (f + 1.0)
    s2 = s * s
    lnf = 2.0 * s * (1.0 + s2 * (np.float32(1.0 / 3.0)
                                 + s2 * (np.float32(0.2)
                                         + s2 * (np.float32(1.0 / 7.0)
                                                 + s2 * np.float32(1.0 / 9.0)))))
    return e * _LN2_HI + (lnf + e * _LN2_LO)


_SPLIT_MASK = np.int32(np.uint32(0xFFFFF000))  # keep 12 mantissa bits


def _two_prod(a, b):
    """Dekker TwoProduct without FMA: p = fl(a*b) and its exact rounding
    error, via 12-bit mantissa splits (12x12-bit products are exact in
    f32)."""
    ah = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(a, jnp.int32) & _SPLIT_MASK,
        jnp.float32)
    al = a - ah
    bh = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(b, jnp.int32) & _SPLIT_MASK,
        jnp.float32)
    bl = b - bh
    p = a * b
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _ds_phase(kh, kl, sh, sl):
    """x = k * s as a double-single (hi, lo) pair from hi/lo factor pairs.

    The phase reaches ~1e3 here, so a plain f32 product costs ~|x| * eps
    ~ 5e-5 absolute in the trig arguments -- the dominant error of the
    original all-f32 kernel.  TwoProduct + cross terms keep it ~1e-7."""
    p, e = _two_prod(kh, sh)
    return p, e + kh * sl + kl * sh


def _sincos_ds(xh, xl):
    """sin/cos of a double-single phase: Cody-Waite on the hi word, lo
    word folded into the reduced argument."""
    n = jnp.round(xh * _INV_TWO_PI)
    r = (((xh - n * _TWO_PI_HI) - n * _TWO_PI_MID) - n * _TWO_PI_LO) + xl
    return jnp.sin(r), jnp.cos(r)


def _two_sum(a, b):
    """Knuth TwoSum: s = fl(a+b) and its exact rounding error."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _ds_add(ah, al, bh, bl):
    """Double-single addition with renormalization."""
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    hi = s + e
    return hi, e - (hi - s)


def _ds_mul_f32(ah, al, b):
    """Double-single * f32 with renormalization."""
    p, e = _two_prod(ah, b)
    e = e + al * b
    hi = p + e
    return hi, e - (hi - p)


def _sici_f32(x, sinx, cosx):
    """f32 Si/Ci with precomputed trig (mirrors special.sici_with_trig)."""
    xs = jnp.maximum(x, np.float32(1e-30))
    in0 = xs <= 4.0
    in1 = (xs > 4.0) & (xs <= 10.0)

    u = jnp.minimum((xs * np.float32(0.25)) ** 2, np.float32(1.0))
    t0 = 2.0 * u - 1.0
    v = 1.0 / jnp.maximum(xs, np.float32(4.0))
    lo1, hi1 = np.float32(0.1), np.float32(0.25)
    lo2, hi2 = np.float32(0.025), np.float32(0.1)
    t1 = (2.0 * jnp.clip(v, lo1, hi1) - (lo1 + hi1)) / (hi1 - lo1)
    t2 = (2.0 * jnp.clip(v, lo2, hi2) - (lo2 + hi2)) / (hi2 - lo2)
    t = jnp.where(in0, t0, jnp.where(in1, t1, t2))

    # Double-single Clenshaw: the plain-f32 recurrence accumulates
    # ~16 steps * eps * |intermediates| ~ 1e-5 -- the dominant error of
    # the v1 kernel.  DS state + hi/lo coefficient tables hold ~1e-7.
    z = jnp.zeros_like(t)
    a0h, a0l, a1h, a1l = z, z, z, z
    b0h, b0l, b1h, b1l = z, z, z, z
    t2x = 2.0 * t
    for k in range(_NCOEF - 1, -1, -1):
        cAh = jnp.where(in0, _A0[k], jnp.where(in1, _A1[k], _A2[k]))
        cAl = jnp.where(in0, _A0L[k], jnp.where(in1, _A1L[k], _A2L[k]))
        cBh = jnp.where(in0, _B0[k], jnp.where(in1, _B1[k], _B2[k]))
        cBl = jnp.where(in0, _B0L[k], jnp.where(in1, _B1L[k], _B2L[k]))
        mh, ml = _ds_mul_f32(a0h, a0l, t2x)
        sh_, sl_ = _ds_add(mh, ml, -a1h, -a1l)
        na0h, na0l = _ds_add(sh_, sl_, cAh, cAl)
        a0h, a0l, a1h, a1l = na0h, na0l, a0h, a0l
        mh, ml = _ds_mul_f32(b0h, b0l, t2x)
        sh_, sl_ = _ds_add(mh, ml, -b1h, -b1l)
        nb0h, nb0l = _ds_add(sh_, sl_, cBh, cBl)
        b0h, b0l, b1h, b1l = nb0h, nb0l, b0h, b0l
    mh, ml = _ds_mul_f32(a1h, a1l, t)
    Ah, Al = _ds_add(a0h, a0l, -mh, -ml)
    A = Ah + Al
    mh, ml = _ds_mul_f32(b1h, b1l, t)
    Bh, Bl = _ds_add(b0h, b0l, -mh, -ml)
    B = Bh + Bl

    si_small = xs * A
    ci_small = _EULER_GAMMA + _log_f32(xs) + B
    f_mid = A * v
    g_mid = B * v * v

    xl = jnp.maximum(xs, np.float32(40.0))
    y = 1.0 / (xl * xl)
    fa = jnp.zeros_like(y)
    ga = jnp.zeros_like(y)
    for c in _F_ASY[::-1]:
        fa = fa * y + c
    for c in _G_ASY[::-1]:
        ga = ga * y + c
    f_asy = fa / xl
    g_asy = ga * y

    f = jnp.where(xs > 40.0, f_asy, f_mid)
    g = jnp.where(xs > 40.0, g_asy, g_mid)
    si_large = np.float32(np.pi / 2.0) - f * cosx - g * sinx
    ci_large = f * sinx - g * cosx
    # B, f, g and the small-branch mask are also returned so callers can
    # form Si/Ci DIFFERENCES without the catastrophic constants: Si pairs
    # both ~pi/2 at large x (difference ~1/x but f32 ulp(pi/2) ~ 1.2e-7),
    # Ci pairs both ~ln x at tiny x (see _nfw_uk_kernel)
    return (jnp.where(in0, si_small, si_large),
            jnp.where(in0, ci_small, ci_large), B, f, g, in0)


def _nfw_uk_kernel(s1h_ref, s1l_ref, s2h_ref, s2l_ref, cs_ref,
                   kh_ref, kl_ref, out_ref):
    """One (TB, TK) tile of u(k).

    Row inputs (TB,1): s1 = r_s(1+z) and s2 = (1+c) s1 as f64-split
    (hi, lo) f32 pairs, plus c; column inputs (1,TK): k as an (hi, lo)
    pair.  The phases x = k s1 and (1+c)x = k s2 are carried in
    double-single through the trig range reduction; everything
    phase-insensitive (Si/Ci auxiliaries, NFW assembly) is plain f32.
    """
    s1h, s1l = s1h_ref[:], s1l_ref[:]     # (TB, 1)
    s2h, s2l = s2h_ref[:], s2l_ref[:]
    c = cs_ref[:]
    kh, kl = kh_ref[:], kl_ref[:]         # (1, TK)
    xh, xl = _ds_phase(kh, kl, s1h, s1l)  # (TB, TK)
    x2h, x2l = _ds_phase(kh, kl, s2h, s2l)
    sx, cx = _sincos_ds(xh, xl)
    sx2, cx2 = _sincos_ds(x2h, x2l)
    si, ci, B1, f1, g1, in0_1 = _sici_f32(xh, sx, cx)
    sic, cic, B2, f2, g2, in0_2 = _sici_f32(x2h, sx2, cx2)
    sin_cx = sx2 * cx - cx2 * sx
    ln1pc = _log_f32(1.0 + c)
    # Ci difference: when both args are in the series branch (x2 <= 4
    # implies x <= 4), ln x2 - ln x = ln(1+c) exactly -- avoids the ~1e-6
    # quantization of the individually-large ci values at tiny x
    dci = jnp.where(in0_2, ln1pc + (B2 - B1), cic - ci)
    # Si difference: when both args are in the auxiliary branch (x > 4
    # implies x2 > 4), cancel the pi/2 constants analytically -- the
    # difference is ~1/x while ulp(pi/2) alone is 1.2e-7
    dsi_large = (f1 * cx + g1 * sx) - (f2 * cx2 + g2 * sx2)
    dsi = jnp.where(in0_1, sic - si, dsi_large)
    mc = ln1pc - c / (1.0 + c)
    out_ref[:] = (sx * dsi - sin_cx / x2h + cx * dci) / mc


def nfw_uk_pallas(ks, scales, cs, tb: int = 256, tk: int = 256,
                  interpret: bool = False):
    # tile budget: the DS-Clenshaw state (~36 live (tb, tk) f32 arrays)
    # hits the 16M VMEM scoped limit at (256, 512) -- (256, 256) fits
    # with ~7M headroom
    """Fast-path NFW u(k|z,m) on the (batch, k) grid.

    ks: (nk,) wavenumbers; scales: (B,) r_s(1+z); cs: (B,) concentration
    (f64 in, split host/XLA-side into hi/lo f32 pairs for the
    double-single phase computation).  Returns (B, nk) f32.  Pads to tile
    multiples internally.
    """
    if not jax.config.jax_enable_x64:
        # the hi/lo splits silently collapse to lo=0 without x64, quietly
        # degrading the kernel ~50x below its documented accuracy
        raise ValueError(
            "nfw_uk_pallas needs jax_enable_x64 for its double-single "
            "phase splits; with the HMVEC_TPU_NO_X64 opt-out use the "
            "plain f64->f32 cast path (fast=False).")
    ks = jnp.asarray(ks, jnp.float64)
    scales = jnp.asarray(scales, jnp.float64).reshape(-1)
    cs64 = jnp.asarray(cs, jnp.float64).reshape(-1)
    B, nk = scales.shape[0], ks.shape[0]
    Bp = -(-B // tb) * tb
    nkp = -(-nk // tk) * tk

    def padb(v, const):
        return jnp.pad(v, (0, Bp - B), constant_values=const)[:, None]

    def padk(v, const):
        return jnp.pad(v, (0, nkp - nk), constant_values=const)[None, :]

    s1h, s1l = _split_f32(scales)
    s2h, s2l = _split_f32((1.0 + cs64) * scales)
    kh, kl = _split_f32(ks)
    args = (padb(s1h, 1.0), padb(s1l, 0.0),
            padb(s2h, 6.0), padb(s2l, 0.0),
            padb(cs64.astype(jnp.float32), 5.0),
            padk(kh, 1.0), padk(kl, 0.0))

    # x64 mode promotes index-map literals to i64, which Mosaic rejects;
    # the kernel is pure f32/i32, so scope x64 off around the call.
    with jax.enable_x64(False):
        row = pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
        col = pl.BlockSpec((1, tk), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _nfw_uk_kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, nkp), jnp.float32),
            grid=(Bp // tb, nkp // tk),
            in_specs=[row, row, row, row, row, col, col],
            out_specs=pl.BlockSpec((tb, tk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)
    return out[:B, :nk]


def nfw_uk_fast(ks, zs, cs, rss, **kw):
    """Drop-in fast-mode variant of profiles.nfw_uk_analytic: (nz,nm,nk) f32."""
    nz, nm = cs.shape
    scales = (rss * (1.0 + jnp.asarray(zs)[:, None])).reshape(-1)
    out = nfw_uk_pallas(ks, scales, cs.reshape(-1), **kw)
    return out.reshape(nz, nm, -1)
