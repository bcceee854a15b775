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


def _nfw_u_tile(s1h, s1l, s2h, s2l, c, kh, kl):
    """One (TB, TK) tile of u(k) from the split row/column inputs.

    Row inputs (TB,1): s1 = r_s(1+z) and s2 = (1+c) s1 as f64-split
    (hi, lo) f32 pairs, plus c; column inputs (1,TK): k as an (hi, lo)
    pair.  The phases x = k s1 and (1+c)x = k s2 are carried in
    double-single through the trig range reduction; everything
    phase-insensitive (Si/Ci auxiliaries, NFW assembly) is plain f32.
    """
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
    return (sx * dsi - sin_cx / x2h + cx * dci) / mc


def _nfw_uk_kernel(s1h_ref, s1l_ref, s2h_ref, s2l_ref, cs_ref,
                   kh_ref, kl_ref, out_ref):
    """One (TB, TK) tile of u(k) (see _nfw_u_tile)."""
    out_ref[:] = _nfw_u_tile(s1h_ref[:], s1l_ref[:], s2h_ref[:],
                             s2l_ref[:], cs_ref[:],
                             kh_ref[:], kl_ref[:])


def _nfw_contract_kernel(s1h_ref, s1l_ref, s2h_ref, s2l_ref, cs_ref,
                         za_ref, zb_ref, kh_ref, kl_ref,
                         out1_ref, out2_ref, acc1_ref, acc2_ref):
    """Fused u(k) + mass contraction: one row-tile's contribution to

        S1(z, k) = sum_m a_zm u^2     S2(z, k) = sum_m b_zm u

    (a = w n (m/rho)^2, b = w n b_h (m/rho) -- the 1-halo and 2-halo-leg
    mass integrands with the trapz weights folded in).  The weights
    arrive as (nzp, TB) MATRICES Za/Zb whose (z, row) entry is the
    weight if flattened row `row` belongs to redshift z and 0 otherwise
    (also 0 on padded rows), so the contraction is one MXU matmul per
    quantity -- this sidesteps Mosaic's (8, 128) output-block tiling
    rule that forbids per-z (1, TK) outputs, and the one-hot structure
    does the z-bucketing for free.  The grid is (nk_tiles, nrow_tiles)
    with rows INNERMOST: consecutive steps see the same output block,
    zeroed on the first row-tile then accumulated (the standard
    sequential-TPU-grid matmul pattern).  Emitting (z, k) directly
    removes the (B, z, m, k) HBM materialization between the u kernel
    and the mass integral (the measured ~2.9 ms/cosmology assembly cost
    at B=128, DEVNOTES round-5 attribution)."""
    u = _nfw_u_tile(s1h_ref[:], s1l_ref[:], s2h_ref[:], s2l_ref[:],
                    cs_ref[:], kh_ref[:], kl_ref[:])

    m = pl.program_id(1)

    @pl.when(m == 0)
    def _init():
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        acc2_ref[:] = jnp.zeros_like(acc2_ref)

    # VMEM scratch accumulators: accumulating straight into out_ref
    # costs an HBM read-modify-write of both (nzp, TK) blocks per grid
    # step (~1.2 GB over the serving grid -- measured, it ate most of
    # the fusion win); the scratch stays resident and the outputs are
    # written ONCE on the last row-tile.
    # HIGHEST: the f32 MXU pass decomposition -- the default precision
    # would run bf16-class and destroy the kernel's 1e-6 budget; the
    # matmuls are tiny (nzp x TB x TK) next to the transcendental work
    hi = jax.lax.Precision.HIGHEST
    acc1_ref[:] += jnp.dot(za_ref[:], u * u, precision=hi,
                           preferred_element_type=jnp.float32)
    acc2_ref[:] += jnp.dot(zb_ref[:], u, precision=hi,
                           preferred_element_type=jnp.float32)

    @pl.when(m == pl.num_programs(1) - 1)
    def _flush():
        out1_ref[:] = acc1_ref[:]
        out2_ref[:] = acc2_ref[:]


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


def nfw_contract_pallas(ks, scales_zm, cs_zm, a_zm, b_zm,
                        tb: int = 256, tk: int = 256,
                        interpret: bool = False):
    """Fused NFW u(k) + mass contraction: (S1, S2), each (nz, nk) f32.

        S1(z,k) = sum_m a_zm u(k|z,m)^2      (1-halo mass integral)
        S2(z,k) = sum_m b_zm u(k|z,m)        (2-halo leg mass integral)

    scales_zm = r_s (1+z), cs_zm = concentration, a/b = weights with
    the trapz dm weights, nzm, bias and (m/rho)-powers folded in -- all
    (nz, nm) f64.  The u tile math is identical to nfw_uk_pallas; the
    contraction happens in VMEM so the (z, m, k) cube never touches
    HBM (the serving-tier B=128 assembly cost, DEVNOTES round-5).
    """
    if not jax.config.jax_enable_x64:
        raise ValueError("nfw_contract_pallas needs jax_enable_x64 "
                         "(double-single phase splits)")
    nz, nm = cs_zm.shape
    ks = jnp.asarray(ks, jnp.float64)
    nk = ks.shape[0]
    nr = nz * nm                          # flattened (z, m) rows
    nrp = -(-nr // tb) * tb
    nkp = -(-nk // tk) * tk
    nrt = nrp // tb
    nzp = -(-nz // 8) * 8                 # Mosaic sublane multiple

    def rows(v64, const):
        v = jnp.pad(jnp.asarray(v64, jnp.float64).reshape(-1),
                    (0, nrp - nr), constant_values=const)
        h, l = _split_f32(v)
        return h[:, None], l[:, None]

    s1h, s1l = rows(scales_zm, 1.0)
    s2h, s2l = rows((1.0 + jnp.asarray(cs_zm, jnp.float64)) * scales_zm, 6.0)
    cpad = jnp.pad(jnp.asarray(cs_zm).reshape(-1), (0, nrp - nr),
                   constant_values=5.0).astype(jnp.float32)[:, None]
    # weight MATRICES: Z[z, row] = weight if row // nm == z else 0
    # (static one-hot structure; padded rows/z all zero)
    zidx = np.arange(nr) // nm            # (nr,) static
    base = np.zeros((nzp, nrp), np.float32)
    onehot = jnp.asarray(base).at[zidx, np.arange(nr)].set(1.0)
    za = onehot * jnp.pad(jnp.asarray(a_zm).reshape(-1).astype(jnp.float32),
                          (0, nrp - nr))[None, :]
    zb = onehot * jnp.pad(jnp.asarray(b_zm).reshape(-1).astype(jnp.float32),
                          (0, nrp - nr))[None, :]
    kh, kl = _split_f32(ks)
    kh = jnp.pad(kh, (0, nkp - nk), constant_values=1.0)[None, :]
    kl = jnp.pad(kl, (0, nkp - nk), constant_values=0.0)[None, :]

    with jax.enable_x64(False):
        row = pl.BlockSpec((tb, 1), lambda i, m: (m, 0),
                           memory_space=pltpu.VMEM)
        zmat = pl.BlockSpec((nzp, tb), lambda i, m: (0, m),
                            memory_space=pltpu.VMEM)
        col = pl.BlockSpec((1, tk), lambda i, m: (0, i),
                           memory_space=pltpu.VMEM)
        out = pl.BlockSpec((nzp, tk), lambda i, m: (0, i),
                           memory_space=pltpu.VMEM)
        s1o, s2o = pl.pallas_call(
            _nfw_contract_kernel,
            out_shape=(jax.ShapeDtypeStruct((nzp, nkp), jnp.float32),
                       jax.ShapeDtypeStruct((nzp, nkp), jnp.float32)),
            grid=(nkp // tk, nrt),
            in_specs=[row, row, row, row, row, zmat, zmat, col, col],
            out_specs=(out, out),
            scratch_shapes=[pltpu.VMEM((nzp, tk), jnp.float32),
                            pltpu.VMEM((nzp, tk), jnp.float32)],
            interpret=interpret,
        )(s1h, s1l, s2h, s2l, cpad, za, zb, kh, kl)
    return s1o[:nz, :nk], s2o[:nz, :nk]


# ---------------------------------------------------------------------------
# v3 "exact-ish" double-single kernel for the f64 build (round 3)
# ---------------------------------------------------------------------------
#
# The v2 kernel above holds ~1e-6 absolute on u; the remaining error is
# (i) the f32 quantization of the Clenshaw argument t, (ii) the plain-f32
# final assembly, and (iii) f32 ln(1+c)/ln x and ulp(pi/2) in the
# difference forms.  v3 removes all three: t and every assembly term are
# carried as double-single pairs, and the per-row transcendentals
# (ln(1+c), 1/(ln(1+c) - c/(1+c)), ln s) are precomputed in f64 OUTSIDE
# the kernel and passed as (hi, lo) row constants; ln x = ln k + ln s
# needs no in-kernel log at all.  The one remaining f32 limit is the
# Mosaic sin/cos intrinsic (~1e-7 of its unit amplitude), which enters u
# multiplied by the bounded Si/Ci differences -- measured end-to-end
# ~5e-8-class on u, serving the f64-exact build at <=1e-7 (VERDICT round-2
# item 3) at Pallas speed instead of emulated-f64 speed.

_PI_2_HI = np.float32(np.pi / 2.0)
_PI_2_LO = np.float32(np.pi / 2.0 - float(np.float32(np.pi / 2.0)))
_EG_HI = np.float32(_sc.EULER_GAMMA)
_EG_LO = np.float32(float(_sc.EULER_GAMMA) - float(np.float32(_sc.EULER_GAMMA)))

# t1/t2 affine maps: t = (2 clip(v, lo, hi) - (lo+hi)) / (hi-lo) with
# exact-f64 constant splits
_T1_SCALE = 1.0 / 0.15          # 1/(hi1-lo1), hi1=0.25, lo1=0.1
_T2_SCALE = 1.0 / 0.075         # 1/(hi2-lo2), hi2=0.1, lo2=0.025
_T1S_HI = np.float32(_T1_SCALE)
_T1S_LO = np.float32(_T1_SCALE - float(np.float32(_T1_SCALE)))
_T2S_HI = np.float32(_T2_SCALE)
_T2S_LO = np.float32(_T2_SCALE - float(np.float32(_T2_SCALE)))
_SIXTH_HI = np.float32(1.0 / 6.0)
_SIXTH_LO = np.float32(1.0 / 6.0 - float(np.float32(1.0 / 6.0)))

# Cody-Waite split of pi/2 (short hi word: n * _PI2_CW_HI exact, n <= 3)
_PI2_CW_HI = np.float32(1.5703125)
_PI2_CW_MID = np.float32(np.pi / 2.0 - 1.5703125)
_PI2_CW_LO = np.float32(np.pi / 2.0 - 1.5703125
                        - float(np.float32(np.pi / 2.0 - 1.5703125)))
_TWO_OVER_PI = np.float32(2.0 / np.pi)


def _sincos_series_ds(xh, xl):
    """(sin, cos) of a DS argument with |x| <= ~4 as DS PAIRS, via
    quadrant reduction + Taylor series -- no trig intrinsics, so the
    values carry ~1e-8 RELATIVE accuracy (the intrinsic's ~6e-8-of-unit
    error otherwise survives the small-mc cancellations in the NFW
    assembly)."""
    n = jnp.round(xh * _TWO_OVER_PI)
    r0 = xh - n * _PI2_CW_HI                  # exact (short hi word)
    p1, e1 = _two_prod(n, jnp.full_like(n, _PI2_CW_MID))
    rh, re = _two_sum(r0, -p1)
    rl = re - e1 - n * _PI2_CW_LO + xl
    h = rh + rl
    rh, rl = h, rl - (h - rh)
    q = rh * rh                                # f32 ample for the factors
    # sin r = r (1 - q/6 (1 - q/20 (1 - q/42 (1 - q/72))))
    sc = (q * np.float32(1.0 / 6.0)
          * (1.0 - q * np.float32(1.0 / 20.0)
             * (1.0 - q * np.float32(1.0 / 42.0)
                * (1.0 - q * np.float32(1.0 / 72.0)))))
    s = _ds_mul_ds(rh, rl, jnp.ones_like(q), -sc)
    # cos r = 1 - q/2 (1 - q/12 (1 - q/30 (1 - q/56)))
    qh, ql = _two_prod(rh, rh)
    ql = ql + 2.0 * rh * rl
    cc = (q * np.float32(1.0 / 12.0)
          * (1.0 - q * np.float32(1.0 / 30.0)
             * (1.0 - q * np.float32(1.0 / 56.0))))
    half = _ds_mul_ds(np.float32(-0.5) * qh, np.float32(-0.5) * ql,
                      jnp.ones_like(q), -cc)
    c = _ds_add(jnp.ones_like(q), jnp.zeros_like(q), half[0], half[1])
    # quadrant swap (n in [-1, 3] for x in [-0.1, 4])
    m = (n.astype(jnp.int32) % 4 + 4) % 4
    sh_ = jnp.where(m == 0, s[0], jnp.where(m == 1, c[0],
                    jnp.where(m == 2, -s[0], -c[0])))
    sl_ = jnp.where(m == 0, s[1], jnp.where(m == 1, c[1],
                    jnp.where(m == 2, -s[1], -c[1])))
    ch_ = jnp.where(m == 0, c[0], jnp.where(m == 1, -s[0],
                    jnp.where(m == 2, -c[0], s[0])))
    cl_ = jnp.where(m == 0, c[1], jnp.where(m == 1, -s[1],
                    jnp.where(m == 2, -c[1], s[1])))
    return (sh_, sl_), (ch_, cl_)


def _ds_mul_ds(ah, al, bh, bl):
    """Double-single x double-single multiply with renormalization."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    hi = p + e
    return hi, e - (hi - p)


def _ds_recip(ah, al):
    """Double-single reciprocal: f32 seed + one DS Newton step."""
    vh = 1.0 / ah
    # e = 1 - a*v  (exact-ish residual via TwoProduct)
    p, pe = _two_prod(ah, vh)
    e = (1.0 - p) - pe - al * vh
    vl = vh * e
    hi = vh + vl
    return hi, vl - (hi - vh)


def _ds_neg(ah, al):
    return -ah, -al


def _sincos_ds_pair(xh, xl):
    """sin/cos of a DS phase with the reduced argument kept in DS:
    r = CW(xh) + xl carried as (rh, rl); first-order correction removes
    the f32 representation error of r (the intrinsic's own ~1e-7 error
    remains)."""
    n = jnp.round(xh * _INV_TWO_PI)
    r0 = xh - n * _TWO_PI_HI                  # exact (see _sincos_ds)
    p1, e1 = _two_prod(n, jnp.full_like(n, _TWO_PI_MID))
    rh, re = _two_sum(r0, -p1)
    rl = re - e1 - n * _TWO_PI_LO + xl
    s = jnp.sin(rh)
    c = jnp.cos(rh)
    return s + rl * c, c - rl * s


def _sici_ds(xh, xl):
    """DS Si/Ci auxiliaries: returns (si_small pair, B pair, f pair,
    g pair, in0 mask).  Everything except the trig intrinsics is DS."""
    tiny = np.float32(1e-30)
    xh = jnp.maximum(xh, tiny)
    in0 = xh <= 4.0
    in1 = (xh > 4.0) & (xh <= 10.0)

    # u = (x/4)^2 in DS, clipped to 1
    qh, ql = xh * np.float32(0.25), xl * np.float32(0.25)
    uh, ul = _ds_mul_ds(qh, ql, qh, ql)
    over = uh > 1.0
    uh = jnp.where(over, np.float32(1.0), uh)
    ul = jnp.where(over, np.float32(0.0), ul)
    # t0 = 2u - 1 with the shift's rounding error captured (at u ~ 0 the
    # plain f32 subtract rounds to an ulp of 1, and dB/dt at the interval
    # edge amplifies that ~4x -- a measured 1e-7-class dB error)
    s0, e0 = _two_sum(2.0 * uh, np.float32(-1.0))
    t0l = e0 + 2.0 * ul
    t0h = s0 + t0l
    t0l = t0l - (t0h - s0)

    # v = 1/x in DS
    vh, vl = _ds_recip(jnp.maximum(xh, np.float32(4.0)),
                       jnp.where(xh > 4.0, xl, np.float32(0.0)))
    # t1 = (2v - 0.35) * (1/0.15); t2 = (2v - 0.125) * (1/0.075)
    lo1, hi1 = np.float32(0.1), np.float32(0.25)
    lo2, hi2 = np.float32(0.025), np.float32(0.1)
    c1h = jnp.clip(vh, lo1, hi1)
    c1l = jnp.where((vh > lo1) & (vh < hi1), vl, np.float32(0.0))
    c2h = jnp.clip(vh, lo2, hi2)
    c2l = jnp.where((vh > lo2) & (vh < hi2), vl, np.float32(0.0))
    a1h, a1l = _ds_add(2.0 * c1h, 2.0 * c1l, np.float32(-0.35), 0.0 * c1h)
    t1h, t1l = _ds_mul_ds(a1h, a1l, jnp.full_like(a1h, _T1S_HI),
                          jnp.full_like(a1h, _T1S_LO))
    a2h, a2l = _ds_add(2.0 * c2h, 2.0 * c2l, np.float32(-0.125), 0.0 * c2h)
    t2h, t2l = _ds_mul_ds(a2h, a2l, jnp.full_like(a2h, _T2S_HI),
                          jnp.full_like(a2h, _T2S_LO))

    th = jnp.where(in0, t0h, jnp.where(in1, t1h, t2h))
    tl = jnp.where(in0, t0l, jnp.where(in1, t1l, t2l))
    t2xh, t2xl = 2.0 * th, 2.0 * tl

    z = jnp.zeros_like(th)
    a0h, a0l, a1h_, a1l_ = z, z, z, z
    b0h, b0l, b1h_, b1l_ = z, z, z, z
    for k in range(_NCOEF - 1, -1, -1):
        cAh = jnp.where(in0, _A0[k], jnp.where(in1, _A1[k], _A2[k]))
        cAl = jnp.where(in0, _A0L[k], jnp.where(in1, _A1L[k], _A2L[k]))
        cBh = jnp.where(in0, _B0[k], jnp.where(in1, _B1[k], _B2[k]))
        cBl = jnp.where(in0, _B0L[k], jnp.where(in1, _B1L[k], _B2L[k]))
        mh, ml = _ds_mul_ds(a0h, a0l, t2xh, t2xl)
        sh_, sl_ = _ds_add(mh, ml, -a1h_, -a1l_)
        na0h, na0l = _ds_add(sh_, sl_, cAh, cAl)
        a0h, a0l, a1h_, a1l_ = na0h, na0l, a0h, a0l
        mh, ml = _ds_mul_ds(b0h, b0l, t2xh, t2xl)
        sh_, sl_ = _ds_add(mh, ml, -b1h_, -b1l_)
        nb0h, nb0l = _ds_add(sh_, sl_, cBh, cBl)
        b0h, b0l, b1h_, b1l_ = nb0h, nb0l, b0h, b0l
    mh, ml = _ds_mul_ds(a1h_, a1l_, th, tl)
    Ah, Al = _ds_add(a0h, a0l, -mh, -ml)
    mh, ml = _ds_mul_ds(b1h_, b1l_, th, tl)
    Bh, Bl = _ds_add(b0h, b0l, -mh, -ml)

    # si_small = x * A (DS)
    sish, sisl = _ds_mul_ds(xh, xl, Ah, Al)

    # mid-range f = A v, g = B v^2 (DS)
    fmh, fml = _ds_mul_ds(Ah, Al, vh, vl)
    v2h, v2l = _ds_mul_ds(vh, vl, vh, vl)
    gmh, gml = _ds_mul_ds(Bh, Bl, v2h, v2l)

    # asymptotic tail (x > 40): plain f32 is ample (f ~ 1/x <= 0.025,
    # series truncation ~1e-9)
    xa = jnp.maximum(xh, np.float32(40.0))
    y = 1.0 / (xa * xa)
    fa = jnp.zeros_like(y)
    ga = jnp.zeros_like(y)
    for cc in _F_ASY[::-1]:
        fa = fa * y + cc
    for cc in _G_ASY[::-1]:
        ga = ga * y + cc
    asy = xh > 40.0
    fh = jnp.where(asy, fa / xa, fmh)
    fl = jnp.where(asy, np.float32(0.0), fml)
    gh = jnp.where(asy, ga * y, gmh)
    gl = jnp.where(asy, np.float32(0.0), gml)
    return (sish, sisl), (Bh, Bl), (fh, fl), (gh, gl), in0


def _ds_fg_combo(f, g, s, c):
    """f*c + g*s as a DS pair (f, g DS; s, c f32 trig values)."""
    p1h, p1l = _ds_mul_f32(f[0], f[1], c)
    p2h, p2l = _ds_mul_f32(g[0], g[1], s)
    return _ds_add(p1h, p1l, p2h, p2l)


def _nfw_uk_kernel_ds(s1h_ref, s1l_ref, s2h_ref, s2l_ref,
                      lp1h_ref, lp1l_ref, imch_ref, imcl_ref,
                      ls1h_ref, ls1l_ref, cc1h_ref, cc1l_ref,
                      kh_ref, kl_ref, lkh_ref, lkl_ref, out_ref):
    """v3 tile: all difference forms and the assembly in double-single.

    Rows: s1 = r_s(1+z), s2 = (1+c)s1, ln(1+c), 1/mc, ln s1, c/(1+c) --
    each as (hi, lo) f32 pairs precomputed in f64.  Cols: k, ln k pairs.
    """
    out_ref[:] = _nfw_uk_ds_math(
        s1h_ref[:], s1l_ref[:], s2h_ref[:], s2l_ref[:],
        lp1h_ref[:], lp1l_ref[:], imch_ref[:], imcl_ref[:],
        ls1h_ref[:], ls1l_ref[:], cc1h_ref[:], cc1l_ref[:],
        kh_ref[:], kl_ref[:], lkh_ref[:], lkl_ref[:])


def _nfw_uk_ds_math(s1h, s1l, s2h, s2l, lp1h, lp1l, imch, imcl,
                    ls1h, ls1l, cc1h, cc1l, kh, kl, lkh, lkl):
    """Pure-jnp v3 math (shared by the Pallas tile and the CPU tests)."""
    xh, xl = _ds_phase(kh, kl, s1h, s1l)
    x2h, x2l = _ds_phase(kh, kl, s2h, s2l)
    sx_p, cx_p = _sincos_series_ds(xh, xl)
    sx2_p, cx2_p = _sincos_series_ds(x2h, x2l)
    sx, cx = sx_p[0] + sx_p[1], cx_p[0] + cx_p[1]
    sx2, cx2 = sx2_p[0] + sx2_p[1], cx2_p[0] + cx2_p[1]
    si1, B1, f1, g1, in0_1 = _sici_ds(xh, xl)
    si2, B2, f2, g2, in0_2 = _sici_ds(x2h, x2l)

    # sin(cx) = sx2 cx - cx2 sx in DS
    p1h, p1l = _two_prod(sx2, cx)
    p2h, p2l = _two_prod(cx2, sx)
    sch, scl = _ds_add(p1h, p1l, -p2h, -p2l)

    # dsi = Si(x2) - Si(x), three regimes all in DS:
    #   both small:  si2_small - si1_small
    #   both large:  (f1 cx + g1 sx) - (f2 cx2 + g2 sx2)
    #   straddle  :  [pi/2 - f2 cx2 - g2 sx2] - si1_small
    d_sm = _ds_add(si2[0], si2[1], -si1[0], -si1[1])
    a1 = _ds_fg_combo(f1, g1, sx, cx)      # f1 cx + g1 sx
    a2 = _ds_fg_combo(f2, g2, sx2, cx2)    # f2 cx2 + g2 sx2
    d_lg = _ds_add(a1[0], a1[1], -a2[0], -a2[1])
    st0 = _ds_add(jnp.full_like(a2[0], _PI_2_HI),
                  jnp.full_like(a2[0], _PI_2_LO), -a2[0], -a2[1])
    d_st = _ds_add(st0[0], st0[1], -si1[0], -si1[1])
    dsih = jnp.where(in0_2, d_sm[0], jnp.where(in0_1, d_st[0], d_lg[0]))
    dsil = jnp.where(in0_2, d_sm[1], jnp.where(in0_1, d_st[1], d_lg[1]))

    # dci = Ci(x2) - Ci(x):
    #   both small:  ln(1+c) + (B2 - B1)
    #   both large:  (f2 sx2 - g2 cx2) - (f1 sx - g1 cx)
    #   straddle  :  (f2 sx2 - g2 cx2) - (EG + ln k + ln s1 + B1)
    dB = _ds_add(B2[0], B2[1], -B1[0], -B1[1])
    c_sm = _ds_add(lp1h, lp1l, dB[0], dB[1])
    q1 = _ds_fg_combo(_ds_neg(*g1), f1, sx, cx)    # f1 sx - g1 cx
    q2 = _ds_fg_combo(_ds_neg(*g2), f2, sx2, cx2)  # f2 sx2 - g2 cx2
    c_lg = _ds_add(q2[0], q2[1], -q1[0], -q1[1])
    lnx = _ds_add(lkh, lkl, ls1h, ls1l)
    eg_ln = _ds_add(jnp.full_like(lnx[0], _EG_HI),
                    jnp.full_like(lnx[0], _EG_LO), lnx[0], lnx[1])
    ci1_sm = _ds_add(eg_ln[0], eg_ln[1], B1[0], B1[1])
    c_st = _ds_add(q2[0], q2[1], -ci1_sm[0], -ci1_sm[1])
    dcih = jnp.where(in0_2, c_sm[0], jnp.where(in0_1, c_st[0], c_lg[0]))
    dcil = jnp.where(in0_2, c_sm[1], jnp.where(in0_1, c_st[1], c_lg[1]))

    # u = (sx dsi - sin_cx / x2 + cx dci) / mc   (all DS)
    u1 = _ds_mul_f32(dsih, dsil, sx)
    u2h, u2l = _ds_recip(x2h, x2l)
    u2 = _ds_mul_ds(sch, scl, u2h, u2l)
    u3 = _ds_mul_f32(dcih, dcil, cx)
    acc = _ds_add(u1[0], u1[1], -u2[0], -u2[1])
    acc = _ds_add(acc[0], acc[1], u3[0], u3[1])

    # Refined near-unity region (both args in the series branch AND
    # x < 0.15): u mc cancels toward mc, so the plain assembly's f32
    # trig-VALUE rounding (~6e-8 against O(1) partners) is amplified by
    # 1/mc.  Exact rewrite
    #   u mc = mc + ln(1+c)(cos x - 1) - (c/(1+c)) sincm1(cx)
    #          + sx dsi + cx (B2 - B1)
    # using the identities sin(cx)/x2 = (c/(1+c)) sin(y)/y with
    # y = cx = x2 - x (a DS subtraction of the DS phases) and
    # sincm1(y) = sin(y)/y - 1; cos x - 1 and sincm1 come from DS-leading
    # Taylor forms (f32 correction factors carried as (1, -small) pairs),
    # so every term is small and relatively accurate -- worst case
    # ~1e-8-class in this region instead of ~7e-7.
    near = in0_2
    # cos x - 1 recovered from the series-DS cos pair (exact TwoSum vs 1)
    cm1 = _ds_add(cx_p[0], cx_p[1], jnp.full_like(cx, -1.0),
                  jnp.zeros_like(cx))
    # y = cx and sincm1(y) = sin(y)/y - 1: Taylor below y = 0.5, else the
    # series-DS sin (no intrinsic) in the cancellation-free form
    yh, yl = _ds_add(x2h, x2l, -xh, -xl)
    qyh, qyl = _ds_mul_ds(yh, yl, yh, yl)
    sy_corr = (qyh * np.float32(1.0 / 20.0)
               * (1.0 - qyh * np.float32(1.0 / 42.0)
                  * (1.0 - qyh * np.float32(1.0 / 72.0))))
    leady = _ds_mul_ds(qyh, qyl, jnp.full_like(qyh, -_SIXTH_HI),
                       jnp.full_like(qyh, -_SIXTH_LO))
    s_ser = _ds_mul_ds(leady[0], leady[1], jnp.ones_like(qyh), -sy_corr)
    sy_p, _cy_p = _sincos_series_ds(yh, yl)
    num = _ds_add(sy_p[0], sy_p[1], -yh, -yl)
    iy = _ds_recip(jnp.maximum(yh, np.float32(0.25)), yl)
    s_int = _ds_mul_ds(num[0], num[1], iy[0], iy[1])
    smh = jnp.where(qyh < 0.25, s_ser[0], s_int[0])
    sml = jnp.where(qyh < 0.25, s_ser[1], s_int[1])
    br = _ds_mul_ds(cc1h, cc1l, smh, sml)
    mc_ds = _ds_add(lp1h, lp1l, -cc1h, -cc1l)             # mc as DS
    t_a = _ds_mul_ds(lp1h, lp1l, cm1[0], cm1[1])          # ln1pc (cx-1)
    # u1/dB terms with the SERIES-DS sin x / cos x pairs (a collapsed-f32
    # trig value's ~6e-8 rounding would survive the 1/mc amplification)
    u1n = _ds_mul_ds(dsih, dsil, sx_p[0], sx_p[1])
    dBc = _ds_mul_ds(dB[0], dB[1], cx_p[0], cx_p[1])
    accn = _ds_add(mc_ds[0], mc_ds[1], t_a[0], t_a[1])
    accn = _ds_add(accn[0], accn[1], -br[0], -br[1])
    accn = _ds_add(accn[0], accn[1], u1n[0], u1n[1])
    accn = _ds_add(accn[0], accn[1], dBc[0], dBc[1])
    acch = jnp.where(near, accn[0], acc[0])
    accl = jnp.where(near, accn[1], acc[1])

    out = _ds_mul_ds(acch, accl, imch, imcl)
    return out[0] + out[1]


def nfw_uk_pallas_ds(ks, scales, cs, tb: int = 256, tk: int = 128,
                     interpret: bool = False):
    """v3 exact-ish NFW u(k): DS everywhere except the trig intrinsics.

    Same contract as nfw_uk_pallas; tiles default to (256, 128) -- the DS
    state roughly doubles VMEM pressure vs v2's (256, 256) budget.
    """
    if not jax.config.jax_enable_x64:
        raise ValueError("nfw_uk_pallas_ds needs jax_enable_x64 for its "
                         "double-single splits")
    ks = jnp.asarray(ks, jnp.float64)
    scales = jnp.asarray(scales, jnp.float64).reshape(-1)
    cs64 = jnp.asarray(cs, jnp.float64).reshape(-1)
    B, nk = scales.shape[0], ks.shape[0]
    Bp = -(-B // tb) * tb
    nkp = -(-nk // tk) * tk

    ln1pc = jnp.log1p(cs64)
    mc = ln1pc - cs64 / (1.0 + cs64)
    inv_mc = 1.0 / mc
    ln_s1 = jnp.log(scales)
    ln_k = jnp.log(ks)

    def padb(v, const):
        return jnp.pad(v, (0, Bp - B), constant_values=const)[:, None]

    def padk(v, const):
        return jnp.pad(v, (0, nkp - nk), constant_values=const)[None, :]

    def pair_b(v64, const):
        h, l = _split_f32(v64)
        return padb(h, const), padb(l, 0.0)

    def pair_k(v64, const):
        h, l = _split_f32(v64)
        return padk(h, const), padk(l, 0.0)

    args = (*pair_b(scales, 1.0), *pair_b((1.0 + cs64) * scales, 6.0),
            *pair_b(ln1pc, 1.0), *pair_b(inv_mc, 1.0),
            *pair_b(ln_s1, 0.0), *pair_b(cs64 / (1.0 + cs64), 0.5),
            *pair_k(ks, 1.0), *pair_k(ln_k, 0.0))

    with jax.enable_x64(False):
        row = pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
        col = pl.BlockSpec((1, tk), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _nfw_uk_kernel_ds,
            out_shape=jax.ShapeDtypeStruct((Bp, nkp), jnp.float32),
            grid=(Bp // tb, nkp // tk),
            in_specs=[row] * 12 + [col] * 4,
            out_specs=pl.BlockSpec((tb, tk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)
    return out[:B, :nk]


def nfw_uk_fast_ds(ks, zs, cs, rss, **kw):
    """Drop-in v3 variant of profiles.nfw_uk_analytic: (nz,nm,nk) f32,
    ~5e-8-class absolute on u (the f64-exact-build fast path)."""
    nz, nm = cs.shape
    scales = (rss * (1.0 + jnp.asarray(zs)[:, None])).reshape(-1)
    out = nfw_uk_pallas_ds(ks, scales, cs.reshape(-1), **kw)
    return out.reshape(nz, nm, -1)
