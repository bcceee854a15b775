"""Pallas TPU kernel for the profile-transform resample pair selection.

The resample step of the batched profile transform (ops/sine_transform.py,
replacing the reference's _interp_loop, fft.py:97-115) needs, per (z, m)
row and target wavenumber, the two source samples u[i0], u[i0+1] at a
data-dependent index i0.  XLA lowers that to elementwise dynamic gathers
which cost ~25 ns/element on this TPU (~230 ms for the BASELINE config-2
grid) regardless of dtype or slice packing -- measured in
tools/microbench_resample.py.

This kernel instead keeps each source row resident in VMEM and extracts
the pair with one-hot mask reductions over 128-lane chunks:

    u0[t] = sum_j (j == i0[t]) * u[j],   u1[t] = sum_j (j == i0[t]+1) * u[j]

a pure VPU multiply-accumulate with NO dynamic addressing.  Because i0 is
monotone over the (log-spaced) targets of a tile, the kernel only loops
over the chunk window [min(i0)//128, (max(i0)+1)//128] actually touched --
typically 2-4 of the ~17 chunks.

f64 accuracy: Mosaic has no f64, so the caller splits u into the
double-single pair (hi = f32(u), lo = f32(u - hi)); the kernel selects all
four (u0/u1 x hi/lo) components with EXACT {0,1} masks (sums hit exactly
one nonzero term, so f32 accumulation is exact), and the caller reassembles
hi + lo in f64.  The hi/lo pair keeps ~49 of the 53 mantissa bits of an
IEEE f64, so the reassembly agrees with the XLA two-gather path to ~1e-15
relative (far inside the 2e-8 f64 gate) rather than bit-identically.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_RB = 8          # batch rows per program
_TK = 128        # targets per program


def _select_pair_kernel(uh_ref, ul_ref, i0_ref,
                        o0h_ref, o0l_ref, o1h_ref, o1l_ref):
    i0 = i0_ref[:]                                   # (RB, TK) int32
    rb, tk = i0.shape
    cmin = jnp.min(i0) // _LANE
    cmax = (jnp.max(i0) + 1) // _LANE
    jlane = jax.lax.broadcasted_iota(jnp.int32, (rb, tk, _LANE), 2)
    i0b = i0[:, :, None]

    def body(c, accs):
        a0h, a0l, a1h, a1l = accs
        base = pl.multiple_of(c * _LANE, _LANE)
        jj = jlane + base
        m0 = (jj == i0b).astype(jnp.float32)         # (RB, TK, LANE)
        m1 = (jj == i0b + 1).astype(jnp.float32)
        uh = uh_ref[:, pl.ds(base, _LANE)][:, None, :]
        ul = ul_ref[:, pl.ds(base, _LANE)][:, None, :]
        a0h = a0h + jnp.sum(m0 * uh, axis=-1)
        a0l = a0l + jnp.sum(m0 * ul, axis=-1)
        a1h = a1h + jnp.sum(m1 * uh, axis=-1)
        a1l = a1l + jnp.sum(m1 * ul, axis=-1)
        return a0h, a0l, a1h, a1l

    z = jnp.zeros((rb, tk), jnp.float32)
    a0h, a0l, a1h, a1l = jax.lax.fori_loop(cmin, cmax + 1, body,
                                           (z, z, z, z))
    o0h_ref[:] = a0h
    o0l_ref[:] = a0l
    o1h_ref[:] = a1h
    o1l_ref[:] = a1l


def _select_pair_kernel_f32(uh_ref, i0_ref, o0_ref, o1_ref):
    """f32-only variant: half the mask MACs of the hi/lo kernel (used by
    the mixed32 fast path, whose ~1e-7-class accuracy budget does not
    need the double-single selection)."""
    i0 = i0_ref[:]
    rb, tk = i0.shape
    cmin = jnp.min(i0) // _LANE
    cmax = (jnp.max(i0) + 1) // _LANE
    jlane = jax.lax.broadcasted_iota(jnp.int32, (rb, tk, _LANE), 2)
    i0b = i0[:, :, None]

    def body(c, accs):
        a0, a1 = accs
        base = pl.multiple_of(c * _LANE, _LANE)
        jj = jlane + base
        m0 = (jj == i0b).astype(jnp.float32)
        m1 = (jj == i0b + 1).astype(jnp.float32)
        uh = uh_ref[:, pl.ds(base, _LANE)][:, None, :]
        a0 = a0 + jnp.sum(m0 * uh, axis=-1)
        a1 = a1 + jnp.sum(m1 * uh, axis=-1)
        return a0, a1

    z = jnp.zeros((rb, tk), jnp.float32)
    a0, a1 = jax.lax.fori_loop(cmin, cmax + 1, body, (z, z))
    o0_ref[:] = a0
    o1_ref[:] = a1


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def select_pairs(u, i0, interpret: bool = False):
    """u0 = u[..., i0], u1 = u[..., i0+1] selected per batch row.

    u: (..., nkt) f64 (or f32); i0: (..., nk) int32 with values in
    [0, nkt-2].  Returns (u0, u1) with i0's shape and u's dtype.
    """
    batch = u.shape[:-1]
    nkt = u.shape[-1]
    nk = i0.shape[-1]
    B = int(np.prod(batch)) if batch else 1
    uf = u.reshape(B, nkt)
    i0f = i0.reshape(B, nk).astype(jnp.int32)

    Bp = _round_up(max(B, 1), _RB)
    nkp = _round_up(max(nk, 1), _TK)
    nktp = _round_up(nkt + 1, _LANE)

    f64_in = uf.dtype == jnp.float64
    uh = uf.astype(jnp.float32)
    if f64_in:
        ul = (uf - uh.astype(jnp.float64)).astype(jnp.float32)
        ul = jnp.pad(ul, ((0, Bp - B), (0, nktp - nkt)))
    uh = jnp.pad(uh, ((0, Bp - B), (0, nktp - nkt)))
    i0p = jnp.pad(i0f, ((0, Bp - B), (0, nkp - nk)))

    grid = (Bp // _RB, nkp // _TK)
    out_sd = jax.ShapeDtypeStruct((Bp, nkp), jnp.float32)
    row_spec = pl.BlockSpec((_RB, nktp), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((_RB, _TK), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        if f64_in:
            o0h, o0l, o1h, o1l = pl.pallas_call(
                _select_pair_kernel,
                out_shape=(out_sd, out_sd, out_sd, out_sd),
                grid=grid,
                in_specs=[row_spec, row_spec, tile_spec],
                out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
                interpret=interpret,
            )(uh, ul, i0p)
        else:
            o0h, o1h = pl.pallas_call(
                _select_pair_kernel_f32,
                out_shape=(out_sd, out_sd),
                grid=grid,
                in_specs=[row_spec, tile_spec],
                out_specs=(tile_spec, tile_spec),
                interpret=interpret,
            )(uh, i0p)

    if f64_in:
        u0 = o0h.astype(jnp.float64) + o0l.astype(jnp.float64)
        u1 = o1h.astype(jnp.float64) + o1l.astype(jnp.float64)
    else:
        u0, u1 = o0h.astype(uf.dtype), o1h.astype(uf.dtype)
    return (u0[:B, :nk].reshape(*batch, nk),
            u1[:B, :nk].reshape(*batch, nk))
