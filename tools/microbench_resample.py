"""Microbenchmark: resample_uniform_source gather variants on real TPU.

The profile-transform resample (ops/sine_transform.py) is the config-2 cost
center: 2 dynamic gathers over the (z, m, nk) grid.  This tool times
isolated lowering variants to pick the fastest TPU-safe form.

Run: python tools/microbench_resample.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _timeit(fn, *args, iters=7):
    import jax
    out = jax.tree_util.tree_map(np.asarray, fn(*args))
    jax.tree_util.tree_map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3, out


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hmvec_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    nz, nm, nkt, nk = 20, 200, 2049, 1001
    rng = np.random.default_rng(0)
    u_np = rng.standard_normal((nz, nm, nkt))
    scales_np = np.exp(rng.uniform(np.log(0.02), np.log(3.0), (nz, nm)))
    ks_np = np.geomspace(1e-4, 100, nk)
    dkt = 2.0 * np.pi / 20.0

    u = jnp.asarray(u_np)
    scales = jnp.asarray(scales_np)
    ks = jnp.asarray(ks_np)

    def prep(scales):
        p = ks * scales[..., None] / dkt
        i0 = jnp.clip(jnp.floor(p).astype(jnp.int32), 1, nkt - 2)
        frac = p - i0
        return p, i0, frac

    def finish(u, p, val):
        left = u[..., 1:2]
        val = jnp.where(p < 1.0, left, val)
        return jnp.where(p > nkt - 1.0, 0.0, val)

    @jax.jit
    def v_base(u, scales):
        p, i0, frac = prep(scales)
        u0 = jnp.take_along_axis(u, i0, axis=-1)
        u1 = jnp.take_along_axis(u, i0 + 1, axis=-1)
        return finish(u, p, u0 + frac * (u1 - u0)).sum()

    @jax.jit
    def v_concat(u, scales):
        p, i0, frac = prep(scales)
        both = jnp.take_along_axis(u, jnp.concatenate([i0, i0 + 1], -1), -1)
        u0, u1 = both[..., :nk], both[..., nk:]
        return finish(u, p, u0 + frac * (u1 - u0)).sum()

    @jax.jit
    def v_f32hilo(u, scales):
        p, i0, frac = prep(scales)
        uh = u.astype(jnp.float32)
        ul = (u - uh.astype(jnp.float64)).astype(jnp.float32)
        u0 = (jnp.take_along_axis(uh, i0, -1).astype(jnp.float64)
              + jnp.take_along_axis(ul, i0, -1).astype(jnp.float64))
        u1 = (jnp.take_along_axis(uh, i0 + 1, -1).astype(jnp.float64)
              + jnp.take_along_axis(ul, i0 + 1, -1).astype(jnp.float64))
        return finish(u, p, u0 + frac * (u1 - u0)).sum()

    @jax.jit
    def v_f32only(u, scales):
        p, i0, frac = prep(scales)
        uh = u.astype(jnp.float32)
        u0 = jnp.take_along_axis(uh, i0, -1).astype(jnp.float64)
        u1 = jnp.take_along_axis(uh, i0 + 1, -1).astype(jnp.float64)
        return finish(u, p, u0 + frac * (u1 - u0)).sum()

    @jax.jit
    def v_diff(u, scales):
        # gather u0 from u, du from a precomputed diff array (2 gathers,
        # but the second operand is freshly written -- tests cache effects)
        p, i0, frac = prep(scales)
        du = jnp.diff(u, axis=-1)
        u0 = jnp.take_along_axis(u, i0, -1)
        d0 = jnp.take_along_axis(du, i0, -1)
        return finish(u, p, u0 + frac * d0).sum()

    @jax.jit
    def v_transpose(u, scales):
        # gather along axis 0 of a (nkt, B) layout
        p, i0, frac = prep(scales)
        B = nz * nm
        uT = u.reshape(B, nkt).T                      # (nkt, B)
        i0T = i0.reshape(B, nk).T                     # (nk, B)
        u0 = jnp.take_along_axis(uT, i0T, axis=0)     # (nk, B)
        u1 = jnp.take_along_axis(uT, i0T + 1, axis=0)
        val = (u0 + frac.reshape(B, nk).T * (u1 - u0)).T.reshape(nz, nm, nk)
        return finish(u, p, val).sum()

    @jax.jit
    def v_onehot_mxu(u, scales):
        # interp as one f32 MXU matmul per row-block with a banded one-hot:
        # too big dense; skipped -- placeholder returns base
        p, i0, frac = prep(scales)
        u0 = jnp.take_along_axis(u, i0, axis=-1)
        return finish(u, p, u0).sum()

    @jax.jit
    def v_c64pair(u, scales):
        # ONE c64 gather fetching the lerp pair (u0, du) packed re/im
        p, i0, frac = prep(scales)
        uh = u.astype(jnp.float32)
        du = jnp.diff(uh, axis=-1)
        du = jnp.concatenate([du, jnp.zeros_like(du[..., :1])], -1)
        pair = jax.lax.complex(uh, du)                # c64
        g = jnp.take_along_axis(pair, i0, axis=-1)
        val = (g.real + frac.astype(jnp.float32) * g.imag).astype(jnp.float64)
        return finish(u, p, val).sum()

    @jax.jit
    def v_c64ds(u, scales):
        # double-single: two c64 gathers (hi pair + lo pair)
        p, i0, frac = prep(scales)
        uh = u.astype(jnp.float32)
        ul = (u - uh.astype(jnp.float64)).astype(jnp.float32)

        def mk(x):
            d = jnp.diff(x, axis=-1)
            d = jnp.concatenate([d, jnp.zeros_like(d[..., :1])], -1)
            return jax.lax.complex(x, d)

        gh = jnp.take_along_axis(mk(uh), i0, axis=-1)
        gl = jnp.take_along_axis(mk(ul), i0, axis=-1)
        u0 = gh.real.astype(jnp.float64) + gl.real.astype(jnp.float64)
        du = gh.imag.astype(jnp.float64) + gl.imag.astype(jnp.float64)
        return finish(u, p, u0 + frac * du).sum()

    def make_slice_variant(W, S):
        # chunked gather: fetch width-W slices at stride S, then select
        # the (lo, lo+1) pair with static one-hot masks (no elementwise
        # dynamic gather -- the chunk fetch is a slice-gather)
        nch = -(-(nkt - W) // S) + 1
        pad = S * (nch - 1) + W - nkt
        idx = (S * np.arange(nch))[:, None] + np.arange(W)[None, :]

        @jax.jit
        def fn(u, scales):
            p, i0, frac = prep(scales)
            up = jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(0, pad)])
            O = up[..., idx]                       # (nz, nm, nch, W) static
            h = jnp.clip(i0 // S, 0, nch - 1)
            lo = i0 - h * S
            B = nz * nm
            Of = O.reshape(B, nch, W)
            hf = h.reshape(B, nk)
            G = jax.vmap(lambda o, hh: jnp.take(o, hh, axis=0))(Of, hf)
            G = G.reshape(nz, nm, nk, W)
            lane = jnp.arange(W)
            u0 = jnp.sum(jnp.where(lane == lo[..., None], G, 0.0), -1)
            u1 = jnp.sum(jnp.where(lane == (lo + 1)[..., None], G, 0.0), -1)
            return finish(u, p, u0 + frac * (u1 - u0)).sum()

        return fn

    variants = [("base 2x f64 gather", v_base),
                ("c64 pair 1x gather", v_c64pair),
                ("c64 ds 2x gather", v_c64ds),
                ("slice W8/S7", make_slice_variant(8, 7)),
                ("slice W17/S16", make_slice_variant(17, 16)),
                ("slice W128/S120", make_slice_variant(128, 120)),
                ("concat 1x2nk gather", v_concat),
                ("hi/lo 4x f32 gather", v_f32hilo),
                ("f32-only 2x gather", v_f32only),
                ("u0+diff gather", v_diff),
                ("transposed axis0", v_transpose),
                ("single gather (no lerp)", v_onehot_mxu)]

    ref = None
    for name, fn in variants:
        try:
            t, out = _timeit(fn, u, scales)
            if ref is None:
                ref = out
            err = abs(float(out) - float(ref)) / abs(float(ref))
            print(f"{name:28s}: {t:8.2f} ms   relsum {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
