#!/usr/bin/env python
"""Benchmark harness: flagship Pmm(1h+2h) build on the README grid.

Measures the fused TPU pipeline (hmvec_tpu.pipeline.make_pmm_fn) on the
canonical 20z x 200m x 1001k workload (reference README.rst:55-57 /
bin/simple_test.py semantics) against the float64 numpy twin (the "numpy
reference" -- the original hmvec cannot run here since CAMB is absent, and
it published no numbers of its own; see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <tpu ms>, "unit": "ms", "vs_baseline": <speedup>}

Accuracy gate: the TPU result must match the twin to <=1e-5 max relative
error, else the benchmark reports failure.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: first bench run pays the (slow, remote)
    # TPU compile; subsequent runs reuse it
    jax.config.update("jax_compilation_cache_dir", "/tmp/hmvec_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hmvec_tpu.pipeline import make_pmm_fn
    from hmvec_tpu.twin.halo import TwinHaloModel

    zs = np.linspace(0.1, 3.0, 20)
    ms = np.geomspace(2e10, 1e17, 200)
    ks = np.geomspace(1e-4, 100, 1001)

    # ---- TPU/JAX pipeline ----
    # Pass the cosmology as *traced* inputs so XLA cannot constant-fold the
    # pipeline away (an empty overrides dict would compile to a constant).
    import jax.numpy as jnp
    overrides = {k: jnp.asarray(v) for k, v in {
        "omch2": 0.1198, "ombh2": 0.02225, "H0": 67.3, "ns": 0.9645,
        "As": 2.2e-9, "w0": -1.0, "wa": 0.0, "mnu": 0.0, "omk": 0.0,
        "pivot_scalar": 0.05,
    }.items()}
    fn = make_pmm_fn(zs, ks, ms)
    # NB: on the axon-tunneled TPU, block_until_ready does not actually
    # synchronize; np.asarray (device->host fetch of the 160KB result) is
    # the honest end-to-end latency.
    t0 = time.perf_counter()
    out = np.asarray(fn(overrides))
    compile_s = time.perf_counter() - t0
    np.asarray(fn(overrides))  # extra warmup past queue effects

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = np.asarray(fn(overrides))
        times.append(time.perf_counter() - t0)
    tpu_ms = float(np.median(times) * 1e3)

    # ---- numpy twin baseline (full params -> P pipeline, same outputs) ----
    t0 = time.perf_counter()
    tw = TwinHaloModel(zs, ks, ms)
    p_twin = tw.get_power("nfw")
    twin_s = time.perf_counter() - t0

    rel_err = float(np.max(np.abs(out - p_twin) / np.abs(p_twin)))
    ok = rel_err <= 1e-5

    print(json.dumps({
        "metric": "pmm_1h2h_20z_200m_1001k_latency",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(twin_s * 1e3 / tpu_ms, 2),
    }))
    print(f"# backend={jax.default_backend()} compile={compile_s:.1f}s "
          f"numpy_twin={twin_s*1e3:.1f}ms max_rel_err={rel_err:.2e} "
          f"accuracy_gate_1e-5={'PASS' if ok else 'FAIL'}", file=sys.stderr)

    if "--all" in sys.argv:
        run_secondary_configs(overrides)
    return 0 if ok else 1


def _timeit(fn, *args, iters=5):
    import numpy as np
    import jax
    jax.tree_util.tree_map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run_secondary_configs(overrides):
    """BASELINE configs 2-5 (printed as comment lines on stderr)."""
    import jax.numpy as jnp
    from hmvec_tpu.pipeline import make_electron_fn, make_hod_fn, \
        make_lensing_cls_fn
    from hmvec_tpu.twin.halo_ext import TwinHaloModelExt
    from hmvec_tpu.twin import limber as twin_limber

    zs = np.linspace(0.1, 3.0, 20)
    ms = np.geomspace(2e10, 1e17, 200)
    ks = np.geomspace(1e-4, 100, 1001)
    nxs, xmax = 4096, 20   # pow2 sampling: fast FFT path on TPU

    # --- config 2: Battaglia electron Pee + Pme ---
    fn2 = make_electron_fn(zs, ks, ms, nxs=nxs, xmax=xmax)
    t2 = _timeit(fn2, overrides)
    t0 = time.perf_counter()
    tw = TwinHaloModelExt(zs, ks, ms)
    tw.add_battaglia_profile("e", nxs=nxs, xmax=xmax)
    pee_t = tw.get_power("e")
    pme_t = tw.get_power("nfw", "e")
    tw2 = time.perf_counter() - t0
    pee, pme = fn2(overrides)
    err2 = max(float(np.max(np.abs(np.asarray(pee) - pee_t) / np.abs(pee_t))),
               float(np.max(np.abs(np.asarray(pme) - pme_t) / np.abs(pme_t))))
    print(f"# config2 battaglia_pee_pme: {t2*1e3:.1f} ms "
          f"(twin {tw2*1e3:.0f} ms, {tw2/t2:.1f}x) max_rel_err={err2:.1e}",
          file=sys.stderr)

    # --- config 3: HOD Pgg + Pgm with ngal solve ---
    ngal = np.full(zs.size, 1e-4)
    fn3 = make_hod_fn(zs, ks, ms, ngal)
    t3 = _timeit(fn3, overrides)
    t0 = time.perf_counter()
    tw.add_hod("g", ngal=ngal)
    pgg_t = tw.get_power("g")
    pgm_t = tw.get_power("g", "nfw")
    tw3 = time.perf_counter() - t0
    pgg, pgm = fn3(overrides)
    err3 = max(float(np.max(np.abs(np.asarray(pgg) - pgg_t) / np.abs(pgg_t))),
               float(np.max(np.abs(np.asarray(pgm) - pgm_t) / np.abs(pgm_t))))
    print(f"# config3 hod_pgg_pgm: {t3*1e3:.1f} ms "
          f"(twin {tw3*1e3:.0f} ms, {tw3/t3:.1f}x) max_rel_err={err3:.1e}",
          file=sys.stderr)

    # --- config 4: Limber C_kk ---
    ells = np.geomspace(30, 3000, 60)
    fn4 = make_lensing_cls_fn(zs, ks, ms, ells)
    t4 = _timeit(fn4, overrides)
    ckk, pmm = fn4(overrides)
    t0 = time.perf_counter()
    pmm_t = tw.get_power("nfw")
    ckk_t = twin_limber.C_kk(tw, ells, zs, ks, pmm_t, 1100.0, 1100.0)
    tw4 = time.perf_counter() - t0
    err4 = float(np.max(np.abs(np.asarray(ckk) - ckk_t) / np.abs(ckk_t)))
    print(f"# config4 limber_ckk: {t4*1e3:.1f} ms "
          f"(twin {tw4*1e3:.0f} ms) max_rel_err={err4:.1e}", file=sys.stderr)

    # --- config 5: kSZ pipeline end-to-end, fused single-jit ---
    # (The eager class API takes ~8 s warm on the remote-tunnel TPU purely
    # from per-op RPC latency; the fused pipeline is the production path.)
    from hmvec_tpu.pipeline import make_ksz_snr_fn
    fn5 = make_ksz_snr_fn(0.55, 10.0, 1e-4,
                          ms=np.geomspace(1e8, 1e16, 500),
                          nxs=4096, xmax=20)
    Cls = 1e-5 * np.ones(10000)
    t5 = _timeit(lambda ov: fn5(ov, Cls), overrides)
    snr, nvv, _ = fn5(overrides, Cls)
    print(f"# config5 ksz_snr_fused: {t5*1e3:.1f} ms "
          f"(SNR={float(snr):.1f}, Nvv finite: "
          f"{bool(np.all(np.isfinite(np.asarray(nvv))))})", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
