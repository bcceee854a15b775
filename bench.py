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
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
