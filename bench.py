#!/usr/bin/env python
"""Benchmark harness: ALL FIVE BASELINE configs, one JSON line each.

Measures the fused TPU pipelines (hmvec_tpu.pipeline.make_*_fn) against the
float64 numpy twin (the "numpy reference" -- the original hmvec cannot run
here since CAMB is absent, and it published no numbers of its own; see
BASELINE.md).  Configs (BASELINE.json "Configs to benchmark end-to-end"):

  1. NFW matter Pmm 1h+2h on the README grid (20z x 200m x 1001k)
  2. Battaglia AGN electron profile: numeric transform + Pee and Pme
  3. HOD galaxy spectra with iterative ngal->mthresh solve (Pgg, Pgm)
  4. Limber projection C_kk
  5. kSZ pipeline end-to-end (Nvv + SNR), fused single-jit

Each config prints ONE JSON line:
  {"metric": ..., "value": <tpu ms>, "unit": "ms", "vs_baseline": <speedup>,
   "max_rel_err": <vs twin>, "accuracy_gate_1e-5": "PASS"|"FAIL",
   "compile_s": <this config's backend-compile seconds>}

Cold-cache structure (round-4 redesign -- BENCH_r03 lost configs 3-5 to a
timeout behind a single 679 s serial compile):
  * every config is built and LOWERED up front (host-side, seconds), then
    all backend compiles run CONCURRENTLY in a thread pool (the remote
    compile service parallelizes; measured per-program times overlap);
  * the numpy twin baselines are computed on the host WHILE the device
    compiles run -- their wall time is fully hidden;
  * the five BASELINE gates + batch16 are emitted FIRST, in order; the
    optional f64-exact tier (gate 1e-7) compiles and reports LAST, so a
    timeout can only ever cost the extras.
The all-f64 build (config1_f64_full of rounds 1-3) is intentionally NOT a
driver-gated line anymore: the double-single Pallas "exact" tier serves
the precision story at 4.5e-8 with ~half the latency, and the pure-f64
build was slower than the host twin while costing a full extra compile in
the critical path (VERDICT r3 item 4).  The capability itself remains
(make_pmm_fn(fast=False)) and is twin-pinned in the test suite.

Exit code is 0 iff every accuracy gate passes.  Timing is an end-to-end
host fetch (np.asarray): on the axon-tunneled TPU, block_until_ready does
not synchronize; the fetch is the honest latency (DEVNOTES.md).
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

GATE = 1e-5
_SMOKE = False   # set by --smoke: tags every JSON line so downstream
                 # collectors cannot mistake tiny-grid numbers for real ones
_RPC_FLOOR_MS = None   # measured null-program fetch latency (see
                       # _measure_rpc_floor); stamped on every line
_CACHE_REGIME = None   # 'warm'|'cold' remote-compile-cache indicator


def _fetch(out):
    import jax
    return jax.tree_util.tree_map(np.asarray, out)


def _timeit(fn, *args, iters=10):
    _fetch(fn(*args))  # warmup past queue effects (first call compiled below)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _relerr(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return float(np.max(np.abs(a - b) / np.abs(b)))


def _emit(metric, tpu_s, twin_s, err, extra=None, gate=GATE):
    ok = err <= gate
    line = {
        "metric": metric,
        "value": round(tpu_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(twin_s / tpu_s, 2) if twin_s else None,
        "max_rel_err": float(f"{err:.3e}"),
        f"accuracy_gate_{gate:.0e}".replace("e-0", "e-"):
            "PASS" if ok else "FAIL",
    }
    if _SMOKE:
        line["smoke"] = True
    if extra:
        line.update(extra)
    # self-attribution (VERDICT r4 item 4): the measured RPC floor under
    # every latency (a ~23-29 ms tunnel constant on this host -- an
    # apparent-latency swing that is NOT chip regression), and whether
    # the remote compile cache was warm or cold for this run
    if _RPC_FLOOR_MS is not None:
        line["rpc_floor_ms"] = _RPC_FLOOR_MS
        if "batch_latency_ms" in line:
            # batch lines report ms/cosmology; the ONE fetch's floor
            # amortizes over the whole batch
            line["net_of_rpc_ms"] = round(
                (line["batch_latency_ms"] - _RPC_FLOOR_MS)
                / line.get("batch", 1), 3)
        else:
            line["net_of_rpc_ms"] = round(line["value"] - _RPC_FLOOR_MS, 3)
    if _CACHE_REGIME is not None:
        line["compile_cache"] = _CACHE_REGIME
    print(json.dumps(line), flush=True)
    return ok


def _measure_rpc_floor(iters: int = 10):
    """Null-program RPC floor: median end-to-end fetch of a 1-element
    jitted program.  Everything a real config's latency contains except
    the actual pipeline compute -- the tunnel's round-trip constant."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.asarray(1.0)
    _fetch(f(x))                      # compile + first-execute
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch(f(x))
        ts.append(time.perf_counter() - t0)
    return round(float(np.median(ts)) * 1e3, 2)


def _probe_backend(timeout_s: float = 240.0):
    """Fail FAST with a diagnostic if the axon tunnel is dead.

    A healthy tunnel answers jax.devices() in seconds; a dead one hangs
    indefinitely (DEVNOTES 'Tunnel loss mid-round': the relay can drop
    its local listeners), silently eating the caller's whole timeout
    budget.  Probe device discovery in a daemon thread; on timeout emit
    one diagnostic JSON line and exit 3.  Compiles are NOT under this
    timeout -- only platform init."""
    import threading

    result = {}

    def probe():
        import jax
        result["devices"] = str(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in result:
        print(json.dumps({
            "metric": "backend_probe", "value": None, "unit": "ms",
            "vs_baseline": None,
            "error": f"device discovery hung > {timeout_s:.0f}s -- "
                     "axon tunnel down?  (ss -ltn shows no 808x "
                     "listeners when the relay has dropped)"}),
            flush=True)
        sys.exit(3)


class _Program:
    """One benchmark program: built + lowered eagerly (host, fast), then
    backend-compiled on a worker thread so all programs compile
    concurrently.  .wait() joins the compile and returns a callable."""

    def __init__(self, name, fn, args, pool):
        import jax
        self.name = name
        self.args = args
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        self.lower_s = time.perf_counter() - t0
        self._t_submit = time.perf_counter()
        self._future = pool.submit(self._compile, lowered)

    def _compile(self, lowered):
        t0 = time.perf_counter()
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        # warm the first execution HERE, overlapped with the other
        # compiles: the first run pays the one-time constant upload
        # (~55 s measured for the 67 MB sine-matrix programs) and must
        # not land in the post-barrier timing phase
        _fetch(compiled(*self.args))
        return compiled, dt

    def wait(self):
        self.compiled, self.compile_s = self._future.result()
        return self.compiled

    def timeit(self, iters):
        fn = self.wait()
        return _timeit(fn, *self.args, iters=iters)


def _flatten(builder_fn):
    """Wrap a multi-output pipeline so it returns ONE flat buffer.

    Every output leaf fetched through the axon tunnel costs a separate
    ~30 ms RPC round trip; concatenating inside the jitted program makes
    the end-to-end latency one fetch, as a production consumer would.
    Returns (flat_fn, unpack) where unpack(flat) -> list of arrays;
    shapes are recorded at trace time."""
    import jax.numpy as jnp
    shapes = []

    def flat_fn(*args):
        outs = builder_fn(*args)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        del shapes[:]
        shapes.extend(o.shape for o in outs)
        return jnp.concatenate([o.ravel() for o in outs])

    def unpack(flat):
        flat = np.asarray(flat)
        res, off = [], 0
        for sh in shapes:
            n = int(np.prod(sh))
            res.append(flat[off:off + n].reshape(sh))
            off += n
        return res

    return flat_fn, unpack


def main():
    import jax

    # persistent compilation cache: helps repeat CPU runs; the axon TPU
    # backend cannot serialize remote executables, so TPU runs pay real
    # compiles -- which is why they all run concurrently below
    jax.config.update("jax_compilation_cache_dir", "/tmp/hmvec_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--cpu" in sys.argv:  # debug: structure-test the harness off-TPU
        jax.config.update("jax_platforms", "cpu")
    else:
        _probe_backend()

    import jax.numpy as jnp
    from hmvec_tpu.pipeline import (make_pmm_fn, make_electron_fn,
                                    make_hod_fn, make_lensing_cls_fn,
                                    make_ksz_snr_fn, make_batched_fn)
    from hmvec_tpu.twin.halo_ext import TwinHaloModelExt
    from hmvec_tpu.twin import limber as twin_limber
    from hmvec_tpu.twin.ksz import TwinKSZ

    global _SMOKE
    smoke = _SMOKE = "--smoke" in sys.argv   # tiny grids: harness regression
    if smoke:
        zs = np.linspace(0.1, 3.0, 3)
        ms = np.geomspace(2e10, 1e17, 24)
        ks = np.geomspace(1e-4, 100, 64)
    else:
        zs = np.linspace(0.1, 3.0, 20)
        ms = np.geomspace(2e10, 1e17, 200)
        ks = np.geomspace(1e-4, 100, 1001)
    # Pass the cosmology as *traced* inputs so XLA cannot constant-fold the
    # pipeline away (an empty overrides dict would compile to a constant).
    overrides = {k: jnp.asarray(v) for k, v in {
        "omch2": 0.1198, "ombh2": 0.02225, "H0": 67.3, "ns": 0.9645,
        "As": 2.2e-9, "w0": -1.0, "wa": 0.0, "mnu": 0.0, "omk": 0.0,
        "pivot_scalar": 0.05,
    }.items()}
    on_tpu = jax.default_backend() != "cpu"
    iters = 2 if smoke else 10
    nxs, xmax = (512, 20) if smoke else (4096, 20)  # pow2: fast transform
    ells = np.geomspace(30, 3000, 60)
    ngal = np.full(zs.size, 1e-4)
    if smoke:
        ksz_ms = np.geomspace(1e8, 1e16, 50)
        ksz_cfg = dict(num_kL_bins=10, num_kS_bins=11, num_mu_bins=12)
    else:
        ksz_ms = np.geomspace(1e8, 1e16, 500)
        ksz_cfg = dict(num_kL_bins=100, num_kS_bins=101, num_mu_bins=102)
    Cls = 1e-5 * np.ones(10000)
    B = 16
    theta = jnp.asarray(np.column_stack([np.linspace(0.11, 0.13, B),
                                         np.linspace(2.0e-9, 2.4e-9, B)]))

    # ---- phase 1: build + lower every program, compile all CONCURRENTLY
    t_round0 = time.perf_counter()
    pool = ThreadPoolExecutor(max_workers=8)
    f2, unpack2 = _flatten(make_electron_fn(zs, ks, ms, nxs=nxs, xmax=xmax,
                                            jit=False, fast=on_tpu,
                                            growth="closed"))
    f3, unpack3 = _flatten(make_hod_fn(zs, ks, ms, ngal, jit=False,
                                       fast=on_tpu, growth="closed"))
    f4, unpack4 = _flatten(make_lensing_cls_fn(zs, ks, ms, ells, jit=False,
                                               fast=on_tpu, growth="closed"))
    f5, unpack5 = _flatten(make_ksz_snr_fn(0.55, 10.0, 1e-4, ms=ksz_ms,
                                           nxs=nxs, xmax=xmax, jit=False,
                                           growth="closed", **ksz_cfg))
    progs = {
        "1": _Program("1", make_pmm_fn(zs, ks, ms, fast=on_tpu, jit=False,
                                       growth="closed"), (overrides,), pool),
        "2": _Program("2", f2, (overrides,), pool),
        "3": _Program("3", f3, (overrides,), pool),
        "4": _Program("4", f4, (overrides,), pool),
        "5": _Program("5", f5, (overrides, jnp.asarray(Cls)), pool),
        "b16": _Program("b16", make_batched_fn(
            make_pmm_fn(zs, ks, ms, fast=on_tpu, jit=False,
                        growth="closed"), ("omch2", "As"), jit=False),
            (theta,), pool),
    }
    # optimized serving tier (VERDICT r3 item 5): B=128, trimmed sigma^2
    # grid (1250 Simpson pts -- 1.6e-8 vs the 10000-pt twin), mixed32
    # sigma^2 MXU matmul (also lifts the B>=128 HBM OOM of the emulated
    # f64 dot), f32 output cast (halves the device->host fetch).  Gated
    # against the INDEPENDENT full-resolution f64 twin like batch16.
    BN = 32 if smoke else 128
    thetaN = jnp.asarray(np.column_stack([np.linspace(0.11, 0.13, BN),
                                          np.linspace(2.0e-9, 2.4e-9, BN)]))
    progs["bN"] = _Program("bN", make_batched_fn(
        make_pmm_fn(zs, ks, ms, fast=on_tpu, jit=False, growth="closed",
                    static_params={"sigma2_numks": 1250},
                    # the low-k u(k) thinning assumes the real 1001-point
                    # grid's density; on the 64-point smoke grid it would
                    # alias (7e-5) -- and saves nothing there anyway
                    uk_subsample=None if smoke else (0.2, 4)),
        ("omch2", "As"), jit=False, out_dtype=jnp.float32),
        (thetaN,), pool)
    if on_tpu:
        # the "exact tier" fast path: v3 double-single Pallas NFW kernel,
        # gated at 1e-7 (VERDICT r2 item 3) -- compiled along with the
        # rest but REPORTED last (optional line)
        progs["1x"] = _Program("1x", make_pmm_fn(zs, ks, ms, jit=False,
                                                 growth="closed",
                                                 fast="exact"),
                               (overrides,), pool)
        # round-5 fused-contraction serving kernel (u(k) + both mass
        # integrals in one VMEM pass): reported as an EXTRA line next to
        # the batch128 gate -- on-chip timings of the two routes swing
        # with tunnel/host load, so the artifact carries both
        progs["bNf"] = _Program("bNf", make_batched_fn(
            make_pmm_fn(zs, ks, ms, jit=False, growth="closed",
                        static_params={"sigma2_numks": 1250},
                        uk_subsample=(0.2, 4), fused_serving=True),
            ("omch2", "As"), jit=False, out_dtype=jnp.float32),
            (thetaN,), pool)
    print(f"# lowered {len(progs)} programs in "
          f"{time.perf_counter() - t_round0:.1f}s; compiling concurrently",
          file=sys.stderr)

    # ---- phase 2: numpy twin baselines on the host while compiles run
    tw = TwinHaloModelExt(zs, ks, ms)
    t0 = time.perf_counter()
    p_twin = tw.get_power("nfw")
    tw1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    tw.add_battaglia_profile("e", nxs=nxs, xmax=xmax)
    pee_t = tw.get_power("e")
    pme_t = tw.get_power("nfw", "e")
    tw2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    tw.add_hod("g", ngal=ngal)
    pgg_t = tw.get_power("g")
    pgm_t = tw.get_power("g", "nfw")
    tw3 = time.perf_counter() - t0
    t0 = time.perf_counter()
    pmm_t = tw.get_power("nfw")
    ckk_t = twin_limber.C_kk(tw, ells, zs, ks, pmm_t, 1100.0, 1100.0)
    tw4 = time.perf_counter() - t0
    t0 = time.perf_counter()
    twk = TwinKSZ([0.55], [10.0], [1e-4], ms=ksz_ms,
                  electron_profile_nxs=nxs, electron_profile_xmax=xmax,
                  **ksz_cfg)
    nvv_t = twk.Nvv(0, Cls)
    tw5 = time.perf_counter() - t0
    tw_b0 = TwinHaloModelExt(zs, ks, ms,
                             params={"omch2": float(theta[0, 0]),
                                     "As": float(theta[0, 1])})
    p_twin_b0 = tw_b0.get_power("nfw")
    print(f"# twin baselines done at t+{time.perf_counter() - t_round0:.1f}s",
          file=sys.stderr)

    # ---- phase 3: barrier on ALL compiles before timing anything --
    # in-flight compile RPCs contend with execute RPCs on the tunnel and
    # inflate measured latencies (config1 read 80 ms instead of 42 ms
    # when timed during the other compiles)
    for p in progs.values():
        p.wait()
    compile_wall_s = time.perf_counter() - t_round0
    print(f"# all compiles done at t+{compile_wall_s:.1f}s: "
          + " ".join(f"{k}={p.compile_s:.0f}s" for k, p in progs.items()),
          file=sys.stderr)

    # self-attribution (VERDICT r4 item 4): measure the tunnel RPC floor
    # AFTER the compile barrier (quiet link, same conditions as the
    # timed configs), and classify the remote compile cache: measured
    # cold runs compiled for 700-860 s of wall on this service vs
    # 130-250 s warm (ROUND4_NOTES section 1 / BENCH_r04), so the
    # midpoint 420 s separates the regimes cleanly
    global _RPC_FLOOR_MS, _CACHE_REGIME
    _RPC_FLOOR_MS = _measure_rpc_floor()
    _CACHE_REGIME = "cold" if compile_wall_s > 420.0 else "warm"
    print(f"# rpc_floor={_RPC_FLOOR_MS:.1f}ms "
          f"compile_cache={_CACHE_REGIME} (wall {compile_wall_s:.0f}s)",
          file=sys.stderr)
    all_ok = True

    def report(key, metric, twin_s, ref, unpack=None, extra=None,
               gate=GATE, per=1.0):
        nonlocal all_ok
        p = progs[key]
        t = p.timeit(iters)
        out = _fetch(p.compiled(*p.args))
        outs = unpack(out) if unpack else [out]
        err = max(_relerr(o, r) for o, r in zip(outs, ref))
        ex = dict(extra or {})
        ex["compile_s"] = round(p.compile_s, 1)
        if per != 1.0:
            ex["batch_latency_ms"] = round(t * 1e3, 3)
            t = t / per
        all_ok &= _emit(metric, t, twin_s, err, extra=ex, gate=gate)
        print(f"# config{key}: lower={p.lower_s:.1f}s "
              f"compile={p.compile_s:.1f}s "
              f"(t+{time.perf_counter() - t_round0:.1f}s)", file=sys.stderr)

    report("1", "pmm_1h2h_20z_200m_1001k_latency", tw1, [p_twin])
    report("2", "config2_battaglia_pee_pme", tw2, [pee_t, pme_t],
           unpack=unpack2)
    report("3", "config3_hod_pgg_pgm", tw3, [pgg_t, pgm_t], unpack=unpack3)
    report("4", "config4_limber_ckk", tw4, [ckk_t, pmm_t], unpack=unpack4)

    # config 5 returns (snr, nvv, vrec); gate on nvv vs the twin
    p5 = progs["5"]
    t5 = p5.timeit(iters)
    snr, nvv, _ = unpack5(_fetch(p5.compiled(*p5.args)))
    all_ok &= _emit("config5_ksz_nvv_snr", t5, tw5, _relerr(nvv, nvv_t),
                    extra={"snr": round(float(np.asarray(snr)), 2),
                           "compile_s": round(p5.compile_s, 1)})
    print(f"# config5: compile={p5.compile_s:.1f}s "
          f"(t+{time.perf_counter() - t_round0:.1f}s)", file=sys.stderr)

    # batch-16 serving (row 0 vs the INDEPENDENT twin at that cosmology:
    # a vmapped-path bug hitting both identically must not cancel out)
    pb = progs["b16"]
    tb = pb.timeit(2 if smoke else 5)
    out_b = np.asarray(_fetch(pb.compiled(*pb.args)))
    all_ok &= _emit("batch16_pmm_per_cosmology", tb / B, tw1,
                    _relerr(out_b[0], p_twin_b0),
                    extra={"batch": B, "batch_latency_ms": round(tb * 1e3, 3),
                           "compile_s": round(pb.compile_s, 1)})

    # optimized serving tier at B=128 (f32 output, trimmed sigma^2 grid)
    pn = progs["bN"]
    tn = pn.timeit(2 if smoke else 5)
    out_n = np.asarray(_fetch(pn.compiled(*pn.args)))
    all_ok &= _emit(f"batch{BN}_pmm_per_cosmology", tn / BN, tw1,
                    _relerr(out_n[0].astype(np.float64), p_twin_b0),
                    extra={"batch": BN,
                           "batch_latency_ms": round(tn * 1e3, 3),
                           "compile_s": round(pn.compile_s, 1)})

    # ---- phase 4: optional lines LAST (a timeout can only cost these)
    if on_tpu:
        report("1x", "config1_f64_exact", tw1, [p_twin], gate=1e-7)
        pf = progs["bNf"]
        tf = pf.timeit(5)
        out_f = np.asarray(_fetch(pf.compiled(*pf.args)))
        all_ok &= _emit(f"batch{BN}_pmm_fused_per_cosmology", tf / BN, tw1,
                        _relerr(out_f[0].astype(np.float64), p_twin_b0),
                        extra={"batch": BN,
                               "batch_latency_ms": round(tf * 1e3, 3),
                               "compile_s": round(pf.compile_s, 1)})

    print(f"# total wall {time.perf_counter() - t_round0:.1f}s "
          f"(compiles overlapped)", file=sys.stderr)
    return 0 if all_ok else 1


if __name__ == "__main__":
    # One whole-run retry: the axon tunnel occasionally throws transient
    # HTTP-500 / connection errors mid-compile; without this a single
    # flake loses the entire bench artifact.  A retry re-pays TPU compiles
    # (remote executables are not persistently cacheable) but preserves
    # the run.  Real failures still fail: the retry crashes the same way.
    try:
        sys.exit(main())
    except SystemExit:
        raise
    except Exception as e:
        print(f"# bench run crashed ({type(e).__name__}: {e}); "
              f"retrying once from scratch", file=sys.stderr)
        sys.exit(main())
