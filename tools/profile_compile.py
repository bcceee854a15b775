#!/usr/bin/env python
"""Where does the bench's cold-cache compile time go?

BENCH_r03 recorded config1 compile=678.8 s cold (r1: 76.5 s, r2: 190.3 s)
and the driver timeout then ate configs 3-5.  This script splits each
config's first-call cost into
  trace+lower (host Python/StableHLO)  vs  backend compile (remote RPC)
and tests whether two DIFFERENT programs compile concurrently (thread
pool) faster than serially -- if the remote compile service parallelizes,
bench.py can precompile every config at once.

Run:  python tools/profile_compile.py [--cpu] [--configs 1,2] [--par]
"""

import argparse
import sys
import time
import threading

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", default="1,2")
    ap.add_argument("--par", action="store_true",
                    help="also test concurrent compile of two programs")
    ap.add_argument("--cache", default="",
                    help="compile-cache dir ('' = no persistent cache)")
    args = ap.parse_args()

    import jax
    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"# backend={jax.default_backend()}", flush=True)

    import jax.numpy as jnp
    from hmvec_tpu.pipeline import (make_pmm_fn, make_electron_fn,
                                    make_hod_fn, make_lensing_cls_fn,
                                    make_ksz_snr_fn)

    zs = np.linspace(0.1, 3.0, 20)
    ms = np.geomspace(2e10, 1e17, 200)
    ks = np.geomspace(1e-4, 100, 1001)
    overrides = {k: jnp.asarray(v) for k, v in {
        "omch2": 0.1198, "ombh2": 0.02225, "H0": 67.3, "ns": 0.9645,
        "As": 2.2e-9, "w0": -1.0, "wa": 0.0, "mnu": 0.0, "omk": 0.0,
        "pivot_scalar": 0.05,
    }.items()}
    on_tpu = jax.default_backend() != "cpu"

    def build(cfg):
        if cfg == "1":
            return make_pmm_fn(zs, ks, ms, fast=on_tpu, growth="closed",
                               jit=True), (overrides,)
        if cfg == "1x":
            return make_pmm_fn(zs, ks, ms, fast="exact", growth="closed",
                               jit=True), (overrides,)
        if cfg == "1f":
            return make_pmm_fn(zs, ks, ms, growth="closed", jit=True), \
                (overrides,)
        if cfg == "2":
            return jax.jit(make_electron_fn(zs, ks, ms, nxs=4096, xmax=20,
                                            jit=False, fast=on_tpu,
                                            growth="closed")), (overrides,)
        if cfg == "3":
            ngal = np.full(zs.size, 1e-4)
            return jax.jit(make_hod_fn(zs, ks, ms, ngal, jit=False,
                                       fast=on_tpu, growth="closed")), \
                (overrides,)
        if cfg == "4":
            ells = np.geomspace(30, 3000, 60)
            return jax.jit(make_lensing_cls_fn(zs, ks, ms, ells, jit=False,
                                               fast=on_tpu,
                                               growth="closed")), (overrides,)
        if cfg == "5":
            ksz_ms = np.geomspace(1e8, 1e16, 500)
            fn = make_ksz_snr_fn(0.55, 10.0, 1e-4, ms=ksz_ms, nxs=4096,
                                 xmax=20, jit=False, growth="closed",
                                 num_kL_bins=100, num_kS_bins=101,
                                 num_mu_bins=102)
            Cls = jnp.asarray(1e-5 * np.ones(10000))
            return jax.jit(fn), (overrides, Cls)
        raise ValueError(cfg)

    def profile_one(cfg):
        fn, a = build(cfg)
        t0 = time.perf_counter()
        lowered = fn.lower(*a)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(compiled(*a))[0])
        t_run = time.perf_counter() - t0
        print(f"config{cfg}: lower={t_lower:.1f}s compile={t_compile:.1f}s "
              f"first_run={t_run:.2f}s", flush=True)
        return t_lower, t_compile

    for cfg in args.configs.split(","):
        profile_one(cfg)

    if args.par:
        # two distinct fresh programs (different static nxs -> different
        # program) compiled in two threads: is wall < sum of serials?
        f_a = jax.jit(make_electron_fn(zs, ks, ms, nxs=2048, xmax=20,
                                       jit=False, fast=on_tpu,
                                       growth="closed"))
        f_b = jax.jit(make_electron_fn(zs, ks, ms, nxs=1024, xmax=20,
                                       jit=False, fast=on_tpu,
                                       growth="closed"))
        lows = {}
        for name, f in (("a", f_a), ("b", f_b)):
            t0 = time.perf_counter()
            lows[name] = f.lower(overrides)
            print(f"par-{name}: lower={time.perf_counter()-t0:.1f}s",
                  flush=True)
        results = {}

        def compile_one(name):
            t0 = time.perf_counter()
            lows[name].compile()
            results[name] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ths = [threading.Thread(target=compile_one, args=(n,))
               for n in ("a", "b")]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        wall = time.perf_counter() - t0
        print(f"par: wall={wall:.1f}s individual={results}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
