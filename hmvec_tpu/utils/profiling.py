"""Profiling / tracing hooks.

The reference has no built-in tracing (ad-hoc enlib.bench / time.time in
its scripts, SURVEY 5); here: a fetch-synchronized timer (on remote-tunnel
TPUs, block_until_ready does not actually synchronize -- only a host fetch
does) and a jax.profiler trace context for XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


def fetch_sync(tree):
    """Force full device->host synchronization by fetching every leaf."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


@contextlib.contextmanager
def timer(label: str = "", results: dict | None = None):
    """Wall-clock a block; the block must end with a fetch_sync."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    else:
        print(f"[hmvec_tpu timer] {label}: {dt*1e3:.2f} ms")


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median fetch-synchronized latency of fn(*args) in seconds."""
    for _ in range(warmup):
        fetch_sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@contextlib.contextmanager
def xla_trace(logdir: str = "/tmp/hmvec_tpu_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
