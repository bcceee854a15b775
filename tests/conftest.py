"""Test configuration: run JAX on CPU with 8 virtual devices.

The sandbox pins JAX_PLATFORMS=axon (the remote TPU tunnel); tests must run
on CPU (fast, f64-exact, and the sharding tests need an 8-device mesh), so
we override via jax.config, which wins over the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by
# recompiling the big fused pipelines per module; cache hits cut repeat
# runs from ~28 min to minutes (VERDICT r1 weak #7).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HMVEC_CACHE_DIR",
                                 "/tmp/hmvec_tpu_jax_cache_cpu"))
# threshold overridable for cache experiments (suite time is a flat
# compile tail -- DEVNOTES; 0.0 caches even sub-second programs)
jax.config.update("jax_persistent_cache_min_compile_time_secs",
                  float(os.environ.get("HMVEC_CACHE_MIN_SECS", "0.0")))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# Guard against the native serialize() segfault on GIANT executables:
# two independent cold-suite crashes (sessions 2 and 11, DEVNOTES) died
# inside compilation_cache.put_executable_and_time ->
# LoadedExecutable.serialize() while writing a tens-of-seconds-compile
# program (the 8-device sharded boltzlite; the fused-kSZ grad), with
# thousands of small writes always succeeding.  Skip persistent-cache
# WRITES above a compile-time cap (reads unaffected): the handful of
# giant programs recompile per process, everything else stays cached.
_CACHE_MAX_SECS = float(os.environ.get("HMVEC_CACHE_MAX_COMPILE_SECS", "20"))
from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time

# Round-4 addition: two independent suite crashes (one cold-solo WRITE
# segfault, one concurrent READ abort) both died on cache entries for
# jit(hmcode_power) executables -- the native (de)serializer chokes on
# something in that program shape while thousands of other entries are
# fine.  Blacklist those entries entirely (both directions would need
# jax-internal patching for reads; skipping the write keeps the entry
# out of the cache, which also prevents the read path).  Cost: hmcode
# programs recompile per process (~10 s each).
_CACHE_NAME_BLACKLIST = ("hmcode",)


def _guarded_put(cache_key, module_name, executable, backend, compile_time):
    if compile_time > _CACHE_MAX_SECS:
        return
    if any(b in str(module_name) for b in _CACHE_NAME_BLACKLIST):
        return
    return _orig_put(cache_key, module_name, executable, backend,
                     compile_time)


_cc.put_executable_and_time = _guarded_put
# jax.compiler binds the name at call time through the module, so the
# monkeypatch above is sufficient; assert that assumption holds.
import jax._src.compiler as _compiler  # noqa: E402
assert _compiler.compilation_cache is _cc

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--quick", action="store_true", default=False,
        help="skip the tests marked 'slow' (the heaviest end-to-end "
             "compiles); the default profile runs everything")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heaviest end-to-end tests (skipped by --quick)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--quick"):
        skip = pytest.mark.skip(reason="--quick profile")
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip)
