"""Production serving pattern: precompile once, stream cosmology batches.

The production surface is a fused pipeline function (one XLA program)
wrapped by make_batched_fn (vmap over the parameter batch) or, on a
multi-chip mesh, parallel.sharding.make_sharded_batched_fn (batch axis
sharded over devices).  The pattern below is the recommended server
loop:

  1. build the fused fn on the static (zs, ks, ms) grid,
  2. warm it with one representative batch (pays compile once),
  3. serve: each request is one device call; on the tunneled TPU the
     whole batch costs one ~29 ms RPC + on-chip compute, i.e. the
     per-cosmology cost falls as 1/batch (bench.py's batch16 line
     measures 19.8 ms/cosmology on the real chip vs 46.6 single).

Runs on CPU here; the same code serves on TPU unchanged.
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from hmvec_tpu.pipeline import make_pmm_fn, make_batched_fn  # noqa: E402


def main():
    zs = np.linspace(0.1, 2.0, 4)
    ms = np.geomspace(2e10, 1e17, 64)
    ks = np.geomspace(1e-3, 10, 128)
    batch = 16

    fn = make_batched_fn(make_pmm_fn(zs, ks, ms, jit=False),
                         ("omch2", "As"))

    rng = np.random.default_rng(0)

    def make_request():
        return np.column_stack([rng.uniform(0.11, 0.13, batch),
                                rng.uniform(1.9e-9, 2.3e-9, batch)])

    # warm-up: one compile for the whole service lifetime
    t0 = time.time()
    np.asarray(fn(make_request()))
    print(f"compile+first batch: {time.time() - t0:.1f}s")

    lat = []
    for _ in range(5):
        theta = make_request()
        t0 = time.time()
        out = np.asarray(fn(theta))       # host fetch = honest latency
        lat.append(time.time() - t0)
        assert out.shape == (batch, zs.size, ks.size)
        assert np.isfinite(out).all()
    lat_ms = 1e3 * np.median(lat)
    print(f"steady-state: {lat_ms:.1f} ms / batch of {batch} "
          f"({lat_ms / batch:.2f} ms per cosmology) on "
          f"{jax.default_backend()}")


if __name__ == "__main__":
    main()
