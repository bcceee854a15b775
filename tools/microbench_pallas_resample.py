"""Time the Pallas resample against the XLA gather path on real TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hmvec_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from hmvec_tpu.ops.sine_transform import resample_uniform_source

    nz, nm, nkt, nk = 20, 200, 2049, 1001
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((nz, nm, nkt)))
    scales = jnp.asarray(np.exp(rng.uniform(np.log(0.02), np.log(3.0),
                                            (nz, nm))))
    ks = np.geomspace(1e-4, 100, nk)
    dkt = 2.0 * np.pi / 20.0

    def timeit(fn, *a):
        out = np.asarray(fn(*a))
        np.asarray(fn(*a))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3, out

    f_g = jax.jit(lambda u, s: resample_uniform_source(u, dkt, s, ks,
                                                       method="gather").sum())
    f_p = jax.jit(lambda u, s: resample_uniform_source(u, dkt, s, ks,
                                                       method="pallas").sum())
    tg, outg = timeit(f_g, u, scales)
    print(f"gather path: {tg:8.2f} ms", flush=True)
    tp, outp = timeit(f_p, u, scales)
    print(f"pallas path: {tp:8.2f} ms", flush=True)
    print(f"sums: gather {outg:.17e} pallas {outp:.17e} "
          f"equal={outg == outp}")


if __name__ == "__main__":
    main()
