"""Train a neural emulator of the halo-model P_mm(z,k) on-device.

The reference re-runs its numpy pipeline for every MCMC sample; here the
framework generates its own training set with the batched serving surface
(a few fused vmapped programs), fits a small MXU-friendly MLP in ONE
`lax.scan` XLA program, and then serves P(k) at MLP cost -- fully
differentiable, so Fisher derivatives of the emulated spectrum are one
`jax.jacfwd` away.

Run anywhere (CPU ok); on the TPU both the training-set generation and the
training loop run on the chip.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu import pipeline
from hmvec_tpu.models.emulator import fit_emulator, pipeline_target

zs = np.array([0.0, 0.5, 1.0])
ks = np.geomspace(1e-3, 10.0, 128)
ms = np.geomspace(2e10, 1e17, 96)

pmm = pipeline.make_pmm_fn(zs, ks, ms, jit=False)
names = ("omch2", "ombh2", "ns")
lo = [0.10, 0.020, 0.92]
hi = [0.14, 0.024, 1.00]
target = pipeline_target(pmm, names)

t0 = time.time()
em, info = fit_emulator(target, lo, hi, n_train=256, n_val=64,
                        widths=(128, 128, 128), steps=2000,
                        learning_rate=3e-3, log_y=True, chunk=32,
                        seed=0, key=0, verbose=True)
print(f"train-set generation + fit: {time.time() - t0:.1f} s "
      f"({info['sizes']} MLP)")

# emulator vs direct pipeline at the fiducial point
theta0 = jnp.array([0.1198, 0.02225, 0.9645])
direct = np.asarray(target(theta0))
fast = np.asarray(em(theta0))
rel = np.abs(fast / direct - 1.0)
print(f"fiducial-point emulator error: max {rel.max():.2e}, "
      f"median {np.median(rel):.2e}")

# serving speed: emulate a 512-cosmology chain batch in one call
chain = jnp.asarray(np.random.default_rng(1).uniform(lo, hi, (512, 3)))
emb = jax.jit(em.__call__)
emb(chain).block_until_ready()
t0 = time.time()
out = emb(chain).block_until_ready()
print(f"emulated 512 cosmologies in {1e3 * (time.time() - t0):.2f} ms "
      f"({out.shape} outputs)")

# Fisher derivatives through the emulator
jac = jax.jacfwd(em)(theta0)
print("d ln P / d theta at fiducial (k=0.1, z=0):",
      np.asarray(jac)[np.searchsorted(ks, 0.1), :] / direct[np.searchsorted(ks, 0.1)])
