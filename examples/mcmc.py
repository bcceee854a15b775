"""Batched MCMC over cosmological parameters with one compiled pipeline.

The serving story the reference cannot tell: a Metropolis ensemble whose
every step evaluates B cosmologies in ONE XLA program
(pipeline.make_batched_fn), with the likelihood differentiable end-to-end
if you want gradient-based samplers instead.

Mock data: Pmm at a fiducial (omch2, As); chains recover it.  Runs on CPU
in ~30 s; on a TPU the batch is one ~12 ms-per-cosmology call (see
bench.py batch16 line).
"""

import numpy as np

import jax
import jax.numpy as jnp

from hmvec_tpu.pipeline import make_pmm_fn, make_batched_fn


def main(seed: int = 0, nwalkers: int = 8, nsteps: int = 150):
    zs = np.linspace(0.1, 2.0, 4)
    ms = np.geomspace(2e10, 1e17, 48)
    ks = np.geomspace(1e-3, 10.0, 64)

    fn = make_pmm_fn(zs, ks, ms, jit=False)
    bf = make_batched_fn(fn, ("omch2", "As"))

    truth = np.array([0.1198, 2.2e-9])
    data = np.asarray(fn({"omch2": truth[0], "As": truth[1]}))
    sigma = 0.02 * data                      # 2% mock errors

    @jax.jit
    def logL(theta):                         # (B, 2) -> (B,)
        model = bf(theta)
        return -0.5 * jnp.sum(((model - data) / sigma) ** 2, axis=(1, 2))

    rng = np.random.default_rng(seed)
    scale = np.array([1.2e-4, 2.5e-12])  # ~ posterior sigma
    theta = truth[None, :] + rng.normal(size=(nwalkers, 2)) * scale
    ll = np.asarray(logL(jnp.asarray(theta)))

    chain = []
    acc = 0
    for _ in range(nsteps):
        prop = theta + rng.normal(size=theta.shape) * scale
        llp = np.asarray(logL(jnp.asarray(prop)))    # B cosmologies, 1 call
        take = np.log(rng.uniform(size=nwalkers)) < (llp - ll)
        theta = np.where(take[:, None], prop, theta)
        ll = np.where(take, llp, ll)
        acc += take.sum()
        chain.append(theta.copy())

    chain = np.array(chain[nsteps // 3:])            # drop burn-in
    flat = chain.reshape(-1, 2)
    print(f"acceptance: {acc / (nsteps * nwalkers):.2f}")
    for i, name in enumerate(("omch2", "As")):
        mu, sd = flat[:, i].mean(), flat[:, i].std()
        print(f"{name}: {mu:.4e} +- {sd:.1e}  (truth {truth[i]:.4e}, "
              f"off by {abs(mu - truth[i]) / sd:.2f} sigma)")


if __name__ == "__main__":
    main()
