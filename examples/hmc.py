"""Hamiltonian Monte Carlo over cosmological parameters -- the sampler the
reference cannot run at all: every leapfrog step needs dlogL/dtheta
THROUGH the halo-model pipeline, which here is one `jax.grad` of the
fused Pmm program (pipeline.make_pmm_fn), not a finite-difference stencil.

The entire sampler -- leapfrog integrator, Metropolis correction, the
chain loop -- is ONE jitted XLA program (`lax.scan` over steps, `vmap`
over chains), so on a TPU the whole run is a single device program with
no host round-trips.  The HMC mass matrix is the Gauss-Newton Fisher of
the same differentiable model (one `jax.jacfwd`), which whitens the
strong (omch2, As) amplitude degeneracy for free.

Mock data: Pmm at a fiducial (omch2, As) with 2% errors; validation
checks the HMC posterior against the analytic Laplace approximation
(inverse Fisher), near-exact for this linearizable likelihood.

Runs on CPU in ~1 min (tiny grids); see examples/mcmc.py for the
batched random-walk variant.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hmvec_tpu.pipeline import make_pmm_fn

TRUTH = np.array([0.1198, 2.2e-9])          # (omch2, As)
SCALE = np.array([1.5e-4, 3.0e-12])         # rough sigmas: standardizes x


def build_logpost(zs, ks, ms):
    """Standardized-coordinate log posterior x -> logL(theta(x)) and the
    mock data it is conditioned on."""
    fn = make_pmm_fn(zs, ks, ms, jit=False)
    data = np.asarray(fn({"omch2": TRUTH[0], "As": TRUTH[1]}))
    sigma = 0.02 * data

    def logpost(x):
        theta = jnp.asarray(TRUTH) + x * jnp.asarray(SCALE)
        model = fn({"omch2": theta[0], "As": theta[1]})
        return -0.5 * jnp.sum(((model - data) / sigma) ** 2)

    return logpost, fn, data, sigma


def hmc_chain(logpost, mass, nsteps=120, eps=0.5, nleap=8, nchains=4,
              seed=0):
    """(nchains, nsteps, 2) samples + acceptance rate.  One jitted program:
    scan over steps, vmap over chains, grad through the pipeline.

    ``mass``: HMC mass matrix (momenta ~ N(0, mass), kinetic
    0.5 p^T mass^-1 p, position update eps * mass^-1 p) -- pass the
    Fisher matrix to whiten the posterior."""
    grad_lp = jax.grad(logpost)
    chol_m = jnp.linalg.cholesky(jnp.asarray(mass))
    minv = jnp.linalg.inv(jnp.asarray(mass))

    def kinetic(p):
        return 0.5 * p @ minv @ p

    def leapfrog(x, p):
        p = p + 0.5 * eps * grad_lp(x)
        def body(carry, _):
            x, p = carry
            x = x + eps * (minv @ p)
            p = p + eps * grad_lp(x)
            return (x, p), None
        (x, p), _ = jax.lax.scan(body, (x, p), None, length=nleap - 1)
        x = x + eps * (minv @ p)
        p = p + 0.5 * eps * grad_lp(x)
        return x, p

    def step(carry, key):
        x, lp = carry
        kp, ku = jax.random.split(key)
        p0 = chol_m @ jax.random.normal(kp, x.shape)
        x1, p1 = leapfrog(x, p0)
        lp1 = logpost(x1)
        dH = (lp1 - kinetic(p1)) - (lp - kinetic(p0))
        acc = jnp.log(jax.random.uniform(ku)) < dH
        x = jnp.where(acc, x1, x)
        lp = jnp.where(acc, lp1, lp)
        return (x, lp), (x, acc)

    @jax.jit
    def run(key, x0):
        keys = jax.random.split(key, nsteps)
        (_, _), (xs, accs) = jax.lax.scan(step, (x0, logpost(x0)), keys)
        return xs, accs

    key = jax.random.PRNGKey(seed)
    x0s = jax.random.normal(jax.random.fold_in(key, 1), (nchains, 2))
    xs, accs = jax.vmap(run)(jax.random.split(key, nchains), x0s)
    return np.asarray(xs), float(np.mean(np.asarray(accs)))


def main():
    zs = np.linspace(0.1, 2.0, 4)
    ms = np.geomspace(2e10, 1e17, 48)
    ks = np.geomspace(1e-3, 10.0, 64)

    logpost, fn, data, sigma = build_logpost(zs, ks, ms)

    # Gauss-Newton Fisher in standardized coords: one jacfwd of the
    # noise-weighted model (this is examples/fisher.py's object, reused
    # here as the HMC mass matrix AND the validation target)
    def model_x(x):
        theta = jnp.asarray(TRUTH) + x * jnp.asarray(SCALE)
        return fn({"omch2": theta[0], "As": theta[1]}) / jnp.asarray(sigma)
    J = np.asarray(jax.jacfwd(model_x)(jnp.zeros(2))).reshape(-1, 2)
    fisher = J.T @ J
    cov_laplace = np.linalg.inv(fisher)

    xs, acc_rate = hmc_chain(logpost, fisher)
    burn = xs.shape[1] // 3
    flat = xs[:, burn:, :].reshape(-1, 2)
    mean = flat.mean(axis=0)
    cov = np.cov(flat.T)

    print(f"acceptance rate        : {acc_rate:.2f}")
    print(f"posterior mean (std.)  : {mean}  (truth at 0)")
    print(f"posterior sigma (HMC)  : {np.sqrt(np.diag(cov))}")
    print(f"posterior sigma (Laplace/Fisher): {np.sqrt(np.diag(cov_laplace))}")
    rho_h = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    rho_f = cov_laplace[0, 1] / np.sqrt(cov_laplace[0, 0] * cov_laplace[1, 1])
    print(f"(omch2, As) correlation: HMC {rho_h:+.2f} vs Laplace {rho_f:+.2f}")

    # validation: sampler consistent with the Laplace approximation
    assert 0.5 < acc_rate <= 1.0, acc_rate
    assert np.all(np.abs(mean) < 5.0 * np.sqrt(np.diag(cov))), (mean, cov)
    ratio = np.sqrt(np.diag(cov) / np.diag(cov_laplace))
    assert np.all((ratio > 0.6) & (ratio < 1.6)), ratio
    assert abs(rho_h - rho_f) < 0.25, (rho_h, rho_f)
    print("OK: HMC posterior matches the Laplace/Fisher analysis")


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    main()
