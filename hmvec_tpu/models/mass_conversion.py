"""NFW mass-definition conversion M1@Delta1 -> M2@Delta2.

Reference: hmvec/hmvec.py:748-798 -- solves M1 F(C1)^-1 = M2 F(C2)^-1 with
C2 = C1 ((M2/M1)(drho1/drho2))^(1/3) by a scipy secant iteration on log M2.
Here: fixed-count bisection on log M2 (the objective is strictly monotone),
fully vectorized over the (z, m) grid, jit- and grad-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.rootfind import solve_bisection_root
from .profiles import fcon


def mdelta_from_mdelta(M1, C1, delta_rhos1, delta_rhos2,
                       num_iter: int = 90, log_bracket: float = 10.0):
    """Convert masses M1 (nm,) at overdensity density delta_rhos1 (nz,) to
    M2 (nz, nm) at delta_rhos2 (nz,), given concentrations C1 (nz, nm).

    Returns M2 with the same (nz, nm) shape as C1.
    """
    M1g = jnp.asarray(M1)[None, :] + 0.0 * C1
    logM1 = jnp.log(M1g)
    dr1 = jnp.asarray(delta_rhos1)[:, None]
    dr2 = jnp.asarray(delta_rhos2)[:, None]
    F1 = 1.0 / fcon(C1)

    def objective(logM2):
        # strictly decreasing in logM2
        C2 = C1 * (jnp.exp(logM2 - logM1) * (dr1 / dr2)) ** (1.0 / 3.0)
        return M1g * F1 - jnp.exp(logM2) / fcon(C2)

    logM2 = solve_bisection_root(objective, logM1 - log_bracket,
                                 logM1 + log_bracket, num_iter)
    return jnp.exp(logM2)


def mdelta_from_mdelta_unvectorized(M1, C1, delta_rhos1, delta_rhos2,
                                    num_iter: int = 90,
                                    log_bracket: float = 10.0):
    """Elementwise-broadcast variant (reference hmvec.py:770-798, where
    it is the scipy-newton workhorse): same fixed-trip bisection as
    mdelta_from_mdelta but without the (nz, nm) grid packing -- scalars
    or any mutually broadcastable shapes.  Returns M2 with the broadcast
    shape."""
    M1, C1, dr1, dr2 = jnp.broadcast_arrays(
        jnp.asarray(M1, dtype=jnp.float64), jnp.asarray(C1),
        jnp.asarray(delta_rhos1), jnp.asarray(delta_rhos2))
    logM1 = jnp.log(M1)
    F1 = 1.0 / fcon(C1)

    def objective(logM2):
        C2 = C1 * (jnp.exp(logM2 - logM1) * (dr1 / dr2)) ** (1.0 / 3.0)
        return M1 * F1 - jnp.exp(logM2) / fcon(C2)

    logM2 = solve_bisection_root(objective, logM1 - log_bracket,
                                 logM1 + log_bracket, num_iter)
    return jnp.exp(logM2)
