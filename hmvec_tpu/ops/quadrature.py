"""Device-side quadrature and finite differences.

Integral reductions over the mass/k axes are the backbone of the halo model
(reference: np.trapz at hmvec/hmvec.py:526,533, scipy simpson at
cosmology.py:265).  Here they are static-weight contractions so XLA can fuse
them into neighbouring elementwise work or route them to the MXU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.weights import simpson_weights, trapz_weights


def trapz(y, x=None, *, weights=None, axis=-1):
    """np.trapz-equivalent along ``axis`` with a static grid.

    ``x`` must be a concrete (numpy) grid; pass ``weights`` to reuse a
    precomputed weight vector.
    """
    if weights is None:
        weights = trapz_weights(np.asarray(x))
    w = jnp.asarray(weights, dtype=y.dtype)
    return jnp.moveaxis(y, axis, -1) @ w


def simpson(y, x=None, *, weights=None, axis=-1):
    """scipy.integrate.simpson-equivalent along ``axis`` (static grid)."""
    if weights is None:
        weights = simpson_weights(np.asarray(x))
    w = jnp.asarray(weights, dtype=y.dtype)
    return jnp.moveaxis(y, axis, -1) @ w


def interp(x, y, bounds_error=False, fill_value=0.0):
    """Reference-signature 1-d linear interpolator factory (utils.py:6-7).

    Returns a callable evaluating jnp.interp on the fixed (x, y) table with
    ``fill_value`` outside the range (the reference's scipy interp1d default
    configuration).  ``bounds_error=True`` is not supported under jit
    (shape-dependent raise) and is rejected eagerly.
    """
    if bounds_error:
        raise NotImplementedError("bounds_error=True is not jit-compatible; "
                                  "use fill_value instead")
    xt = jnp.asarray(x)
    yt = jnp.asarray(y)

    def _eval(xn):
        return jnp.interp(jnp.asarray(xn), xt, yt,
                          left=fill_value, right=fill_value)

    return _eval


def trapz_traced(y, x, axis=-1):
    """Trapezoid where ``x`` is a traced 1-d jnp array (differentiable grid)."""
    dx = jnp.diff(x)
    y = jnp.moveaxis(y, axis, -1)
    return jnp.sum((y[..., 1:] + y[..., :-1]) * dx / 2.0, axis=-1)


def gradient(f, x, axis=-1):
    """np.gradient(f, x, axis=axis) with default edge_order=1 semantics.

    Second-order central differences in the interior (nonuniform-aware),
    first-order one-sided at the edges -- exactly numpy's formula, so the
    mass-function dln(sigma^-1)/dlnm (reference: hmvec.py:183) matches the
    twin bit-for-bit in f64.
    """
    f = jnp.moveaxis(f, axis, -1)
    x = jnp.asarray(x, dtype=f.dtype)
    hd = x[1:-1] - x[:-2]   # backward spacing
    hs = x[2:] - x[1:-1]    # forward spacing
    denom = hd * hs * (hd + hs)
    interior = (
        hd**2 * f[..., 2:] + (hs**2 - hd**2) * f[..., 1:-1] - hs**2 * f[..., :-2]
    ) / denom
    left = (f[..., 1:2] - f[..., 0:1]) / (x[1] - x[0])
    right = (f[..., -1:] - f[..., -2:-1]) / (x[-1] - x[-2])
    out = jnp.concatenate([left, interior, right], axis=-1)
    return jnp.moveaxis(out, -1, axis)
