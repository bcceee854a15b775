"""Global precision / device configuration for hmvec_tpu.

The halo-model pipeline spans ~6 decades in k and ~10 in mass, and the
north-star accuracy target is <=1e-5 relative error against the float64
numpy twin (``hmvec_tpu.twin``).  We therefore enable JAX x64 by default
(TPU executes f64 elementwise math natively-emulated; the only f64 gap is
complex128 FFTs, which this package never uses -- see
``hmvec_tpu.ops.sine_transform``).

Set the environment variable ``HMVEC_TPU_NO_X64=1`` before importing
``hmvec_tpu`` to opt out (f32 fast path).
"""

from __future__ import annotations

import os

import jax

if not os.environ.get("HMVEC_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402  (after x64 flag on purpose)


def default_dtype():
    """The package-wide real dtype (f64 unless HMVEC_TPU_NO_X64 is set)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def asarray(x):
    """Convert to a jnp array in the package default dtype."""
    return jnp.asarray(x, dtype=default_dtype())
