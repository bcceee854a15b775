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
