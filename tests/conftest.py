"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(hypothesis batch over a jax.sharding.Mesh) are exercised without TPU
hardware.  Must set the env vars before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
