"""Test harness: force CPU with an 8-device virtual mesh so multi-chip sharding
(data parallelism over a `jax.sharding.Mesh`) is exercised without TPU hardware.

Note: this image's sitecustomize force-registers a remote-TPU ("axon") backend that wins
over the JAX_PLATFORMS env var, so the reliable override is `jax.config.update` after
import. XLA_FLAGS must still be set before first backend use to get 8 virtual devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
