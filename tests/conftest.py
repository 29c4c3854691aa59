"""Test harness: force an 8-virtual-device CPU platform.

This is the TPU-native analogue of a fake multi-node backend (SURVEY §4):
data-parallel tests run on a real 8-device jax Mesh without TPU hardware.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU tunnel environment pins JAX_PLATFORMS=axon and may win the env
# race; the config update below is authoritative either way.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

