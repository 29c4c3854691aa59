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

# Persistent XLA compilation cache: several tests compile the same train-step
# or model-forward HLO (resume tests re-enter train(), driver tests rebuild
# scorers); cache hits turn those repeat compiles into file reads.  Lives
# outside the repo tree; safe to delete any time.
_cache_dir = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "vadcl_tpu_xla_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

