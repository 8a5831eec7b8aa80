"""Test configuration: force CPU backend with 8 virtual devices, x64.

The axon TPU plugin ignores the JAX_PLATFORMS env var in this
environment, so the platform must be forced through jax.config before
any jax usage.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
if os.path.isdir("/root/.cache"):
    os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
