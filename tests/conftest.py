"""Test configuration: run everything on CPU with 8 virtual devices.

The environment pins JAX_PLATFORMS=axon (one real TPU chip); tests instead
use the CPU backend with 8 fake devices so mesh/sharding tests run anywhere —
the TPU equivalent of "test multi-node without a cluster" (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms post-import; override it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
