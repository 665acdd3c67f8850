"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (fast iteration, multi-device sharding via
--xla_force_host_platform_device_count); the real TPU chip is exercised by bench.py.
NOTE: in this environment the JAX_PLATFORMS env var is overridden by the axon plugin,
so the platform must be forced through jax.config before any backend is touched.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
