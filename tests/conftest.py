"""Test env: force an 8-device virtual CPU backend BEFORE jax initializes.

This is the JAX-native 'fake backend' for exercising mesh sharding without
TPU hardware; the real-chip path is covered by bench.py / __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# what actually forces the CPU backend (otherwise every test op is an RPC
# through the TPU tunnel and the suite takes minutes per test).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
