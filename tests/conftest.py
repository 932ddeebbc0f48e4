"""Test harness config: virtual 8-device CPU mesh, repo-root imports.

In this environment jax is pre-imported by a sitecustomize hook with the TPU
("axon") platform selected via JAX_PLATFORMS, so env vars alone cannot
redirect tests to CPU — ``jax.config.update`` can, as long as it runs before
any backend is initialized. XLA_FLAGS is read lazily at CPU-backend init, so
setting it here still yields the 8 virtual devices.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
