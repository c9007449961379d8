"""Test config: force CPU with 8 virtual devices so sharding tests run anywhere.

The sandbox's sitecustomize registers a remote-TPU ("axon") PJRT plugin and
forces ``jax_platforms="axon,cpu"`` via ``jax.config.update`` at interpreter
startup, which both overrides the ``JAX_PLATFORMS`` env var and routes every
eager op through a network tunnel. Tests must run hermetically on host CPU,
so we set the env var (for subprocesses) *and* update the config back after
import (for this process), before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Keep float32 (default); physics parity tolerances assume it.
