"""Test harness: force JAX onto a virtual 8-device CPU platform so every
multi-chip code path is exercised without TPU hardware (SURVEY.md §4.4).

Note: this environment pre-configures an `axon` TPU platform whose default
wins over the JAX_PLATFORMS env var, so we must also update jax.config
explicitly before any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
