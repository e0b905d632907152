"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4: the standard
`xla_force_host_platform_device_count` simulation).

Note: this environment's axon sitecustomize force-selects the TPU platform
via ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
which overrides the JAX_PLATFORMS env var — so the override must happen at
the config level, after importing jax.
"""
import os

# Must be set before the CPU backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")
