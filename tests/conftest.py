"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the JAX-native way to exercise multi-chip sharding without TPUs
(SURVEY §4): every sharding/collective test here runs identically on a real
v5e-8 slice.

The environment's sitecustomize registers an `axon` TPU backend and pins
JAX_PLATFORMS=axon, so setting the env var alone is not enough — we override
through jax.config before any test imports trigger backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, (
    f"expected 8 forced CPU devices, got {jax.devices()}"
)
