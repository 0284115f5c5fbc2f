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

# persistent compilation cache: repeat suite runs skip the XLA compiles that
# dominate wall time
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

assert len(jax.devices()) == 8, (
    f"expected 8 forced CPU devices, got {jax.devices()}"
)
