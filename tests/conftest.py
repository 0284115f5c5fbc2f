"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the JAX-native way to exercise multi-chip sharding without TPUs
(SURVEY §4): every sharding/collective test here runs identically on a real
v5e-8 slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
