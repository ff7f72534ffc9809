"""Test environment: run on CPU with 8 virtual devices so multi-chip sharding
paths (jax.sharding.Mesh + shard_map collectives) are exercised without TPU
hardware. Set CITY_TPU_TESTS=1 to run on real devices instead."""

import os

if not os.environ.get("CITY_TPU_TESTS"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
