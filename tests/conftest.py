"""Test environment: run on CPU with 8 virtual devices so multi-chip sharding
paths (jax.sharding.Mesh + shard_map collectives) are exercised without TPU
hardware. Set CITY_TPU_TESTS=1 to run on the real device platform instead.

NOTE: the harness's sitecustomize registers the real-TPU PJRT plugin and
pins jax_platforms at import time, so env vars alone don't switch platforms —
we override via jax.config before any backend is initialized.
"""

import os

if not os.environ.get("CITY_TPU_TESTS"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        # optimization_level=1: the CPU backend's default LLVM pipeline takes
        # ~50 s to compile one Poseidon round body; level 1 compiles in <1 s
        # and tests don't need peak CPU throughput.
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
            " --xla_backend_optimization_level=1").strip()
    # NO persistent compile cache on the CPU backend: XLA:CPU AOT cache
    # entries embed compile-machine feature strings (incl. pseudo-features
    # like prefer-no-scatter); reloading them trips cpu_aot_loader feature
    # mismatches and can stall execution outright. Must be set BEFORE the
    # package import, which would otherwise enable the cache.
    os.environ["CITY_ROLLUP_XLA_CACHE"] = "off"
    import jax
    jax.config.update("jax_platforms", "cpu")
