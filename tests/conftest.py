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
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if os.environ.get("CITY_TESTS_FAST_EXEC"):
        # Heavy integration runs (full-block proofs): default LLVM
        # optimization (fast EXECUTION, ~50 s compiles) + a CPU-only
        # persistent cache so repeat runs skip the compiles. Safe because
        # the cache dir is keyed per JAX_PLATFORMS — the cross-backend AOT
        # feature-mismatch poisoning came from sharing one dir with the
        # TPU plugin's entries.
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault(
            "CITY_ROLLUP_XLA_CACHE",
            os.path.expanduser("~/.cache/city_rollup_tpu/xla-cputests"))
    else:
        # Default: optimization_level=1 — the CPU backend's default LLVM
        # pipeline takes ~50 s to compile one Poseidon round body; level 1
        # compiles in <1 s. Right for the many small unit-test circuits,
        # but EXECUTES 10-50x slower — use CITY_TESTS_FAST_EXEC=1 for the
        # heavy slow-marked integration tests.
        flags += " --xla_backend_optimization_level=1"
        # NO persistent compile cache here: XLA:CPU AOT entries embed
        # compile-machine feature strings; stale/foreign entries trip
        # cpu_aot_loader mismatches and can stall execution outright.
        os.environ["CITY_ROLLUP_XLA_CACHE"] = "off"
    os.environ["XLA_FLAGS"] = flags
    import jax
    jax.config.update("jax_platforms", "cpu")
