"""city_rollup_tpu — a TPU-native (JAX/XLA/Pallas) Plonky2-class zk-rollup proving stack.

Brand-new framework with the capabilities of QEDProtocol/city-rollup (see SURVEY.md):
Goldilocks field arithmetic, Poseidon hashing, NTT/LDE, FRI, recursive aggregation,
versioned Merkle state store, distributed job DAG, and rollup services — designed
TPU-first rather than ported from the Rust reference.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the prover compiles one executable per
# (transform, shape) pair; caching them on disk makes every process after
# the first (workers, benches) start warm. DEVICE backends only: XLA:CPU
# persists AOT objects whose embedded machine-feature strings can mismatch
# the executing host (cpu_aot_loader errors / SIGILL risk / reload stalls),
# so the CPU backend always compiles fresh. Opt out entirely with
# CITY_ROLLUP_XLA_CACHE=off.
import os as _os

# The deployment's sitecustomize may pin jax_platforms to a TPU plugin at
# import time, which silently overrides the JAX_PLATFORMS env var. Honor an
# explicit CITY_FORCE_PLATFORM (e.g. "cpu" for offline corpus generation /
# CI) by re-pinning via jax.config before any backend initializes.
_force = _os.environ.get("CITY_FORCE_PLATFORM")
if _force:
    try:
        import jax as _jax_f
        _jax_f.config.update("jax_platforms", _force)
    except Exception:                                    # pragma: no cover
        pass

_platforms = _os.environ.get("JAX_PLATFORMS", "") or "default"
if _force:
    _platforms = _force
_cache = _os.environ.get(
    "CITY_ROLLUP_XLA_CACHE",
    _os.path.expanduser("~/.cache/city_rollup_tpu/xla-" +
                        _platforms.replace(",", "-")))
if "cpu" in _platforms.lower():
    # XLA:CPU persists AOT objects whose embedded machine-feature strings
    # can mismatch the executing host (cpu_aot_loader errors, stalls,
    # SIGILL risk) — never cache for an explicit CPU backend unless the
    # user opts in via CITY_ROLLUP_XLA_CACHE=<dir>.
    if "CITY_ROLLUP_XLA_CACHE" not in _os.environ:
        _cache = "off"
if _cache != "off":
    try:
        import jax as _jax
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:                                    # pragma: no cover
        pass
