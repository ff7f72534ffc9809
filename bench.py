"""Benchmark: batched Goldilocks coset-LDE + Poseidon Merkle-cap commit on
the real device (BASELINE.json config 2 — the NTT-kernel north-star metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "elems/s", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md); we anchor
against a conservative single-socket CPU estimate for rate-8 LDE + Merkle
commit of the same shape (plonky2-class CPU provers sustain ~2e7 LDE+commit
elems/s/socket on a modern x86; BASELINE.md target is >=10x that).

Env knobs: CITY_BENCH_LOG_N (default 20 — BASELINE config 2),
CITY_BENCH_BATCH (default 64), CITY_BENCH_REPS (default 3).
"""

import json
import os
import time


CPU_BASELINE_ELEMS_PER_S = 2.0e7


def main():
    log_n = int(os.environ.get("CITY_BENCH_LOG_N", "20"))
    batch = int(os.environ.get("CITY_BENCH_BATCH", "64"))
    reps = int(os.environ.get("CITY_BENCH_REPS", "3"))
    rate_bits, cap_height = 3, 4

    import jax
    import numpy as np
    from city_rollup_tpu.core import gl64
    from city_rollup_tpu.pipeline import jit_lde_commit

    rng = np.random.default_rng(0)
    vals = rng.integers(0, gl64.P, size=(batch, 1 << log_n), dtype=np.uint64)
    lo, hi = gl64.from_u64(vals)
    fn = jit_lde_commit(log_n, rate_bits, cap_height)

    # compile + warmup
    jax.block_until_ready(fn(lo, hi))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(lo, hi)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    elems = batch * (1 << (log_n + rate_bits))   # LDE output elements hashed
    value = elems / dt
    print(json.dumps({
        "metric": f"lde_commit elems/s (2^{log_n} x {batch} polys, rate 8, "
                  f"Poseidon cap {cap_height}, {jax.devices()[0].platform})",
        "value": round(value, 1),
        "unit": "elems/s",
        "vs_baseline": round(value / CPU_BASELINE_ELEMS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
