"""Flagship jittable pipelines: batched coset-LDE + Merkle-cap commitment.

This is the prover's hot path (every wire/quotient polynomial commitment runs
it; reference: plonky2's LDE + MerkleTree build inside CircuitData::prove,
SURVEY.md §3.1 HOT LOOPS) packaged as a single jit-compiled function for
benchmarking and as the single-chip compile-check entry point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .core import merkle, ntt, poseidon


def lde_commit(lo, hi, *, log_n: int, rate_bits: int, cap_height: int):
    """coeffs (B, 2^log_n) -> Merkle cap (2^cap_height, 4) over the LDE rows.

    One fused device graph: batched NTT/LDE, per-row leaf hashing, log-depth
    tree reduction. Jittable (static shapes throughout).
    """
    lde = ntt.coset_lde((lo, hi), log_n, rate_bits)
    leaves = (lde[0].T, lde[1].T)                    # (M, B)
    d = merkle.hash_leaves(leaves)
    while d[0].shape[0] > (1 << cap_height):
        d = poseidon.two_to_one((d[0][0::2], d[1][0::2]),
                                (d[0][1::2], d[1][1::2]))
    return d


@functools.lru_cache(maxsize=None)
def jit_lde_commit(log_n: int, rate_bits: int, cap_height: int):
    return jax.jit(functools.partial(lde_commit, log_n=log_n,
                                     rate_bits=rate_bits,
                                     cap_height=cap_height))
