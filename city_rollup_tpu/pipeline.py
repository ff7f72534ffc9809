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

    On a real TPU the commit runs through the Pallas kernels in TRANSPOSED
    layout: the LDE output (num_polys, M) is already column-per-leaf, so
    leaf hashing needs zero transposes and each tree level is one
    lane-sliced kernel call (core/pallas_poseidon.py).
    """
    from .core import pallas_poseidon as pp
    lde = ntt.coset_lde((lo, hi), log_n, rate_bits)
    m = lde[0].shape[-1]
    if pp.available() and m >= 1 << 15 and lde[0].shape[0] > 4:
        d = pp.hash_rows_t(lde)                      # (4, M)
        while d[0].shape[-1] > max(1 << cap_height, 1 << 14):
            d = pp.reduce_level_t(d)
        dd = (d[0].T, d[1].T)                        # small: finish in jnp
        while dd[0].shape[0] > (1 << cap_height):
            dd = poseidon.two_to_one((dd[0][0::2], dd[1][0::2]),
                                     (dd[0][1::2], dd[1][1::2]))
        return dd
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


def lde_commit_streamed(lo, hi, *, log_n: int, rate_bits: int,
                        cap_height: int, chunk: int = 8):
    """Memory-lean commit for LDEs too large to materialize at once
    (2^22 x 64 polys would need a 16 GB LDE buffer): polynomials are
    processed ``chunk`` (= sponge RATE) at a time, each slab LDE'd and
    absorbed into a resident (12, M) sponge state — one Poseidon absorb per
    slab, exactly the plonky2 leaf-hash schedule, never holding more than
    one slab's LDE. TPU-only (Pallas absorb kernel).
    """
    from .core import pallas_poseidon as pp
    b = lo.shape[0]
    assert b % chunk == 0 and chunk <= 8
    m = 1 << (log_n + rate_bits)
    state = (jnp.zeros((12, m), jnp.uint32), jnp.zeros((12, m), jnp.uint32))
    for c in range(0, b, chunk):
        slab = ntt.coset_lde((lo[c:c + chunk], hi[c:c + chunk]),
                             log_n, rate_bits)
        state = pp.absorb_t(state, slab)
    d = (state[0][:4], state[1][:4])
    while d[0].shape[-1] > max(1 << cap_height, 1 << 14):
        d = pp.reduce_level_t(d)
    dd = (d[0].T, d[1].T)
    while dd[0].shape[0] > (1 << cap_height):
        dd = poseidon.two_to_one((dd[0][0::2], dd[1][0::2]),
                                 (dd[0][1::2], dd[1][1::2]))
    return dd


@functools.lru_cache(maxsize=None)
def jit_lde_commit_streamed(log_n: int, rate_bits: int, cap_height: int,
                            chunk: int = 8):
    return jax.jit(functools.partial(lde_commit_streamed, log_n=log_n,
                                     rate_bits=rate_bits,
                                     cap_height=cap_height, chunk=chunk))
