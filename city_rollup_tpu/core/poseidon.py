"""Batched Poseidon permutation in JAX (TPU-first design).

The permutation is data-parallel over arbitrary leading batch dims: state is a
``(lo, hi)`` uint32 limb pair of shape ``(..., 12)``. The MDS layer is expressed
as a single 16-bit-limb integer matmul (MXU/VPU friendly, exact: max accumulator
< 2^26), and rounds run under ``lax.scan`` so the jitted graph stays small.

This is the device twin of core.poseidon_host (bit-identical outputs); the
Merkle tree builder and the FRI committer batch millions of these per proof.
Reference role: plonky2 PoseidonHash consumed by every hashing site in
city-rollup (SURVEY.md §2.14).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import gl64
from . import poseidon_params as params

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)

WIDTH = params.WIDTH
RATE = params.SPONGE_RATE

# Round-constant tables as (30, 12) uint32 device constants.
_RC = np.array(params.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(
    params.N_ROUNDS, WIDTH)
_RC_LO = jnp.asarray((_RC & 0xFFFFFFFF).astype(np.uint32))
_RC_HI = jnp.asarray((_RC >> 32).astype(np.uint32))

# Full MDS matrix (12x12 small ints), int32 for the limb matmul.
_MDS = np.zeros((WIDTH, WIDTH), dtype=np.int32)
for _r in range(WIDTH):
    for _i in range(WIDTH):
        _MDS[_r, (_i + _r) % WIDTH] += params.MDS_MATRIX_CIRC[_i]
    _MDS[_r, _r] += params.MDS_MATRIX_DIAG[_r]
_MDS_J = jnp.asarray(_MDS)


def _mds_layer(state):
    """Exact MDS multiply via 16-bit limb decomposition + int32 matmul.

    state: (lo, hi) of shape (..., 12). Entries < 2^64; MDS entries <= 41;
    per-limb accumulator < 41 * 12 * 2^16 < 2^26 — safely inside int32.
    """
    lo, hi = state
    limbs = jnp.stack(
        [lo & _MASK16, lo >> 16, hi & _MASK16, hi >> 16], axis=-1
    ).astype(jnp.int32)                      # (..., 12, 4)
    acc = jnp.einsum(
        "...ik,ri->...rk", limbs, _MDS_J,
        preferred_element_type=jnp.int32)     # (..., 12, 4)
    acc = acc.astype(_U32)
    # Recombine limb accumulators (positions 0,16,32,48 bits) into 96-bit value.
    b0 = acc[..., 0] & _MASK16
    t1 = (acc[..., 0] >> 16) + acc[..., 1]
    b1 = t1 & _MASK16
    t2 = (t1 >> 16) + acc[..., 2]
    b2 = t2 & _MASK16
    t3 = (t2 >> 16) + acc[..., 3]
    b3 = t3 & _MASK16
    t4 = t3 >> 16
    n0 = b0 | (b1 << 16)
    n1 = b2 | (b3 << 16)
    n2 = t4
    return gl64._reduce128(n0, n1, n2, jnp.zeros_like(n2))


def _constant_layer(state, round_idx):
    rc_lo = jax.lax.dynamic_index_in_dim(_RC_LO, round_idx, keepdims=False)
    rc_hi = jax.lax.dynamic_index_in_dim(_RC_HI, round_idx, keepdims=False)
    return gl64.add(state, (jnp.broadcast_to(rc_lo, state[0].shape),
                            jnp.broadcast_to(rc_hi, state[1].shape)))


def _full_round(state, round_idx):
    state = _constant_layer(state, round_idx)
    state = gl64.exp7(state)
    return _mds_layer(state)


def _partial_round(state, round_idx):
    state = _constant_layer(state, round_idx)
    lane0 = (state[0][..., 0:1], state[1][..., 0:1])
    lane0 = gl64.exp7(lane0)
    lo = jnp.concatenate([lane0[0], state[0][..., 1:]], axis=-1)
    hi = jnp.concatenate([lane0[1], state[1][..., 1:]], axis=-1)
    return _mds_layer((lo, hi))


def _full_body(carry, r):
    return _full_round(carry, r), None


def _partial_body(carry, r):
    return _partial_round(carry, r), None


# Batch size above which the Pallas TPU kernels (core.pallas_poseidon) take
# over: below it, per-call overhead and per-shape Mosaic compiles outweigh
# the ~3x throughput win. Dispatch happens at trace time (static shapes).
_PALLAS_MIN_BATCH = 4096


def _use_pallas(batch_elems: int) -> bool:
    if batch_elems < _PALLAS_MIN_BATCH:
        return False
    from . import pallas_poseidon
    return pallas_poseidon.available()


@jax.jit
def permute(state):
    """Poseidon permutation on (lo, hi) state of shape (..., 12).

    Module-level jit: traced once per batch shape (the scan bodies are
    module-level too, so nothing re-traces per call). Large batches on a
    real TPU route to the Pallas kernel (bit-identical)."""
    bsz = 1
    for d in state[0].shape[:-1]:
        bsz *= d
    if _use_pallas(bsz):
        from . import pallas_poseidon
        return pallas_poseidon.permute(state)
    h = params.HALF_N_FULL_ROUNDS
    state, _ = jax.lax.scan(_full_body, state, jnp.arange(h))
    state, _ = jax.lax.scan(
        _partial_body, state, jnp.arange(h, h + params.N_PARTIAL_ROUNDS))
    state, _ = jax.lax.scan(
        _full_body, state,
        jnp.arange(h + params.N_PARTIAL_ROUNDS, params.N_ROUNDS))
    return state


@jax.jit
def two_to_one(left, right):
    """Batched Merkle compress: (..., 4) x (..., 4) -> (..., 4)."""
    bsz = 1
    for d in left[0].shape[:-1]:
        bsz *= d
    if _use_pallas(bsz):
        from . import pallas_poseidon
        return pallas_poseidon.two_to_one(left, right)
    zlo = jnp.zeros_like(left[0])
    lo = jnp.concatenate([left[0], right[0], zlo], axis=-1)
    hi = jnp.concatenate([left[1], right[1], zlo], axis=-1)
    out = permute((lo, hi))
    return (out[0][..., :4], out[1][..., :4])


@jax.jit
def hash_no_pad(inputs):
    """Batched sponge over (..., n) felt arrays -> (..., 4) digests.

    n is static; ceil(n/8) permutations.
    """
    lo, hi = inputs
    n = lo.shape[-1]
    batch_shape = lo.shape[:-1]
    bsz = 1
    for d in batch_shape:
        bsz *= d
    if n > 4 and _use_pallas(bsz):
        from . import pallas_poseidon
        return pallas_poseidon.hash_no_pad(inputs)
    slo = jnp.zeros(batch_shape + (WIDTH,), dtype=_U32)
    shi = jnp.zeros(batch_shape + (WIDTH,), dtype=_U32)
    for start in range(0, n, RATE):
        k = min(RATE, n - start)
        slo = jax.lax.dynamic_update_slice_in_dim(
            slo, lo[..., start:start + k], 0, axis=-1)
        shi = jax.lax.dynamic_update_slice_in_dim(
            shi, hi[..., start:start + k], 0, axis=-1)
        slo, shi = permute((slo, shi))
    return (slo[..., :4], shi[..., :4])
