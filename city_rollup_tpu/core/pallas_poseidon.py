"""Pallas/Mosaic TPU kernels for the Poseidon permutation family.

This is the [NATIVE] hot-loop layer the build plan calls for (SURVEY.md §7-2;
reference role: plonky2's vectorized PoseidonHash consumed by every Merkle
commit and Fiat-Shamir step, SURVEY.md §2.14). Design, TPU-first:

- **Transposed state layout** ``(12, B)``: the batch of states rides the
  128-wide lane axis, so every elementwise field op runs at full VPU width
  (the jnp ``(..., 12)`` layout wastes 116/128 lanes).
- **MDS layer on the MXU**: each 64-bit element is split into eight 8-bit
  limb planes -> one ``(96,96) x (96,B)`` bfloat16 matmul with float32
  accumulation per round. Exact: limbs < 2^8 and MDS entries <= 49 are
  bf16-exact, every f32 accumulator is bounded by 12*49*255 < 2^24.
- **Whole permutation in one kernel**: all 30 rounds unrolled; the state
  never leaves VMEM between rounds. The sponge kernel additionally keeps it
  resident across all absorb blocks of a leaf row (8 permutations for a
  64-felt leaf) — zero HBM round-trips inside a leaf hash.

Numerics are bit-identical to core.poseidon / core.poseidon_host (tests
cross-check on the interpreter and on the real chip).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gl64
from . import poseidon_params as params

_U32 = jnp.uint32
WIDTH = params.WIDTH
RATE = params.SPONGE_RATE

# Batch tile per grid program (lanes). Overridable for interpreter tests.
B_TILE = int(os.environ.get("CITY_PALLAS_TILE", "2048"))

_RC = np.array(params.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(
    params.N_ROUNDS, WIDTH)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)
# Column layout (N_ROUNDS*12, 1): rounds indexed by dynamic SUBLANE slice
# inside the kernel loop (Mosaic supports dynamic ref slices, not
# dynamic_slice on values).
_RC_LO_COL = _RC_LO.reshape(-1, 1)
_RC_HI_COL = _RC_HI.reshape(-1, 1)

# Full 12x12 MDS matrix (same construction as core.poseidon).
_MDS = np.zeros((WIDTH, WIDTH), dtype=np.int64)
for _r in range(WIDTH):
    for _i in range(WIDTH):
        _MDS[_r, (_i + _r) % WIDTH] += params.MDS_MATRIX_CIRC[_i]
    _MDS[_r, _r] += params.MDS_MATRIX_DIAG[_r]

# Limb-blocked MDS operator, PLANE-MAJOR: rows/cols ordered k*12 + lane so
# the 8 limb planes of the state are contiguous 12-row blocks — the kernel
# builds x96 with one concatenate and reads acc planes with contiguous
# slices (sublane-interleaved orderings cost a Mosaic relayout per round).
# W96[k*12 + i, k*12 + r] = MDS[r, i] (block diagonal, one block per limb).
_W96 = np.zeros((96, 96), dtype=np.float32)
for _r in range(WIDTH):
    for _i in range(WIDTH):
        for _k in range(8):
            _W96[_k * WIDTH + _i, _k * WIDTH + _r] = float(_MDS[_r, _i])
assert float(np.abs(_MDS).max()) * 255 * WIDTH < 2 ** 24  # f32-exact bound


def available() -> bool:
    """Pallas path is usable: real TPU backend (or forced interpreter)."""
    if os.environ.get("CITY_NO_PALLAS"):
        return False
    if os.environ.get("CITY_PALLAS_INTERPRET"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    return bool(os.environ.get("CITY_PALLAS_INTERPRET"))


# ---------------------------------------------------------------------------
# In-kernel permutation body (operates on (12, B) uint32 limb pairs)
# ---------------------------------------------------------------------------

def _mds_t(lo, hi, w96):
    """MDS layer via one (96,96)x(96,B) bf16 MXU matmul, exact.

    Returns a NON-canonical (< 2^64) representative — every consumer
    (S-box mul, RC add, next MDS decompose) accepts any u64 pair, and the
    permutation canonicalizes once at the end."""
    b = lo.shape[-1]
    planes = [((lo >> np.uint32(8 * k)) & np.uint32(0xFF)) for k in range(4)]
    planes += [((hi >> np.uint32(8 * k)) & np.uint32(0xFF)) for k in range(4)]
    # plane-major (96, B): rows k*12..k*12+11 = limb plane k (contiguous)
    x = jnp.concatenate(planes, axis=0)
    x = x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        w96, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (96, B), exact ints
    acc = acc.astype(jnp.int32)
    # base-256 carry propagation over contiguous plane slices
    carry = jnp.zeros((WIDTH, b), jnp.int32)
    digits = []
    for k in range(8):
        v = acc[k * WIDTH:(k + 1) * WIDTH, :] + carry
        digits.append((v & 255).astype(_U32))
        carry = v >> 8
    n0 = (digits[0] | (digits[1] << 8) | (digits[2] << 16)
          | (digits[3] << 24))
    n1 = (digits[4] | (digits[5] << 8) | (digits[6] << 16)
          | (digits[7] << 24))
    n2 = carry.astype(_U32)
    # fold n2 * 2^64 ≡ n2 * (2^32 - 1) (mod p): same steps as
    # gl64._reduce128 with n3 = 0, minus the final canonicalize — the
    # (< 2^64) representative is kept.
    e_lo = jnp.zeros_like(n2) - n2
    e_hi = n2 - (n2 != 0).astype(_U32)
    r_lo, r_hi, c = gl64._add64(n0, n1, e_lo, e_hi)
    r_lo2 = r_lo + (c * np.uint32(0xFFFFFFFF))
    cc = ((r_lo2 < r_lo) & (c == 1)).astype(_U32)
    r_hi2 = r_hi + cc
    return r_lo2, r_hi2


def _round_t(lo, hi, r, w96, rcl_ref, rch_ref, partial: bool):
    """One round. r may be a traced index: the (360,1) RC column refs are
    dynamically sliced at rows [12r, 12r+12)."""
    rc_lo = rcl_ref[pl.ds(r * WIDTH, WIDTH), :]
    rc_hi = rch_ref[pl.ds(r * WIDTH, WIDTH), :]
    lo, hi = gl64.add(
        (lo, hi), (jnp.broadcast_to(rc_lo, lo.shape),
                   jnp.broadcast_to(rc_hi, hi.shape)))
    if partial:
        s0 = gl64.exp7((lo[0:1], hi[0:1]))
        lo = jnp.concatenate([s0[0], lo[1:]], axis=0)
        hi = jnp.concatenate([s0[1], hi[1:]], axis=0)
    else:
        lo, hi = gl64.exp7((lo, hi))
    return _mds_t(lo, hi, w96)


def _permute_t(lo, hi, w96, rcl_ref, rch_ref):
    """Full 30-round permutation on (12, B) state.

    Rounds run under lax.fori_loop (3 loops: full/partial/full) so the
    Mosaic kernel graph holds ~3 round bodies instead of 30 — an unrolled
    kernel costs >3 min of Mosaic compile per shape; the looped one is ~10x
    cheaper to compile at unchanged warm throughput.

    rcl_ref/rch_ref: (N_ROUNDS*12, 1) round-constant limb column refs
    (kernel inputs — Pallas kernels cannot capture array constants)."""
    h = params.HALF_N_FULL_ROUNDS
    np_rounds = params.N_PARTIAL_ROUNDS

    def full_body(r, carry):
        return _round_t(*carry, r, w96, rcl_ref, rch_ref, partial=False)

    def partial_body(r, carry):
        return _round_t(*carry, r, w96, rcl_ref, rch_ref, partial=True)

    lo, hi = jax.lax.fori_loop(0, h, full_body, (lo, hi))
    lo, hi = jax.lax.fori_loop(h, h + np_rounds, partial_body, (lo, hi))
    lo, hi = jax.lax.fori_loop(
        h + np_rounds, params.N_ROUNDS, full_body, (lo, hi))
    # rounds carry non-canonical (< 2^64) representatives; any u64 needs
    # at most one conditional subtract (2p > 2^64)
    return gl64.canonicalize(lo, hi)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _permute_kernel(w_ref, rcl_ref, rch_ref, lo_ref, hi_ref,
                    olo_ref, ohi_ref):
    lo, hi = _permute_t(lo_ref[:], hi_ref[:], w_ref[:], rcl_ref, rch_ref)
    olo_ref[:] = lo
    ohi_ref[:] = hi


def _sponge_kernel(w_ref, rcl_ref, rch_ref, lo_ref, hi_ref,
                   olo_ref, ohi_ref, *, n: int):
    """Absorb n rows of input (overwrite semantics, plonky2 sponge) and
    emit the 4-row digest. State stays in VMEM across all ceil(n/8) perms."""
    b = lo_ref.shape[-1]
    slo = jnp.zeros((WIDTH, b), _U32)
    shi = jnp.zeros((WIDTH, b), _U32)
    w = w_ref[:]
    for start in range(0, n, RATE):
        k = min(RATE, n - start)
        slo = jnp.concatenate([lo_ref[start:start + k, :], slo[k:]], axis=0)
        shi = jnp.concatenate([hi_ref[start:start + k, :], shi[k:]], axis=0)
        slo, shi = _permute_t(slo, shi, w, rcl_ref, rch_ref)
    olo_ref[:] = slo[0:4]
    ohi_ref[:] = shi[0:4]


def _absorb_kernel(w_ref, rcl_ref, rch_ref, clo_ref, chi_ref,
                   slo_ref, shi_ref, olo_ref, ohi_ref, *, k: int):
    """One sponge absorb step: overwrite state rows [0, k) with the chunk,
    permute, emit the full 12-row state. Streaming commits chain this once
    per RATE-wide slab of polynomials (pipeline.lde_commit_streamed)."""
    slo = jnp.concatenate([clo_ref[:, :], slo_ref[k:, :]], axis=0)
    shi = jnp.concatenate([chi_ref[:, :], shi_ref[k:, :]], axis=0)
    slo, shi = _permute_t(slo, shi, w_ref[:], rcl_ref, rch_ref)
    olo_ref[:] = slo
    ohi_ref[:] = shi


@functools.partial(jax.jit, static_argnums=())
def absorb_t(state_t, chunk_t):
    """state (12, B) x chunk (k<=8, B) -> permuted state (12, B)."""
    slo, shi = state_t
    clo, chi = chunk_t
    k = clo.shape[0]
    assert k <= RATE
    b = slo.shape[-1]
    tile = min(B_TILE, max(128, b))
    slo_p, shi_p = _pad_cols(slo, tile), _pad_cols(shi, tile)
    clo_p, chi_p = _pad_cols(clo, tile), _pad_cols(chi, tile)
    bp = slo_p.shape[-1]
    w = jnp.asarray(_W96, dtype=jnp.bfloat16)
    rcl = jnp.asarray(_RC_LO_COL)
    rch = jnp.asarray(_RC_HI_COL)
    out_lo, out_hi = pl.pallas_call(
        functools.partial(_absorb_kernel, k=k),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((96, 96), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((params.N_ROUNDS * WIDTH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((params.N_ROUNDS * WIDTH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((WIDTH, bp), _U32)] * 2,
        interpret=_interpret(),
    )(w, rcl, rch, clo_p, chi_p, slo_p, shi_p)
    return out_lo[:, :b], out_hi[:, :b]


def _pad_cols(x, tile: int):
    b = x.shape[-1]
    pad = (-b) % tile
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


@functools.partial(jax.jit, static_argnums=())
def permute_t(lo_t, hi_t):
    """(12, B) -> (12, B) batched permutation (transposed layout)."""
    b = lo_t.shape[-1]
    tile = min(B_TILE, max(128, b))
    lo_p = _pad_cols(lo_t, tile)
    hi_p = _pad_cols(hi_t, tile)
    bp = lo_p.shape[-1]
    w = jnp.asarray(_W96, dtype=jnp.bfloat16)
    rcl = jnp.asarray(_RC_LO_COL)
    rch = jnp.asarray(_RC_HI_COL)
    out_lo, out_hi = pl.pallas_call(
        _permute_kernel,
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((96, 96), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((params.N_ROUNDS * WIDTH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((params.N_ROUNDS * WIDTH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WIDTH, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((WIDTH, bp), _U32)] * 2,
        interpret=_interpret(),
    )(w, rcl, rch, lo_p, hi_p)
    return out_lo[:, :b], out_hi[:, :b]


@functools.partial(jax.jit, static_argnums=(2,))
def _sponge_t_impl(lo_t, hi_t, n: int):
    b = lo_t.shape[-1]
    tile = min(B_TILE, max(128, b))
    lo_p = _pad_cols(lo_t, tile)
    hi_p = _pad_cols(hi_t, tile)
    bp = lo_p.shape[-1]
    w = jnp.asarray(_W96, dtype=jnp.bfloat16)
    rcl = jnp.asarray(_RC_LO_COL)
    rch = jnp.asarray(_RC_HI_COL)
    out_lo, out_hi = pl.pallas_call(
        functools.partial(_sponge_kernel, n=n),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((96, 96), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((params.N_ROUNDS * WIDTH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((params.N_ROUNDS * WIDTH, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((4, bp), _U32)] * 2,
        interpret=_interpret(),
    )(w, rcl, rch, lo_p, hi_p)
    return out_lo[:, :b], out_hi[:, :b]


def hash_rows_t(leaf_t):
    """Sponge-hash columns: (n, B) felt pair -> (4, B) digest pair.

    Column j is one leaf row of n felts (transposed layout — e.g. the LDE
    output (num_polys, M) commits all M leaves with zero transposes).
    Follows plonky2 hash_or_noop: n <= 4 passes through zero-padded.
    """
    lo, hi = leaf_t
    n = lo.shape[0]
    if n <= 4:
        pad = [(0, 4 - n)] + [(0, 0)] * (lo.ndim - 1)
        return (jnp.pad(lo, pad), jnp.pad(hi, pad))
    return _sponge_t_impl(lo, hi, n)


def two_to_one_t(left_t, right_t):
    """Merkle compress, transposed: (4, B) x (4, B) -> (4, B)."""
    lo = jnp.concatenate([left_t[0], right_t[0]], axis=0)
    hi = jnp.concatenate([left_t[1], right_t[1]], axis=0)
    return _sponge_t_impl(lo, hi, 8)


def reduce_level_t(d_t):
    """One Merkle level, transposed: (4, 2B) digests -> (4, B) parents.
    Children are adjacent columns (2j, 2j+1)."""
    lo, hi = d_t
    return two_to_one_t((lo[:, 0::2], hi[:, 0::2]),
                        (lo[:, 1::2], hi[:, 1::2]))


# ---------------------------------------------------------------------------
# Natural-layout wrappers (drop-in twins of core.poseidon entry points)
# ---------------------------------------------------------------------------

def permute(state):
    """(..., 12) -> (..., 12): transpose in XLA around the kernel."""
    lo, hi = state
    shape = lo.shape
    lo2 = jnp.moveaxis(lo.reshape(-1, WIDTH), 0, 1)
    hi2 = jnp.moveaxis(hi.reshape(-1, WIDTH), 0, 1)
    olo, ohi = permute_t(lo2, hi2)
    return (jnp.moveaxis(olo, 0, 1).reshape(shape),
            jnp.moveaxis(ohi, 0, 1).reshape(shape))


def hash_no_pad(inputs):
    """(..., n) -> (..., 4) sponge digests."""
    lo, hi = inputs
    n = lo.shape[-1]
    batch_shape = lo.shape[:-1]
    lo2 = jnp.moveaxis(lo.reshape(-1, n), 0, 1)
    hi2 = jnp.moveaxis(hi.reshape(-1, n), 0, 1)
    olo, ohi = hash_rows_t((lo2, hi2))
    return (jnp.moveaxis(olo, 0, 1).reshape(batch_shape + (4,)),
            jnp.moveaxis(ohi, 0, 1).reshape(batch_shape + (4,)))


def two_to_one(left, right):
    """(..., 4) x (..., 4) -> (..., 4)."""
    llo, lhi = left
    shape = llo.shape
    l2 = (jnp.moveaxis(llo.reshape(-1, 4), 0, 1),
          jnp.moveaxis(lhi.reshape(-1, 4), 0, 1))
    r2 = (jnp.moveaxis(right[0].reshape(-1, 4), 0, 1),
          jnp.moveaxis(right[1].reshape(-1, 4), 0, 1))
    olo, ohi = two_to_one_t(l2, r2)
    return (jnp.moveaxis(olo, 0, 1).reshape(shape),
            jnp.moveaxis(ohi, 0, 1).reshape(shape))
