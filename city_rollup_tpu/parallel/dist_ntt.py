"""Distributed Goldilocks NTT / coset LDE across a device mesh.

Four-step NTT: view the length-``N = R*C`` coefficient vector as an ``(R, C)``
matrix, shard the ``C`` axis across devices, then

  1. local column NTTs of length R               (compute, zero comms)
  2. local twiddle multiply by w^(j2*k1)          (the twiddle matrix is fed in
     pre-sharded, so no device ever holds all N twiddles)
  3. one ``all_to_all`` over ICI to re-shard from column-blocks to row-blocks
  4. local row NTTs of length C
  5. one more ``all_to_all`` to land the output in natural index order,
     contiguously sharded across devices.

This replaces per-stage butterfly exchanges (log N messages) with exactly two
dense all_to_alls — the right trade on ICI, where bandwidth is plentiful and
latency per collective is what hurts. Reference role: plonky2's rayon-parallel
fft / coset LDE (SURVEY.md §2.11 row "Intra-proof data parallelism",
BASELINE.json config 2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core import gl64, ntt as ntt_mod

_U32 = jnp.uint32


def _split_logs(log_n: int) -> tuple[int, int]:
    """N = R * C with R = 2^ceil(log_n/2) (column NTT), C = 2^floor."""
    log_r = (log_n + 1) // 2
    return log_r, log_n - log_r


@functools.lru_cache(maxsize=None)
def _four_step_twiddles(log_n: int) -> np.ndarray:
    """T[j2, k1] = w_N^(j2*k1), shape (C, R), uint64; row j2 = powers of w^j2."""
    log_r, log_c = _split_logs(log_n)
    r, c = 1 << log_r, 1 << log_c
    w = gl64.h_primitive_root_of_unity(log_n)
    # V[j2] = w^j2 ; T columns built by repeated vector multiply (O(N) work).
    v = gl64.np_powers(w, c)                       # (C,)
    t = np.empty((c, r), dtype=np.uint64)
    col = np.ones(c, dtype=np.uint64)
    for k1 in range(r):
        t[:, k1] = col
        col = gl64.np_mul(col, v)
    return t


def _local_ntt_last(lo, hi, log_m: int, inverse: bool):
    pows = (ntt_mod._inv_root_powers(log_m) if inverse
            else ntt_mod._root_powers(log_m))
    return ntt_mod._ntt_impl((lo, hi), log_m, pows)


def _dist_ntt_body(lo, hi, tw_lo, tw_hi, *, log_r: int, log_c: int,
                   axis: str):
    """shard_map body. Local blocks: lo/hi (R, C/D); tw (C/D, R).

    Returns natural-order output block: (C/D, R) = rows k2_local, cols k1;
    flattening device-major gives X[k] at k = k2*R + k1.
    """
    # step 1: column NTTs (length R) — transpose so the transform axis is last
    lo_t = jnp.swapaxes(lo, -1, -2)                     # (C/D, R)
    hi_t = jnp.swapaxes(hi, -1, -2)
    lo_t, hi_t = _local_ntt_last(lo_t, hi_t, log_r, False)
    # step 2: twiddle multiply, T[j2, k1] local slice
    lo_t, hi_t = gl64.mul((lo_t, hi_t), (tw_lo, tw_hi))
    # step 3: reshard columns->rows: (C/D, R) -> (C, R/D), then lay out (R/D, C)
    lo_t = jax.lax.all_to_all(lo_t, axis, split_axis=1, concat_axis=0,
                              tiled=True)               # (C, R/D) [j2, k1_loc]
    hi_t = jax.lax.all_to_all(hi_t, axis, split_axis=1, concat_axis=0,
                              tiled=True)
    lo_t = jnp.swapaxes(lo_t, -1, -2)                   # (R/D, C) [k1_loc, j2]
    hi_t = jnp.swapaxes(hi_t, -1, -2)
    # step 4: row NTTs (length C, root w^R)
    lo_t, hi_t = _local_ntt_last(lo_t, hi_t, log_c, False)  # [k1_loc, k2]
    # step 5: natural-order reshard: (R/D, C) -> transpose -> (C, R/D)
    lo_t = jnp.swapaxes(lo_t, -1, -2)                   # (C, R/D) [k2, k1_loc]
    hi_t = jnp.swapaxes(hi_t, -1, -2)
    lo_t = jax.lax.all_to_all(lo_t, axis, split_axis=0, concat_axis=1,
                              tiled=True)               # (C/D, R) [k2_loc, k1]
    hi_t = jax.lax.all_to_all(hi_t, axis, split_axis=0, concat_axis=1,
                              tiled=True)
    return lo_t, hi_t


def dist_ntt(mesh: Mesh, coeffs, log_n: int):
    """Distributed forward NTT of one length-2^log_n polynomial.

    coeffs: (lo, hi) arrays of shape (N,). Returns (lo, hi) of shape (N,) in
    natural evaluation order, sharded contiguously across ``mesh``.
    """
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    log_r, log_c = _split_logs(log_n)
    r, c = 1 << log_r, 1 << log_c
    assert c % d == 0 and r % d == 0, (log_n, d)

    tw = _four_step_twiddles(log_n)
    tw_lo = jnp.asarray((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    tw_hi = jnp.asarray((tw >> np.uint64(32)).astype(np.uint32))

    lo = coeffs[0].reshape(r, c)
    hi = coeffs[1].reshape(r, c)

    body = functools.partial(_dist_ntt_body, log_r=log_r, log_c=log_c,
                             axis=axis)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)))
    out_lo, out_hi = jax.jit(fn)(lo, hi, tw_lo, tw_hi)
    return out_lo.reshape(-1), out_hi.reshape(-1)


def dist_coset_lde(mesh: Mesh, coeffs, log_n: int, rate_bits: int,
                   shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Distributed coset LDE: (N,) coeffs -> (N * 2^rate,) natural-order evals
    on shift*<w>, sharded across ``mesh``."""
    log_m = log_n + rate_bits
    n, m = 1 << log_n, 1 << log_m
    pows = ntt_mod._coset_powers(log_n, shift % gl64.P)
    p_lo, p_hi = ntt_mod._to_pair_const(pows)

    @jax.jit
    def scale_pad(lo, hi):
        s_lo, s_hi = gl64.mul((lo, hi), (p_lo, p_hi))
        return (jnp.pad(s_lo, (0, m - n)), jnp.pad(s_hi, (0, m - n)))

    padded = scale_pad(coeffs[0], coeffs[1])
    return dist_ntt(mesh, padded, log_m)


def dist_batched_coset_lde(mesh: Mesh, coeffs, log_n: int, rate_bits: int,
                           shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Batched LDE with the POLY axis sharded across the mesh (pure data
    parallelism — the shape block proving uses: all wire polynomials of a
    circuit in one device call, each device transforming its slice with the
    single-chip kernel; no cross-device traffic).

    coeffs: (lo, hi) of shape (B, 2^log_n) with B % n_devices == 0."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert coeffs[0].shape[0] % n_dev == 0, \
        "poly batch must divide the mesh"

    def body(lo, hi):
        return ntt_mod.coset_lde((lo, hi), log_n, rate_bits, shift)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis, None), P(axis, None)),
                   out_specs=(P(axis, None), P(axis, None)))
    return jax.jit(fn)(coeffs[0], coeffs[1])
