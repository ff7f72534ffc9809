"""Fused distributed LDE + Merkle-cap commit over a device mesh.

One shard_map body = ONE XLA compile for the whole multi-chip hot path:
four-step coset LDE (two all_to_alls over ICI) feeding directly into local
leaf hashing + local cap reduction + one all_gather of the tiny cap. This is
the shape the prover's per-commitment work takes when a single large LDE is
sharded across chips (SURVEY.md §7-3/4; BASELINE.json config 2), and it is
what the driver's multichip dryrun gate compiles — keeping it one fused
graph is what makes the gate fast on the CPU test backend (VERDICT r4 #1).

Reference role: plonky2's coset_fft + MerkleTree::new pair built per
polynomial commitment (rayon-parallel there; ICI-sharded here).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core import gl64, merkle, ntt as ntt_mod, poseidon
from . import dist_ntt


def dist_lde_commit(mesh: Mesh, coeffs, log_n: int, rate_bits: int,
                    leaf_width: int, cap_height: int,
                    shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Distributed coset LDE of one length-2^log_n polynomial followed by a
    Merkle-cap commit of the evaluations grouped `leaf_width` per leaf.

    Returns (cap, lde): cap = (lo, hi) of shape (2^cap_height, 4) replicated;
    lde = (lo, hi) of shape (2^(log_n+rate_bits),) natural order, sharded
    contiguously across the mesh.
    """
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    log_m = log_n + rate_bits
    n, m = 1 << log_n, 1 << log_m
    log_r, log_c = dist_ntt._split_logs(log_m)
    r, c = 1 << log_r, 1 << log_c
    assert c % d == 0 and r % d == 0, (log_m, d)
    num_leaves = m // leaf_width
    assert num_leaves % d == 0 and (c // d) * r % leaf_width == 0
    assert (1 << cap_height) >= d and num_leaves >= (1 << cap_height)
    local_cap_height = cap_height - d.bit_length() + 1

    tw = dist_ntt._four_step_twiddles(log_m)
    tw_lo = jnp.asarray((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    tw_hi = jnp.asarray((tw >> np.uint64(32)).astype(np.uint32))
    pows = ntt_mod._coset_powers(log_n, shift % gl64.P)
    p_lo, p_hi = ntt_mod._to_pair_const(pows)

    def body(lo, hi, twl, twh):
        # distributed four-step NTT: local block out is (C/D, R) natural order
        out_lo, out_hi = dist_ntt._dist_ntt_body(
            lo, hi, twl, twh, log_r=log_r, log_c=log_c, axis=axis)
        # local natural-order points -> local leaves (contiguous grouping)
        flat_lo = out_lo.reshape(-1, leaf_width)
        flat_hi = out_hi.reshape(-1, leaf_width)
        digests = merkle.hash_leaves((flat_lo, flat_hi))
        while digests[0].shape[0] > (1 << local_cap_height):
            dlo, dhi = digests
            digests = poseidon.two_to_one((dlo[0::2], dhi[0::2]),
                                          (dlo[1::2], dhi[1::2]))
        cap_lo = jax.lax.all_gather(digests[0], axis, axis=0, tiled=True)
        cap_hi = jax.lax.all_gather(digests[1], axis, axis=0, tiled=True)
        return cap_lo, cap_hi, out_lo, out_hi

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis, None), P(axis, None)),
        out_specs=(P(None, None), P(None, None), P(axis, None), P(axis, None)),
        check_rep=False)

    @jax.jit
    def run(clo, chi, twl, twh):
        # coset scale + zero-pad (fused into the same XLA program)
        s_lo, s_hi = gl64.mul((clo, chi), (p_lo, p_hi))
        s_lo = jnp.pad(s_lo, (0, m - n)).reshape(r, c)
        s_hi = jnp.pad(s_hi, (0, m - n)).reshape(r, c)
        return sharded(s_lo, s_hi, twl, twh)

    cap_lo, cap_hi, lde_lo, lde_hi = run(coeffs[0], coeffs[1], tw_lo, tw_hi)
    return ((cap_lo, cap_hi), (lde_lo.reshape(-1), lde_hi.reshape(-1)))
