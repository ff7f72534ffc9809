"""Sharded Merkle-cap commitment over a device mesh.

The FRI committer hashes one leaf per LDE point (a row of all polynomial
values at that point) and reduces pairwise to a cap of 2^cap_height digests.
With leaves sharded contiguously across D devices and cap_height >= log2(D),
every sub-cap is device-local: leaf hashing and the whole binary reduction run
with ZERO communication, and a single all_gather replicates the tiny cap.

Reference role: plonky2 MerkleTree/MerkleCap built per polynomial commitment
(SURVEY.md §2.1 row 1); the reference parallelizes with rayon, we shard leaves
over ICI-connected chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core import merkle, poseidon


def _local_cap(lo, hi, *, local_cap_height: int, axis: str):
    """Local block (N/D, B) -> local sub-cap, then all_gather to (2^cap, 4)."""
    digests = merkle.hash_leaves((lo, hi))
    while digests[0].shape[0] > (1 << local_cap_height):
        dlo, dhi = digests
        digests = poseidon.two_to_one((dlo[0::2], dhi[0::2]),
                                      (dlo[1::2], dhi[1::2]))
    cap_lo = jax.lax.all_gather(digests[0], axis, axis=0, tiled=True)
    cap_hi = jax.lax.all_gather(digests[1], axis, axis=0, tiled=True)
    return cap_lo, cap_hi


def dist_merkle_cap(mesh: Mesh, leaf_data, cap_height: int):
    """leaf_data: (lo, hi) of shape (num_leaves, B), leaves sharded on axis 0.

    Returns the replicated cap as (lo, hi) of shape (2^cap_height, 4).
    """
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    n = leaf_data[0].shape[0]
    assert (1 << cap_height) >= d, "cap must be at least one digest per device"
    assert n % d == 0 and n >= (1 << cap_height)
    local_cap_height = cap_height - d.bit_length() + 1

    body = functools.partial(_local_cap, local_cap_height=local_cap_height,
                             axis=axis)
    # out is replicated by the all_gather; static replication inference can't
    # see that, so disable the check rather than re-slice.
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis, None), P(axis, None)),
                   out_specs=(P(None, None), P(None, None)),
                   check_rep=False)
    return jax.jit(fn)(leaf_data[0], leaf_data[1])
