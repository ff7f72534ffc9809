"""Batched Poseidon Merkle trees with caps, in JAX.

A tree over 2^h leaves is built as log-depth batched `two_to_one` passes —
each level is ONE device call over all nodes of that level (the TPU-native
replacement for plonky2's rayon-parallel Merkle builder; reference role:
MerkleCap/MerkleTree consumed by FRI commitments, SURVEY.md §2.1 row 1, and
the out-of-circuit Merkle math in city_crypto/src/hash/merkle/core.rs).

The cap (plonky2 `cap_height`) keeps the top 2^cap_height digests instead of
a single root — proofs stop one level below the cap.

Digests are (lo, hi) uint32 pairs of shape (num_nodes, 4).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import gl64, poseidon, poseidon_host


def hash_leaves(leaf_data):
    """Hash rows of (num_leaves, k) felt data into (num_leaves, 4) digests.

    Follows plonky2 hash_or_noop: rows with k <= 4 pass through zero-padded,
    otherwise Poseidon sponge.
    """
    lo, hi = leaf_data
    k = lo.shape[-1]
    if k <= 4:
        pad = [(0, 0)] * (lo.ndim - 1) + [(0, 4 - k)]
        return (jnp.pad(lo, pad), jnp.pad(hi, pad))
    return poseidon.hash_no_pad(leaf_data)


import functools


@functools.lru_cache(maxsize=8)
def _cpu_level_step(n: int):
    """One compiled pairwise-compress step at fixed width n: input (n, 4)
    digests -> output (n, 4) where the first n//2 rows are the parent
    digests and the rest is padding (see MerkleTree.__init__ CPU path)."""

    @jax.jit
    def step(lo, hi):
        left = (lo[0::2], hi[0::2])
        right = (lo[1::2], hi[1::2])
        plo, phi = poseidon.two_to_one(left, right)
        return (jnp.concatenate([plo, plo], axis=0),
                jnp.concatenate([phi, phi], axis=0))

    return step


class MerkleTree:
    """Host-held tree of device-computed levels.

    levels[0] = leaf digests (N, 4); levels[i+1] = pairwise compress of
    levels[i]; stops when 2^cap_height nodes remain (the cap).
    """

    def __init__(self, leaf_data, cap_height: int = 0):
        digests = hash_leaves(leaf_data)
        n = digests[0].shape[0]
        assert n & (n - 1) == 0, "leaf count must be a power of two"
        assert (1 << cap_height) <= n
        self.num_leaves = n
        self.cap_height = cap_height
        levels = [digests]
        cur = digests
        if jax.default_backend() == "cpu":
            # CPU (test) backend: every distinct shape is a fresh XLA
            # compile (~10-40 s here), and a 2^17-leaf tree has 17 level
            # shapes. Use ONE fixed-shape compiled step: operate on the
            # full-width buffer each level (valid prefix halves; the tail
            # computes garbage that is never read). ~2x redundant hashing,
            # ~17x fewer compiles — compile time dominates on CPU.
            lo, hi = cur
            m = lo.shape[0]
            step = _cpu_level_step(m)
            while m > (1 << cap_height):
                lo, hi = step(lo, hi)
                m >>= 1
                levels.append((lo[:m], hi[:m]))
            cur = levels[-1]
        else:
            while cur[0].shape[0] > (1 << cap_height):
                lo, hi = cur
                left = (lo[0::2], hi[0::2])
                right = (lo[1::2], hi[1::2])
                cur = poseidon.two_to_one(left, right)
                levels.append(cur)
        self.levels = levels

    @property
    def cap(self):
        """(2^cap_height, 4) digest pair."""
        return self.levels[-1]

    def cap_u64(self) -> np.ndarray:
        return gl64.to_u64(np.asarray(self.cap[0]), np.asarray(self.cap[1]))

    def _host_levels(self) -> list[np.ndarray]:
        """Lazily fetch all levels to host as (n, 4) uint64 (one transfer per
        level, cached — query opening then costs zero device round-trips)."""
        if not hasattr(self, "_levels_np"):
            self._levels_np = [
                gl64.to_u64(np.asarray(lv[0]), np.asarray(lv[1]))
                for lv in self.levels]
        return self._levels_np

    def prove(self, index: int) -> list[list[int]]:
        """Merkle path for leaf `index`: sibling digests, leaf level first,
        stopping below the cap. Host-side (u64 ints)."""
        siblings = []
        idx = index
        for level in self._host_levels()[:-1]:
            siblings.append([int(x) for x in level[idx ^ 1]])
            idx >>= 1
        return siblings


@functools.lru_cache(maxsize=16)
def _cpu_level_step_batched(bsz: int, n: int):
    """Batched twin of _cpu_level_step: (B, n, 4) digests -> (B, n, 4)
    where the first n//2 rows per batch are the parents."""

    @jax.jit
    def step(lo, hi):
        left = (lo[:, 0::2, :], hi[:, 0::2, :])
        right = (lo[:, 1::2, :], hi[:, 1::2, :])
        plo, phi = poseidon.two_to_one(left, right)
        return (jnp.concatenate([plo, plo], axis=1),
                jnp.concatenate([phi, phi], axis=1))

    return step


class BatchedMerkleTree:
    """B trees built together: leaf data (B, N, k) -> per-level digests
    (B, n, 4), each level ONE device call for the whole batch — the
    same-shape batched-proving path (all proofs of an aggregation level
    commit their wire matrices in one kernel launch; SURVEY.md §2.11
    "levels batched")."""

    def __init__(self, leaf_data, cap_height: int = 0):
        digests = hash_leaves(leaf_data)            # (B, N, 4)
        bsz, n = digests[0].shape[0], digests[0].shape[1]
        assert n & (n - 1) == 0
        assert (1 << cap_height) <= n
        self.batch = bsz
        self.num_leaves = n
        self.cap_height = cap_height
        levels = [digests]
        cur = digests
        if jax.default_backend() == "cpu":
            # same fixed-shape trick as MerkleTree: one compiled step per
            # (batch, width) instead of one per LEVEL shape — compile time
            # dominates the CPU (test) backend
            lo, hi = cur
            m = n
            step = _cpu_level_step_batched(bsz, n)
            while m > (1 << cap_height):
                lo, hi = step(lo, hi)
                m >>= 1
                levels.append((lo[:, :m, :], hi[:, :m, :]))
        else:
            while cur[0].shape[1] > (1 << cap_height):
                lo, hi = cur
                left = (lo[:, 0::2, :], hi[:, 0::2, :])
                right = (lo[:, 1::2, :], hi[:, 1::2, :])
                cur = poseidon.two_to_one(left, right)
                levels.append(cur)
        self.levels = levels

    @property
    def cap(self):
        """(B, 2^cap_height, 4)."""
        return self.levels[-1]

    def cap_u64(self, b: int) -> np.ndarray:
        caps = self._host_levels()[-1]
        return caps[b]

    def _host_levels(self) -> list[np.ndarray]:
        if not hasattr(self, "_levels_np"):
            self._levels_np = [
                gl64.to_u64(np.asarray(lv[0]), np.asarray(lv[1]))
                for lv in self.levels]
        return self._levels_np

    def prove(self, b: int, index: int) -> list[list[int]]:
        siblings = []
        idx = index
        for level in self._host_levels()[:-1]:
            siblings.append([int(x) for x in level[b, idx ^ 1]])
            idx >>= 1
        return siblings


def h_verify_merkle_proof(leaf_digest: list[int], index: int,
                          siblings: list[list[int]],
                          cap: np.ndarray) -> bool:
    """Host-side proof check against a cap (cap: (2^h, 4) uint64)."""
    current = list(leaf_digest)
    idx = index
    for sib in siblings:
        if idx & 1:
            current = poseidon_host.two_to_one(sib, current)
        else:
            current = poseidon_host.two_to_one(current, sib)
        idx >>= 1
    return list(map(int, cap[idx])) == [int(x) for x in current]


def h_hash_leaf(leaf_row: list[int]) -> list[int]:
    return poseidon_host.hash_or_noop(leaf_row)
