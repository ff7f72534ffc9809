"""Poseidon: device (JAX) vs host (exact int) equivalence, plus the
plonky2-compat vector check against the reference's cached zero-hash chain
(reference: city_crypto/src/hash/cached_zero_hashes.rs level-1/2 values)."""

import numpy as np
import pytest
import jax

from city_rollup_tpu.core import gl64, poseidon, poseidon_host, poseidon_params

P = gl64.P
rng = np.random.default_rng(1)


def _to_np(pair):
    return gl64.to_u64(np.asarray(pair[0]), np.asarray(pair[1]))


def test_permute_matches_host():
    batch = 16
    states = rng.integers(0, P, size=(batch, 12), dtype=np.uint64)
    states[0] = 0
    got = _to_np(jax.jit(poseidon.permute)(gl64.from_u64(states)))
    for b in range(batch):
        exp = poseidon_host.permute([int(x) for x in states[b]])
        assert got[b].tolist() == exp, f"batch row {b}"


def test_two_to_one_matches_host():
    batch = 8
    left = rng.integers(0, P, size=(batch, 4), dtype=np.uint64)
    right = rng.integers(0, P, size=(batch, 4), dtype=np.uint64)
    got = _to_np(jax.jit(poseidon.two_to_one)(
        gl64.from_u64(left), gl64.from_u64(right)))
    for b in range(batch):
        exp = poseidon_host.two_to_one(
            [int(x) for x in left[b]], [int(x) for x in right[b]])
        assert got[b].tolist() == exp


@pytest.mark.parametrize("n", [1, 4, 7, 8, 9, 16, 20])
def test_hash_no_pad_matches_host(n):
    batch = 4
    inputs = rng.integers(0, P, size=(batch, n), dtype=np.uint64)
    got = _to_np(jax.jit(poseidon.hash_no_pad)(gl64.from_u64(inputs)))
    for b in range(batch):
        exp = poseidon_host.hash_no_pad([int(x) for x in inputs[b]])
        assert got[b].tolist() == exp


# Reference vectors: cached zero-hash chain levels 1..3
# (city_crypto/src/hash/cached_zero_hashes.rs).
_ZERO_HASH_L1 = [4330397376401421145, 14124799381142128323,
                 8742572140681234676, 14345658006221440202]
_ZERO_HASH_L2 = [13121882728673923020, 10197653806804742863,
                 16037207047953124082, 2420399206709257475]


@pytest.mark.xfail(condition=not poseidon_params.PLONKY2_COMPAT_VERIFIED,
                   reason="plonky2 round-constant table not yet bit-verified",
                   strict=False)
def test_plonky2_zero_hash_vectors():
    l1 = poseidon_host.two_to_one([0] * 4, [0] * 4)
    assert l1 == _ZERO_HASH_L1
    l2 = poseidon_host.two_to_one(l1, l1)
    assert l2 == _ZERO_HASH_L2
