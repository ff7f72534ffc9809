"""Merkle tree/cap builder: proof round-trips, cap semantics, host agreement."""

import numpy as np
import pytest

from city_rollup_tpu.core import gl64, merkle, poseidon_host

P = gl64.P
rng = np.random.default_rng(3)


@pytest.mark.parametrize("cap_height", [0, 2])
@pytest.mark.parametrize("leaf_width", [4, 7])
def test_merkle_prove_verify(cap_height, leaf_width):
    n = 16
    data = rng.integers(0, P, size=(n, leaf_width), dtype=np.uint64)
    tree = merkle.MerkleTree(gl64.from_u64(data), cap_height=cap_height)
    cap = tree.cap_u64()
    assert cap.shape == (1 << cap_height, 4)
    for idx in [0, 5, n - 1]:
        proof = tree.prove(idx)
        assert len(proof) == 4 - cap_height
        leaf = merkle.h_hash_leaf([int(x) for x in data[idx]])
        assert merkle.h_verify_merkle_proof(leaf, idx, proof, cap)
        # tampered leaf must fail
        bad = list(leaf)
        bad[0] = (bad[0] + 1) % P
        assert not merkle.h_verify_merkle_proof(bad, idx, proof, cap)


def test_root_matches_host_chain():
    n = 8
    data = rng.integers(0, P, size=(n, 4), dtype=np.uint64)
    tree = merkle.MerkleTree(gl64.from_u64(data), cap_height=0)
    nodes = [[int(x) for x in row] for row in data]
    while len(nodes) > 1:
        nodes = [poseidon_host.two_to_one(nodes[i], nodes[i + 1])
                 for i in range(0, len(nodes), 2)]
    assert tree.cap_u64()[0].tolist() == nodes[0]
