"""Multi-device tests: distributed NTT/LDE and sharded Merkle cap on the
8-virtual-device CPU mesh (conftest forces xla_force_host_platform_device_count)."""

import numpy as np
import jax

from city_rollup_tpu.core import gl64, ntt, merkle
from city_rollup_tpu.parallel import dist_ntt, dist_merkle, mesh as mesh_mod


def _rand_u64(rng, shape):
    return rng.integers(0, gl64.P, size=shape, dtype=np.uint64)


def test_dist_ntt_matches_single_device():
    rng = np.random.default_rng(0)
    log_n = 8
    coeffs = _rand_u64(rng, 1 << log_n)
    m = mesh_mod.make_mesh()
    out = dist_ntt.dist_ntt(m, gl64.from_u64(coeffs), log_n)
    ref = ntt.ntt(gl64.from_u64(coeffs), log_n)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(out[0]), np.asarray(out[1])),
        gl64.to_u64(np.asarray(ref[0]), np.asarray(ref[1])))


def test_dist_coset_lde_matches_single_device():
    rng = np.random.default_rng(1)
    log_n = 6
    rate = 3
    coeffs = _rand_u64(rng, 1 << log_n)
    m = mesh_mod.make_mesh()
    out = dist_ntt.dist_coset_lde(m, gl64.from_u64(coeffs), log_n, rate)
    ref = ntt.coset_lde(gl64.from_u64(coeffs), log_n, rate)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(out[0]), np.asarray(out[1])),
        gl64.to_u64(np.asarray(ref[0]), np.asarray(ref[1])))


def test_dist_merkle_cap_matches_single_device():
    rng = np.random.default_rng(2)
    n_leaves, width = 64, 8
    data = _rand_u64(rng, (n_leaves, width))
    m = mesh_mod.make_mesh()
    cap = dist_merkle.dist_merkle_cap(m, gl64.from_u64(data), cap_height=4)
    ref = merkle.MerkleTree(gl64.from_u64(data), cap_height=4)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(cap[0]), np.asarray(cap[1])),
        ref.cap_u64())


def test_dist_lde_commit_fused_matches_single_device():
    """The fused one-graph LDE+commit path (the multichip dryrun gate)."""
    from city_rollup_tpu.parallel import dist_pipeline
    rng = np.random.default_rng(3)
    log_n, rate, leaf_width, cap_height = 7, 3, 8, 4
    coeffs = _rand_u64(rng, 1 << log_n)
    m = mesh_mod.make_mesh()
    cap, lde = dist_pipeline.dist_lde_commit(
        m, gl64.from_u64(coeffs), log_n, rate, leaf_width, cap_height)
    ref_lde = ntt.coset_lde(gl64.from_u64(coeffs), log_n, rate)
    np.testing.assert_array_equal(np.asarray(lde[0]), np.asarray(ref_lde[0]))
    ref = merkle.MerkleTree(
        (ref_lde[0].reshape(-1, leaf_width), ref_lde[1].reshape(-1, leaf_width)),
        cap_height)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(cap[0]), np.asarray(cap[1])), ref.cap_u64())


def test_device_count():
    assert len(jax.devices()) == 8
