"""Pallas Poseidon kernels: bit-exactness vs the host reference, run in
interpreter mode on CPU (the real-chip path is verified on axon; the kernel
body is identical — only the Mosaic lowering differs)."""

import numpy as np
import pytest

from city_rollup_tpu.core import gl64, poseidon_host
from city_rollup_tpu.core import pallas_poseidon as pp


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("CITY_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(pp, "B_TILE", 128)
    # jit caches don't key on the env flag — drop any compiled entries
    pp.permute_t._clear_cache()
    pp._sponge_t_impl._clear_cache()
    yield
    pp.permute_t._clear_cache()
    pp._sponge_t_impl._clear_cache()


def test_permute_matches_host():
    rng = np.random.default_rng(0)
    states = rng.integers(0, gl64.P, size=(200, 12), dtype=np.uint64)
    out = pp.permute(gl64.from_u64(states))
    got = gl64.to_u64(np.asarray(out[0]), np.asarray(out[1]))
    want = np.array([poseidon_host.permute([int(x) for x in row])
                     for row in states], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_sponge_matches_host():
    rng = np.random.default_rng(1)
    data = rng.integers(0, gl64.P, size=(150, 10), dtype=np.uint64)
    d = pp.hash_no_pad(gl64.from_u64(data))
    got = gl64.to_u64(np.asarray(d[0]), np.asarray(d[1]))
    want = np.array([poseidon_host.hash_no_pad([int(x) for x in row])
                     for row in data], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_two_to_one_and_reduce_level():
    rng = np.random.default_rng(2)
    l = rng.integers(0, gl64.P, size=(130, 4), dtype=np.uint64)
    r = rng.integers(0, gl64.P, size=(130, 4), dtype=np.uint64)
    c = pp.two_to_one(gl64.from_u64(l), gl64.from_u64(r))
    got = gl64.to_u64(np.asarray(c[0]), np.asarray(c[1]))
    want = np.array([poseidon_host.two_to_one([int(x) for x in a],
                                              [int(x) for x in b])
                     for a, b in zip(l, r)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)

    # transposed level reduce: children at columns (2j, 2j+1)
    d = rng.integers(0, gl64.P, size=(64, 4), dtype=np.uint64)
    dlo, dhi = gl64.from_u64(d)
    red = pp.reduce_level_t((dlo.T, dhi.T))
    got = gl64.to_u64(np.asarray(red[0]).T, np.asarray(red[1]).T)
    want = np.array([poseidon_host.two_to_one([int(x) for x in d[2 * j]],
                                              [int(x) for x in d[2 * j + 1]])
                     for j in range(32)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_edge_values():
    """p-1 / 0 / 2^32 boundary inputs stay exact through the limb matmul."""
    edge = np.array([[gl64.P - 1] * 12, [0] * 12,
                     [(1 << 32) - 1] * 12, [(1 << 32)] * 12,
                     [(1 << 63)] * 12, [gl64.P - (1 << 32)] * 12]
                    * 30, dtype=np.uint64)
    out = pp.permute(gl64.from_u64(edge))
    got = gl64.to_u64(np.asarray(out[0]), np.asarray(out[1]))
    want = np.array([poseidon_host.permute([int(x) for x in row])
                     for row in edge], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
