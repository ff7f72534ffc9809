"""NTT/LDE: device vs exact host reference; round-trip; coset evaluation."""

import numpy as np
import pytest
import jax

from city_rollup_tpu.core import gl64, ntt

P = gl64.P
rng = np.random.default_rng(7)


def _to_np(pair):
    return gl64.to_u64(np.asarray(pair[0]), np.asarray(pair[1]))


@pytest.mark.parametrize("log_n", [0, 1, 3, 6])
def test_ntt_matches_naive(log_n):
    n = 1 << log_n
    coeffs = rng.integers(0, P, size=(2, n), dtype=np.uint64)
    got = _to_np(jax.jit(lambda x: ntt.ntt(x, log_n))(gl64.from_u64(coeffs)))
    for b in range(2):
        exp = ntt.h_ntt([int(x) for x in coeffs[b]], log_n)
        assert got[b].tolist() == exp


@pytest.mark.parametrize("log_n", [1, 4, 8])
def test_intt_roundtrip(log_n):
    n = 1 << log_n
    coeffs = rng.integers(0, P, size=(3, n), dtype=np.uint64)
    x = gl64.from_u64(coeffs)
    y = ntt.ntt(x, log_n)
    back = _to_np(ntt.intt(y, log_n))
    assert np.array_equal(back, coeffs)


def test_coset_lde_evaluates_on_coset():
    log_n, rate_bits = 3, 2
    n = 1 << log_n
    m = n << rate_bits
    coeffs = rng.integers(0, P, size=(n,), dtype=np.uint64)
    evals = _to_np(jax.jit(
        lambda x: ntt.coset_lde(x, log_n, rate_bits))(gl64.from_u64(coeffs)))
    g = gl64.MULTIPLICATIVE_GROUP_GENERATOR
    w = gl64.h_primitive_root_of_unity(log_n + rate_bits)
    cl = [int(c) for c in coeffs]
    for i in range(m):
        x = (g * pow(w, i, P)) % P
        assert int(evals[i]) == ntt.h_eval_poly(cl, x), f"point {i}"


def test_coset_intt_roundtrip():
    log_n, rate_bits = 4, 3
    n = 1 << log_n
    coeffs = rng.integers(0, P, size=(2, n), dtype=np.uint64)
    x = gl64.from_u64(coeffs)
    evals = ntt.coset_lde(x, log_n, rate_bits)
    back = _to_np(ntt.coset_intt(evals, log_n + rate_bits))
    # high coefficients must be zero, low ones must round-trip
    assert np.array_equal(back[:, :n], coeffs)
    assert not back[:, n:].any()
