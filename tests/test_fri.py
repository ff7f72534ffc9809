"""FRI prove/verify round-trip and soundness smoke tests (small params so the
CPU test run stays fast; real config is FriConfig() defaults = plonky2's
standard recursion shape)."""

import numpy as np
import pytest

from city_rollup_tpu.core import fri, gl64, ntt
from city_rollup_tpu.core.challenger import Challenger

CFG = fri.FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=8,
                    num_query_rounds=8, final_poly_bits=2)


def _codeword_from_coeffs(c0, c1, log_n, rate_bits):
    a0 = ntt.coset_lde(gl64.from_u64(c0), log_n, rate_bits)
    a1 = ntt.coset_lde(gl64.from_u64(c1), log_n, rate_bits)
    return (a0, a1)


def _random_low_degree(rng, log_n):
    c0 = rng.integers(0, gl64.P, size=1 << log_n, dtype=np.uint64)
    c1 = rng.integers(0, gl64.P, size=1 << log_n, dtype=np.uint64)
    return c0, c1


def test_fri_roundtrip():
    rng = np.random.default_rng(7)
    log_n = 5
    log_m = log_n + CFG.rate_bits
    c0, c1 = _random_low_degree(rng, log_n)
    codeword = _codeword_from_coeffs(c0, c1, log_n, CFG.rate_bits)

    proof = fri.fri_prove(codeword, log_m, gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                          CFG, Challenger())
    assert fri.fri_verify(proof, log_m, gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                          CFG, Challenger())


def test_fri_rejects_tampered_final_poly():
    rng = np.random.default_rng(8)
    log_n = 5
    log_m = log_n + CFG.rate_bits
    c0, c1 = _random_low_degree(rng, log_n)
    codeword = _codeword_from_coeffs(c0, c1, log_n, CFG.rate_bits)
    proof = fri.fri_prove(codeword, log_m, gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                          CFG, Challenger())
    bad = proof.final_poly[0]
    proof.final_poly[0] = ((bad[0] + 1) % gl64.P, bad[1])
    assert not fri.fri_verify(
        proof, log_m, gl64.MULTIPLICATIVE_GROUP_GENERATOR, CFG, Challenger())


def test_fri_rejects_high_degree():
    rng = np.random.default_rng(9)
    log_n = 5
    log_m = log_n + CFG.rate_bits
    # full-degree-m codeword: random evals are w.h.p. not low degree
    a0 = rng.integers(0, gl64.P, size=1 << log_m, dtype=np.uint64)
    a1 = rng.integers(0, gl64.P, size=1 << log_m, dtype=np.uint64)
    codeword = (gl64.from_u64(a0), gl64.from_u64(a1))
    with pytest.raises(AssertionError):
        fri.fri_prove(codeword, log_m, gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                      CFG, Challenger())


def test_grind_meets_difficulty():
    ch = Challenger()
    ch.observe_elements([1, 2, 3])
    w = fri.grind(ch, pow_bits=8)
    ch.observe_element(w)
    assert ch.get_challenge() < (1 << 56)
