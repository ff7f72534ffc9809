"""End-to-end SNARK tests: build a circuit, prove, verify; soundness
negatives (tampered public inputs / caps / openings must fail)."""

import dataclasses

import numpy as np
import pytest

from city_rollup_tpu.core import fri, gl64
from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark import prover as prover_mod
from city_rollup_tpu.snark import verifier as verifier_mod

# small-but-real FRI params for tests
TEST_CONFIG = CircuitConfig(
    num_routed_wires=32, num_wires=32, num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=8,
                      num_query_rounds=12, final_poly_bits=3))


def _build_mul_add_circuit():
    """Proves knowledge of x, y with x*y + x + 7 == pub."""
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    xy = b.mul(x, y)
    s = b.add(xy, x)
    out = b.add_const(s, 7)
    b.register_public_input(out)
    return b, x, y


def test_prove_verify_roundtrip():
    b, x, y = _build_mul_add_circuit()
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 3)
    pw.set(y, 5)
    proof = prover_mod.prove(data, pw)
    assert proof.public_inputs == [3 * 5 + 3 + 7]
    assert verifier_mod.verify(proof, data.common, data.verifier)


def test_tampered_public_input_rejected():
    b, x, y = _build_mul_add_circuit()
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 3)
    pw.set(y, 5)
    proof = prover_mod.prove(data, pw)
    proof.public_inputs = [999]
    assert not verifier_mod.verify(proof, data.common, data.verifier)


def test_tampered_opening_rejected():
    b, x, y = _build_mul_add_circuit()
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 2)
    pw.set(y, 2)
    proof = prover_mod.prove(data, pw)
    w0 = proof.openings.wires[0]
    proof.openings.wires[0] = ((w0[0] + 1) % gl64.P, w0[1])
    assert not verifier_mod.verify(proof, data.common, data.verifier)


def test_copy_constraint_violation_unprovable():
    """Setting conflicting values across a copy class must be rejected at
    witness time."""
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.connect(x, y)
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 1)
    with pytest.raises(ValueError):
        pw.set(y, 2)


def test_exp_and_many_ops():
    """Exercise multi-row arithmetic packing + exponentiation chain."""
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    x7 = b.exp_u64(x, 7)
    b.register_public_input(x7)
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 12345)
    proof = prover_mod.prove(data, pw)
    assert proof.public_inputs == [pow(12345, 7, gl64.P)]
    assert verifier_mod.verify(proof, data.common, data.verifier)
