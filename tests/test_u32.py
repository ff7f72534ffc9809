"""u32 gadget layer: arithmetic/comparison/bitwise prove+verify roundtrips
(reference: city_common_circuit u32 gates/gadgets tests, SURVEY.md §4)."""

import numpy as np
import pytest

from city_rollup_tpu.core import fri
from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark import prover as prover_mod
from city_rollup_tpu.snark import verifier as verifier_mod
from city_rollup_tpu.snark.u32 import U32Builder

TEST_CONFIG = CircuitConfig(
    num_routed_wires=32, num_wires=64, num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=4,
                      num_query_rounds=8, final_poly_bits=3))

B32 = 1 << 32


def _prove_verify(b, pw):
    data = b.build()
    proof = prover_mod.prove(data, pw)
    assert verifier_mod.verify(proof, data.common, data.verifier)
    return data, proof


def test_u32_mul_add_and_add_many():
    b = CircuitBuilder(TEST_CONFIG)
    u = U32Builder(b)
    a = u.add_virtual_u32()
    c = u.add_virtual_u32()
    d = u.add_virtual_u32()
    lo, hi = u.mul_add_u32(a, c, d)
    s, carry = u.add_many_u32([a, c, d, lo])
    for t in (lo, hi, s):
        b.register_public_input(t.target)
    pw = b.partial_witness()
    av, cv, dv = 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFE
    u.set_u32(pw, a, av)
    u.set_u32(pw, c, cv)
    u.set_u32(pw, d, dv)
    data, proof = _prove_verify(b, pw)
    total = av * cv + dv
    lov, hiv = total % B32, total // B32
    sv = (av + cv + dv + lov) % B32
    assert proof.public_inputs == [lov, hiv, sv]


def test_u32_sub_and_comparison():
    b = CircuitBuilder(TEST_CONFIG)
    u = U32Builder(b)
    a = u.add_virtual_u32()
    c = u.add_virtual_u32()
    out, borrow = u.sub_u32(a, c)
    lte = u.is_lte_u32(a, c)
    u.assert_lte_u32(c, a)          # holds for the chosen witness
    b.register_public_inputs([out.target, borrow.target, lte])
    pw = b.partial_witness()
    u.set_u32(pw, a, 100)
    u.set_u32(pw, c, 58)
    data, proof = _prove_verify(b, pw)
    assert proof.public_inputs == [42, 0, 0]


def test_u32_bitwise():
    b = CircuitBuilder(TEST_CONFIG)
    u = U32Builder(b)
    a = u.add_virtual_u32()
    c = u.add_virtual_u32()
    x = u.xor_u32(a, c)
    n = u.and_u32(a, c)
    r = u.rotr_u32(a, 7)
    s = u.shr_u32(a, 3)
    b.register_public_inputs([x.target, n.target, r.target, s.target])
    pw = b.partial_witness()
    av, cv = 0xDEADBEEF, 0x12345678
    u.set_u32(pw, a, av)
    u.set_u32(pw, c, cv)
    data, proof = _prove_verify(b, pw)
    rot = ((av >> 7) | (av << (32 - 7))) & (B32 - 1)
    assert proof.public_inputs == [av ^ cv, av & cv, rot, av >> 3]


def test_u32_balance_check_soundness():
    """A decrement below zero must be unprovable (the ComparisonGate role)."""
    b = CircuitBuilder(TEST_CONFIG)
    u = U32Builder(b)
    bal = u.add_virtual_u32()
    amt = u.add_virtual_u32()
    u.assert_lte_u32(amt, bal)
    pw = b.partial_witness()
    u.set_u32(pw, bal, 10)
    u.set_u32(pw, amt, 11)
    data = b.build()
    with pytest.raises(Exception):
        prover_mod.prove(data, pw)
