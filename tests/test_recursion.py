"""Recursive verification tests: prove a circuit, then verify that proof
*inside* a wrapper circuit (the capability every city-rollup aggregation
layer rests on — SURVEY.md §7 hard part (a))."""

import pytest

from city_rollup_tpu.core import fri
from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark import prover as prover_mod
from city_rollup_tpu.snark import verifier as verifier_mod
from city_rollup_tpu.snark import recursion
from city_rollup_tpu.snark.circuit import generate_witness
from city_rollup_tpu.snark.debug import check_witness
from city_rollup_tpu.snark.prover import public_inputs_hash

# Inner circuit: small-but-real FRI so the wrapper stays test-sized.
INNER_CONFIG = CircuitConfig(
    num_routed_wires=32, num_wires=32, num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                      num_query_rounds=4, final_poly_bits=2))

# Wrapper: Poseidon-capable trace, equally small FRI.
WRAP_CONFIG = CircuitConfig(
    num_routed_wires=32, num_wires=144, num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=4,
                      num_query_rounds=4, final_poly_bits=2))


def _prove_inner():
    b = CircuitBuilder(INNER_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    out = b.add_const(b.add(b.mul(x, y), x), 7)
    b.register_public_input(out)
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 3)
    pw.set(y, 5)
    proof = prover_mod.prove(data, pw)
    assert verifier_mod.verify(proof, data.common, data.verifier)
    return data, proof


def _build_wrapper(inner_data):
    wb = CircuitBuilder(WRAP_CONFIG)
    pt = recursion.add_virtual_proof(wb, inner_data.common)
    vdt = recursion.constant_verifier_data(wb, inner_data.verifier)
    recursion.verify_proof_gadget(wb, pt, inner_data.common, vdt)
    # re-expose the inner public inputs
    wb.register_public_inputs(pt.public_inputs)
    return wb, pt


@pytest.fixture(scope="module")
def inner():
    return _prove_inner()


@pytest.fixture(scope="module")
def wrapper(inner):
    inner_data, _ = inner
    wb, pt = _build_wrapper(inner_data)
    wdata = wb.build()
    return wb, pt, wdata


def test_wrap_witness_satisfies_constraints(inner, wrapper):
    """Fast path: generate the wrapper witness and check every gate + copy
    constraint directly (no proving)."""
    _, inner_proof = inner
    wb, pt, wdata = wrapper
    pw = wb.partial_witness()
    recursion.set_proof_witness(pw, pt, inner_proof)
    wires = generate_witness(wdata, pw)
    pis = [pw.get(t) or 0 for t in wdata.prover.pi_targets]
    bad = check_witness(wdata, wires, public_inputs_hash(pis))
    assert not bad, "\n".join(bad[:10])


def test_wrap_rejects_tampered_inner_proof(inner, wrapper):
    _, inner_proof = inner
    wb, pt, wdata = wrapper
    import copy
    bad_proof = copy.deepcopy(inner_proof)
    bad_proof.public_inputs = [999]
    pw = wb.partial_witness()
    try:
        recursion.set_proof_witness(pw, pt, bad_proof)
        wires = generate_witness(wdata, pw)
    except ValueError:
        return  # witness conflict already catches the tamper
    pis = [pw.get(t) or 0 for t in wdata.prover.pi_targets]
    bad = check_witness(wdata, wires, public_inputs_hash(pis))
    assert bad, "tampered inner proof must violate wrapper constraints"


@pytest.mark.slow
def test_wrap_prove_verify_roundtrip(inner):
    """Full integration: prove the wrapper circuit and host-verify it."""
    inner_data, inner_proof = inner
    wb, pt = _build_wrapper(inner_data)
    wdata = wb.build()
    pw = wb.partial_witness()
    recursion.set_proof_witness(pw, pt, inner_proof)
    wproof = prover_mod.prove(wdata, pw)
    assert wproof.public_inputs == inner_proof.public_inputs
    assert verifier_mod.verify(wproof, wdata.common, wdata.verifier)
