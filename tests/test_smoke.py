"""Smoke tier (`pytest -m smoke`): ONE tiny recursion proved end-to-end —
inner circuit -> recursive-verifier wrapper -> host verify — as a fast
green/red signal that the whole prover stack (witness gen, LDE/commit,
permutation + quotient, FRI, the in-circuit FRI verifier gadget, and the
host verifier) still composes (VERDICT r4 item 9; SURVEY.md §4 tiering).

Run it as its own invocation so the CPU backend uses the fast-execution
XLA pipeline + persistent cache (first-ever run pays the compiles, every
later run is warm and finishes in minutes on 2 CPUs):

    CITY_TESTS_FAST_EXEC=1 python -m pytest -m smoke -q
"""

import pytest

from city_rollup_tpu.core import fri
from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark import prover as prover_mod
from city_rollup_tpu.snark import recursion
from city_rollup_tpu.snark import verifier as verifier_mod

SMOKE_INNER = CircuitConfig(
    num_routed_wires=32, num_wires=32, num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                      num_query_rounds=4, final_poly_bits=2))
SMOKE_WRAP = CircuitConfig(
    num_routed_wires=32, num_wires=144, num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=4,
                      num_query_rounds=4, final_poly_bits=2))


@pytest.mark.smoke
def test_smoke_recursion_end_to_end():
    # 1. leaf: prove a tiny arithmetic circuit
    b = CircuitBuilder(SMOKE_INNER)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    out = b.add_const(b.add(b.mul(x, y), x), 7)
    b.register_public_input(out)
    inner_data = b.build()
    pw = b.partial_witness()
    pw.set(x, 3)
    pw.set(y, 5)
    inner_proof = prover_mod.prove(inner_data, pw)
    assert verifier_mod.verify(inner_proof, inner_data.common,
                               inner_data.verifier)

    # 2. agg: verify that proof INSIDE a wrapper circuit and prove it
    wb = CircuitBuilder(SMOKE_WRAP)
    pt = recursion.add_virtual_proof(wb, inner_data.common)
    vdt = recursion.constant_verifier_data(wb, inner_data.verifier)
    recursion.verify_proof_gadget(wb, pt, inner_data.common, vdt)
    wb.register_public_inputs(pt.public_inputs)
    wdata = wb.build()
    wpw = wb.partial_witness()
    recursion.set_proof_witness(wpw, pt, inner_proof)
    wproof = prover_mod.prove(wdata, wpw)

    # 3. host-verify the wrapper proof; PIs flow through
    assert wproof.public_inputs == inner_proof.public_inputs
    assert verifier_mod.verify(wproof, wdata.common, wdata.verifier)
