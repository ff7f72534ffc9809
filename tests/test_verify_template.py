"""Serializable verifier templates (snark/verify_template.py — reference
city_common_circuit/src/verify_template/)."""

import json

from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark import prover as prover_mod
from city_rollup_tpu.snark.verify_template import (circuit_template,
                                                   template_shape_key,
                                                   template_to_json,
                                                   validate_proof_shape)


def _small_circuit(c: int):
    b = CircuitBuilder(CircuitConfig())
    x = b.add_virtual_target()
    b.register_public_inputs([b.add_const(b.mul(x, x), c)])
    return b, x, b.build()


def test_template_roundtrip_and_shape_key():
    _, _, d1 = _small_circuit(1)
    _, _, d2 = _small_circuit(2)
    t1 = json.loads(template_to_json(d1))
    t2 = circuit_template(d2)
    # same shape, different circuits: equal shape keys, different digests
    assert template_shape_key(t1) == template_shape_key(t2)
    assert t1["verifier"]["circuit_digest"] != \
        t2["verifier"]["circuit_digest"]
    assert t1["log_n"] == d1.common.log_n
    assert len(t1["verifier"]["fingerprint"]) == 4


def test_template_validates_proof_shape():
    b, x, d = _small_circuit(3)
    t = circuit_template(d)
    pw = b.partial_witness()
    pw.set(x, 5)
    proof = prover_mod.prove(d, pw)
    assert validate_proof_shape(t, proof)
    # a proof of a different template (more public inputs) is rejected
    t_bad = dict(t, num_public_inputs=7)
    assert not validate_proof_shape(t_bad, proof)
