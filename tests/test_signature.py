"""ZK signature circuits + proof minifier + wallets (reference:
city_common_circuit/src/circuits/zk_signature*, proof_minifier/*,
wallet/zk.rs — SURVEY.md §2.2)."""

import numpy as np
import pytest

from city_rollup_tpu.core import fri, poseidon_host
from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark import prover as prover_mod
from city_rollup_tpu.snark import verifier as verifier_mod
from city_rollup_tpu.snark.circuit import generate_witness
from city_rollup_tpu.snark.debug import check_witness
from city_rollup_tpu.snark.minifier import MinifierChain, ProofMinifier
from city_rollup_tpu.snark.prover import public_inputs_hash
from city_rollup_tpu.rollup.zk_signature import (
    ZK_SIG_DOMAIN, ZKSignatureInnerCircuit, ZKSignatureWrapperCircuit,
    FixedPublicKeyZKSignatureCircuit, derive_public_key)
from city_rollup_tpu.rollup.wallet import (CityMemoryWallet,
                                           SimpleZKSignatureWallet)

SMALL = CircuitConfig.poseidon_config(
    num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                      num_query_rounds=4, final_poly_bits=2))

SK = [11, 22, 33, 44]
ACTION = [5, 6, 7, 8]


def test_derive_public_key_matches_circuit():
    inner = ZKSignatureInnerCircuit.build(SMALL)
    pw = inner.data._builder.partial_witness()
    for t, v in zip(inner.sk_targets, SK):
        pw.set(t, v)
    for t, v in zip(inner.action_targets, ACTION):
        pw.set(t, v)
    wires = generate_witness(inner.data, pw)
    pis = [pw.get(t) for t in inner.data.prover.pi_targets]
    assert pis[:4] == derive_public_key(SK)
    assert pis[4:8] == ACTION
    assert check_witness(inner.data, wires,
                         public_inputs_hash(pis)) == []


def test_fixed_public_key_circuit():
    pk = derive_public_key(SK)
    circ = FixedPublicKeyZKSignatureCircuit.build(SMALL, pk)
    pw = circ.data._builder.partial_witness()
    for t, v in zip(circ.sk_targets, SK):
        pw.set(t, v)
    for t, v in zip(circ.action_targets, ACTION):
        pw.set(t, v)
    wires = generate_witness(circ.data, pw)
    pis = [pw.get(t) for t in circ.data.prover.pi_targets]
    assert pis[:4] == pk
    assert check_witness(circ.data, wires, public_inputs_hash(pis)) == []


def test_wallet_key_management():
    w = SimpleZKSignatureWallet.__new__(SimpleZKSignatureWallet)
    w.wrapper = None                      # keys only, no circuit build
    w._keys = {}
    pk = w.add_zk_private_key(SK)
    assert pk == tuple(derive_public_key(SK))
    assert w.has_public_key(pk)
    pk2 = w.create_zk_private_key()
    assert pk2 != pk and len(w.get_public_keys()) == 2


@pytest.mark.slow
def test_sign_and_verify_wrapper():
    wrapper = ZKSignatureWrapperCircuit.build(SMALL)
    proof = wrapper.sign(SK, ACTION)
    assert wrapper.verify(proof)
    assert proof.public_inputs[:4] == derive_public_key(SK)
    assert proof.public_inputs[4:8] == ACTION
    # tampered action must fail verification
    bad = list(proof.public_inputs)
    bad[4] = (bad[4] + 1) % ((1 << 64) - (1 << 32) + 1)
    import dataclasses
    tampered = dataclasses.replace(proof, public_inputs=bad)
    assert not wrapper.verify(tampered)


def test_zk_blinding_distinct_openings():
    """zk mode (VERDICT r3 item 9): two proofs of the SAME statement with
    the same sk must expose different wire openings (the openings carry
    blinding randomness, not bare witness evaluations), and both verify."""
    from city_rollup_tpu.rollup.zk_signature import ZKSignatureInnerCircuit
    inner = ZKSignatureInnerCircuit.build(SMALL)
    assert inner.data.common.config.zk
    assert inner.data.common.config.num_blinding_rows > 0
    p1 = inner.sign(SK, ACTION)
    p2 = inner.sign(SK, ACTION)
    assert p1.public_inputs == p2.public_inputs
    assert p1.openings.wires != p2.openings.wires, \
        "zk openings must be randomized"
    assert bytes(p1.wires_cap.tobytes()) != bytes(p2.wires_cap.tobytes())
    verifier_mod.verify(p1, inner.data.common, inner.data.verifier)
    verifier_mod.verify(p2, inner.data.common, inner.data.verifier)


@pytest.mark.slow
def test_minifier_chain_preserves_public_inputs():
    b = CircuitBuilder(SMALL)
    x = b.add_virtual_target()
    out = b.add_const(b.square(x), 3)
    b.register_public_input(out)
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 9)
    proof = prover_mod.prove(data, pw)

    chain = MinifierChain.build(data, 2, SMALL)
    mini = chain.prove(proof)
    assert mini.public_inputs == proof.public_inputs
    assert verifier_mod.verify(mini, chain.data.common,
                               chain.data.verifier)
    assert chain.fingerprint == \
        ProofMinifier.fingerprint.fget(chain.steps[-1])
