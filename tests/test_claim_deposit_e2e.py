"""ClaimDeposit end-to-end (VERDICT r4 item 4's wiring half): a block
containing a claim-deposit op whose witness carries a REAL signature
proof, proven leaf -> aggregation -> finalize, with the op circuit
recursively verifying the proof and pinning its public inputs to
Poseidon(pk9 ∥ claim action hash).

The signature circuit here is the DEV stand-in (on-curve pk + pk-packing
+ combined hash, no ECDSA equation — l1_signature.L1DevSignatureCircuit):
the real GLV ECDSA circuit builds at 2^22 rows, beyond this host's
proving reach until dedicated nonnative-mul gates land; its datapath is
witness-validated at full width in test_secp_circuit.py. Every other
piece of the chain — pk packing shared with the deposit leaf, action
binding, recursive verification, fingerprint admission, aggregation — is
the production path."""

import dataclasses

import pytest

from city_rollup_tpu.crypto import felts
from city_rollup_tpu.crypto import secp256k1 as curve
from city_rollup_tpu.rollup import orchestrator as orch_mod
from city_rollup_tpu.rollup.circuits import (CircuitToolbox,
                                             FAST_TEST_PARAMS, encode_proof)
from city_rollup_tpu.rollup.city_store import CityStore
from city_rollup_tpu.rollup.l1_signature import L1DevSignatureCircuit
from city_rollup_tpu.rollup.proof_store import MemoryProofStore
from city_rollup_tpu.rollup.queues import QueueHub
from city_rollup_tpu.rollup.worker import Worker


@pytest.mark.slow
def test_claim_deposit_block_e2e():
    sk = 0xDEADBEEF1337
    pk = curve.ECDSAPublicKey(curve.scalar_mul(sk, curve.GENERATOR))
    pk9 = tuple(felts.bytes33_to_felts(pk.to_bytes_compressed()))

    dev = L1DevSignatureCircuit.build(FAST_TEST_PARAMS.config)
    params = dataclasses.replace(FAST_TEST_PARAMS, l1_sig_circuit=dev.data)
    toolbox = CircuitToolbox(params)

    city = CityStore(user_tree_height=params.user_tree_height,
                     deposit_tree_height=params.deposit_tree_height,
                     withdrawal_tree_height=params.withdrawal_tree_height)
    store = MemoryProofStore()
    hub = QueueHub()
    orch = orch_mod.Orchestrator(city, store, hub, params=params)

    uid, dep_id, value = 5, 0, params.deposit_fee + 500
    txid224 = (11, 22, 33, 44)
    city.register_user(0, uid, (7, 7, 7, 7))
    city.add_deposit(0, dep_id, txid224, pk9, value)

    # the L1 key signs the claim action (the message the sig proof binds)
    action = orch_mod.claim_action_hash(params, uid, txid224, value)
    msg_int = sum(int(a) << (64 * i) for i, a in enumerate(action))
    sig_proof = dev.prove(pk, msg_int)
    assert [int(x) for x in sig_proof.public_inputs] == \
        curve.combined_action_hash(pk, msg_int)

    reqs = orch_mod.BlockRequests(claim_deposits=[orch_mod.ClaimDeposit(
        uid, dep_id, txid224, pk9, value,
        l1_signature_proof=encode_proof(sig_proof).hex())])
    planned = orch.plan_block(1, reqs)
    orch.enqueue(planned)
    worker = Worker(toolbox, store, hub)
    n = 0
    while worker.process_next_job():
        n += 1
    assert n >= planned.num_jobs
    assert orch.finalize(planned, toolbox)
    # state moved: deposit marked claimed, balance += value - fee
    bal, _, _ = city.get_user_state(uid, 1)
    assert bal == value - params.deposit_fee
