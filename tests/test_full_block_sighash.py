"""Flagship end-to-end: a block containing a deposit and a withdrawal
proves through the ENTIRE chain — op circuits, aggregation trees, block
state transition, sighash introspection per tx input, whitelist wrapper,
and the final-GL circuit binding the covenant state hashes to the proven
city roots (VERDICT r3 item 1 "Done when").

Reference role: full_block.rs + sighash/finalizer.rs + job_planner.rs
sighash stages + sighash_final_gl.rs.
"""

import os
import random

import pytest

from city_rollup_tpu.core import poseidon_host
from city_rollup_tpu.crypto import felts as feltenc
from city_rollup_tpu.crypto.hashes import hash160
from city_rollup_tpu.crypto.qhashout import QHashOut
from city_rollup_tpu.rollup import btc
from city_rollup_tpu.rollup import orchestrator as orch_mod
from city_rollup_tpu.rollup.circuits import (CircuitToolbox,
                                             FAST_TEST_PARAMS, decode_proof)
from city_rollup_tpu.rollup.city_store import CityStore
from city_rollup_tpu.rollup.job_id import JobID, JobTopic
from city_rollup_tpu.rollup.proof_store import MemoryProofStore
from city_rollup_tpu.rollup.queues import Q_NOTIFICATIONS, QueueHub
from city_rollup_tpu.rollup.sighash_toolbox import SigHashToolbox
from city_rollup_tpu.rollup.worker import Worker

rnd = random.Random(41)

# shrunken covenant (same shape family as tests/test_sighash.py)
TEST_CFG = btc.BlockSpendCoreConfig(
    block_spend_index=0,
    block_funding_script_size=20,
    block_sighash_script_size=41,       # PUSH32 + 32 state + 8 body
    block_output_script_size=23,
    deposit_funding_script_size=40,     # 7 prefix + 33 pubkey
    withdrawal_output_script_size=25,
    sighash_type=1, locktime=0, version=2)
TEST_BODY = bytes(range(8))


def _deposit_tx(covenant_script: bytes, value: int) -> btc.BTCTransaction:
    pk = b"\x02" + bytes(rnd.randrange(256) for _ in range(32))
    return btc.BTCTransaction(
        version=2,
        inputs=[btc.BTCTransactionInput(
            hash=bytes(rnd.randrange(256) for _ in range(32)), index=0,
            script=bytes(7) + pk)],
        outputs=[btc.BTCTransactionOutput(
            value=value,
            script=btc.p2sh_script(btc.p2sh_address_of(covenant_script)))],
        locktime=0)


@pytest.mark.slow
def test_full_block_with_sighash_chain():
    p = FAST_TEST_PARAMS
    city = CityStore(user_tree_height=p.user_tree_height,
                     deposit_tree_height=p.deposit_tree_height,
                     withdrawal_tree_height=p.withdrawal_tree_height)
    store = MemoryProofStore()
    hub = QueueHub()
    toolbox = CircuitToolbox(p)
    orch = orch_mod.Orchestrator(city, store, hub, params=p)

    # genesis: one funded user
    wfee = orch.params.withdrawal_fee
    city.register_user(0, 0, (1, 1, 1, 1))
    city.increment_user_balance(0, 0, 100_000 + wfee)
    old_root = city.get_city_root(0)
    old_bytes = QHashOut(tuple(old_root)).to_le_bytes()
    cur_script = bytes([btc.OP_PUSHBYTES_32]) + old_bytes + TEST_BODY

    prev_tx = orch_mod.make_genesis_block_tx(
        TEST_CFG, TEST_BODY, old_bytes, balance=5_000_000)
    dep_tx = _deposit_tx(cur_script, 1_000_000)

    pkh = bytes(rnd.randrange(256) for _ in range(20))
    wd_addr = tuple(feltenc.hash160_to_felts(pkh, 0))        # p2pkh
    reqs = orch_mod.BlockRequests(
        add_deposits=orch_mod.requests_from_deposit_txs([dep_tx], 0),
        add_withdrawals=[orch_mod.AddWithdrawal(0, 0, wd_addr, 40_000)],
        process_withdrawals=[orch_mod.ProcessWithdrawal(0)],
    )
    ctx = orch_mod.L1BlockContext(
        spend_cfg=TEST_CFG, script_body=TEST_BODY, prev_block_tx=prev_tx,
        deposit_txs=[dep_tx], with_groth16=False)
    planned = orch.plan_block(1, reqs, l1_context=ctx)
    assert len(planned.hints) == 2                 # covenant + 1 deposit
    assert planned.block_tx.outputs[0].value == \
        5_000_000 + 1_000_000 - 40_000

    # sighash toolbox over the two shapes this block needs
    gids = [h.gadget_id() for h in planned.hints]
    assert len({g.to_felt() for g in gids}) == 2
    sht = SigHashToolbox(p.config, TEST_CFG, TEST_BODY, gids,
                         toolbox.block["transition"][0])

    orch.enqueue(planned)
    worker = Worker(toolbox, store, hub, sighash_toolbox=sht)
    processed = 0
    while worker.process_next_job():
        processed += 1
        assert processed < 300, "DAG did not converge"
    assert processed == planned.num_jobs

    # completion notification fired only after the sighash chain
    note = hub.receive(Q_NOTIFICATIONS)
    assert note is not None
    assert JobID.from_bytes(note[1]).topic == \
        JobTopic.NOTIFY_ORCHESTRATOR_COMPLETE

    # the final-GL proofs bind (felt248 of the city roots, the sighash)
    new_root = city.get_city_root(1)
    new_bytes = QHashOut(tuple(new_root)).to_le_bytes()
    for i, fin in enumerate(planned.sighash_final_jobs):
        raw = store.get_proof(fin.output_proof_id())
        assert raw is not None
        proof = decode_proof(raw)
        pis = [int(x) for x in proof.public_inputs]
        assert pis[0:4] == feltenc.hash256_to_felt248(old_bytes)
        expect_sighash = btc.sighash(planned.block_tx, i, cur_script,
                                     TEST_CFG.sighash_type)
        assert pis[4:8] == feltenc.hash256_to_felt252(expect_sighash)
        from city_rollup_tpu.snark import verifier as snark_verifier
        snark_verifier.verify(proof, sht.final_gl.data.common,
                              sht.final_gl.data.verifier)

    assert orch.finalize(planned, toolbox)

    # -- tamper: binding must reject mismatched introspection components --
    # Reusing the proven artifacts, attempt a final-GL proof whose witness
    # components disagree with the wrapper's finalized hash (spend_idx
    # swapped): the in-circuit recomputation cannot match the wrapper's
    # public input, so witness generation / constraint checking fails.
    tr_raw = store.get_proof(planned.final_job.output_proof_id())
    tr_proof = decode_proof(tr_raw)
    from city_rollup_tpu.rollup.job_id import CircuitType
    w0 = JobID(JobTopic.GENERATE_STANDARD_PROOF, 1,
               int(CircuitType.SIGHASH_WRAPPER), group_id=111, task_index=0)
    wrap_raw = store.get_proof(w0.output_proof_id())
    assert wrap_raw is not None
    wrap_proof = decode_proof(wrap_raw)
    cur_bal = prev_tx.outputs[0].value
    next_bal = planned.block_tx.outputs[0].value
    with pytest.raises((ValueError, AssertionError)):
        sht.prove_final(tr_proof, wrap_proof,
                        {"cur_bal": cur_bal, "next_bal": next_bal,
                         "spend_idx": 1})   # true index is 0
