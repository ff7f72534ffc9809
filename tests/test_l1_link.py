"""L1 link + final transaction assembly (rollup/link.py + the
orchestrator's step_2 twin). Reference: city_rollup_common/src/link/,
actors/simple.rs:348-389, block_template/data.rs witness-script encoding."""

import json
import os
import random

from city_rollup_tpu.crypto import felts as feltenc
from city_rollup_tpu.crypto.qhashout import QHashOut
from city_rollup_tpu.rollup import btc, orchestrator as orch_mod
from city_rollup_tpu.rollup.city_store import CityStore
from city_rollup_tpu.rollup.link import MemoryBTCLink
from city_rollup_tpu.rollup.proof_store import MemoryProofStore
from city_rollup_tpu.rollup.queues import QueueHub

rnd = random.Random(5)

TEST_CFG = btc.BlockSpendCoreConfig(
    block_spend_index=0, block_funding_script_size=20,
    block_sighash_script_size=41, block_output_script_size=23,
    deposit_funding_script_size=40, withdrawal_output_script_size=25,
    sighash_type=1, locktime=0, version=2)
TEST_BODY = bytes(range(8))


def test_memory_link_utxo_tracking():
    link = MemoryBTCLink()
    addr = bytes(rnd.randrange(256) for _ in range(20))
    tx = link.fund_address(addr, 1_000)
    assert link.get_transaction(tx.txid()).serialize() == tx.serialize()
    found = link.get_confirmed_funding_transactions(addr)
    assert [t.txid() for t in found] == [tx.txid()]
    # spending the output removes it from the funding set
    spend = btc.BTCTransaction(
        version=2,
        inputs=[btc.BTCTransactionInput(hash=tx.txid(), index=0,
                                        script=b"")],
        outputs=[btc.BTCTransactionOutput(
            value=900, script=btc.p2sh_script(addr))],
        locktime=0)
    link.send_transaction(spend)
    link.mine_blocks(1)
    found = link.get_confirmed_funding_transactions(addr)
    assert [t.txid() for t in found] == [spend.txid()]


def test_push_data_encodings():
    assert btc.push_data(b"ab") == b"\x02ab"
    big = bytes(80)
    assert btc.push_data(big)[:2] == bytes([btc.OP_PUSHDATA1, 80])
    ws = btc.encode_binary_witness_script_for_p2sh(b"SCRIPT", [b"a", b"b"])
    assert ws == b"\x01a\x01b\x06SCRIPT"


def test_assemble_l1_transaction_from_wrap_outputs():
    """The orchestrator fills the planned block tx's input scripts with the
    Groth16 witness pushes read from the proof store, and broadcasts."""
    p_params = None
    city = CityStore(user_tree_height=8, deposit_tree_height=8,
                     withdrawal_tree_height=8)
    store = MemoryProofStore()
    hub = QueueHub()
    from city_rollup_tpu.rollup.circuits import FAST_TEST_PARAMS
    orch = orch_mod.Orchestrator(city, store, hub,
                                 params=FAST_TEST_PARAMS)
    city.register_user(0, 0, (1, 1, 1, 1))
    old_root = city.get_city_root(0)
    old_bytes = QHashOut(tuple(old_root)).to_le_bytes()
    prev_tx = orch_mod.make_genesis_block_tx(TEST_CFG, TEST_BODY, old_bytes,
                                             balance=5_000_000)
    ctx = orch_mod.L1BlockContext(
        spend_cfg=TEST_CFG, script_body=TEST_BODY, prev_block_tx=prev_tx,
        deposit_txs=[], with_groth16=True)
    planned = orch.plan_block(1, orch_mod.BlockRequests(), l1_context=ctx)
    assert len(planned.groth16_jobs) == 1
    # fabricate the wrap output (the worker writes this JSON shape)
    pd = {"pi_a": "aa" * 48, "pi_b_a0": "bb" * 48, "pi_b_a1": "cc" * 48,
          "pi_c": "dd" * 48}
    store.set_bytes(planned.groth16_jobs[0].output_proof_id(),
                    json.dumps({"proof_data": pd,
                                "public_inputs": []}).encode())
    link = MemoryBTCLink()
    # broadcasting requires the explicit dev-mode acknowledgment (the wrap
    # statement is an attestation, not on-chain soundness — ADVICE r4)
    import pytest
    from city_rollup_tpu.rollup import groth16_wrap as g16
    with pytest.raises(RuntimeError, match="refusing to broadcast"):
        orch.assemble_l1_transaction(planned, b"VDATA", link=link)
    g16.GROTH16_WRAP_ATTESTATION_DEV_MODE = True
    try:
        final_tx = orch.assemble_l1_transaction(planned, b"VDATA", link=link)
    finally:
        g16.GROTH16_WRAP_ATTESTATION_DEV_MODE = False
    script = final_tx.inputs[0].script
    # witness layout: 4x48-byte proof pushes + vdata + covenant script
    assert script[0] == 48 and script[1:49] == bytes.fromhex("aa" * 48)
    assert script.endswith(btc.push_data(planned.covenant_script))
    assert link.get_transaction(final_tx.txid()) is not None
    # round-trips through the parser
    assert btc.BTCTransaction.parse(final_tx.serialize()).txid() == \
        final_tx.txid()
