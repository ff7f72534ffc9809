"""Sighash introspection stack: shape layout math (fast) + the full
circuit on a shrunken core config (slow) (reference:
city_rollup_circuit/src/sighash_circuits/*, SURVEY.md §2.5)."""

import hashlib
import os
import random

import pytest

from city_rollup_tpu.core import fri
from city_rollup_tpu.crypto.hashes import hash160
from city_rollup_tpu.rollup import btc
from city_rollup_tpu.rollup.sighash_circuit import SigHashCircuit, SigHashShape
from city_rollup_tpu.snark import CircuitConfig

rnd = random.Random(99)

# shrunken covenant for tests (reference uses dev-mode escapes similarly)
TEST_CFG = btc.BlockSpendCoreConfig(
    block_spend_index=0,
    block_funding_script_size=20,
    block_sighash_script_size=41,       # PUSH32 + 32 state + 8 body
    block_output_script_size=23,
    deposit_funding_script_size=40,     # 7 prefix + 33 pubkey
    withdrawal_output_script_size=25,
    sighash_type=1, locktime=0, version=2)
TEST_BODY = bytes(range(8))

FAST = CircuitConfig.poseidon_config(
    num_challenges=2,
    fri=fri.FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                      num_query_rounds=4, final_poly_bits=3))


def _redeem_script(state: bytes) -> bytes:
    return bytes([btc.OP_PUSHBYTES_32]) + state + TEST_BODY


def _make_hint(gid: btc.SigHashGadgetId):
    cur_state = os.urandom(32)
    next_state = os.urandom(32)
    cur_script = _redeem_script(cur_state)
    next_script = _redeem_script(next_state)

    fund_block = btc.BTCTransaction(
        version=2,
        inputs=[btc.BTCTransactionInput(
            hash=os.urandom(32), index=0,
            script=os.urandom(TEST_CFG.block_funding_script_size))],
        outputs=[btc.BTCTransactionOutput(
            value=5_000_000, script=btc.p2sh_script(hash160(cur_script)))],
        locktime=0)
    fundings = [fund_block]
    for _ in range(gid.num_deposits):
        pk = b"\x02" + os.urandom(32)
        fundings.append(btc.BTCTransaction(
            version=2,
            inputs=[btc.BTCTransactionInput(
                hash=os.urandom(32), index=0,
                script=os.urandom(7) + pk)],
            outputs=[btc.BTCTransactionOutput(
                value=1_000_000, script=btc.p2sh_script(os.urandom(20)))],
            locktime=0))

    outputs = [btc.BTCTransactionOutput(
        value=5_900_000, script=btc.p2sh_script(hash160(next_script)))]
    for _ in range(gid.num_withdrawals):
        outputs.append(btc.BTCTransactionOutput(
            value=50_000, script=btc.p2pkh_script(os.urandom(20))))
    block_tx = btc.BTCTransaction(
        version=2,
        inputs=[btc.BTCTransactionInput(hash=f.txid(), index=0, script=b"")
                for f in fundings],
        outputs=outputs, locktime=0)
    preimage = btc.sighash_preimage(block_tx, gid.current_spend_index,
                                    cur_script)
    return btc.BlockSpendIntrospectionHint(
        sighash_preimage=preimage,
        last_block_spend_index=0, block_spend_index=0,
        current_spend_index=gid.current_spend_index,
        funding_transactions=fundings,
        next_block_redeem_script=next_script), cur_state, next_state


def test_shape_layout_matches_serialization():
    gid = btc.SigHashGadgetId(0, 0, 1, 1, 0)
    shape = SigHashShape(gid=gid, cfg=TEST_CFG)
    hint, _, _ = _make_hint(gid)
    pre_len, pre_ins, pre_outs = shape.preimage_layout()
    assert pre_len == len(hint.sighash_preimage)
    # txid offsets line up with the funding txids
    for i, (txid_off, _, _, _) in enumerate(pre_ins):
        assert hint.sighash_preimage[txid_off:txid_off + 32] == \
            hint.funding_transactions[i].txid()
    for i, ftx in enumerate(hint.funding_transactions):
        flen, _, _ = shape.funding_tx_layout(i)
        assert flen == len(ftx.serialize())
    # current input's script carries the state hash at offset +1
    s_off = pre_ins[gid.current_spend_index][2]
    assert hint.sighash_preimage[s_off] == btc.OP_PUSHBYTES_32


def test_gadget_id_from_hint():
    gid = btc.SigHashGadgetId(0, 0, 2, 1, 1)
    hint, _, _ = _make_hint(gid)
    assert hint.gadget_id() == gid


@pytest.mark.slow
def test_sighash_circuit_end_to_end():
    from city_rollup_tpu.snark.circuit import generate_witness
    from city_rollup_tpu.snark.debug import check_witness
    from city_rollup_tpu.snark.prover import public_inputs_hash
    from city_rollup_tpu.crypto import felts as feltenc

    gid = btc.SigHashGadgetId(0, 0, 1, 1, 0)
    shape = SigHashShape(gid=gid, cfg=TEST_CFG)
    circ = SigHashCircuit.build(FAST, shape, TEST_BODY)
    hint, cur_state, next_state = _make_hint(gid)

    pw = circ.fill_witness(hint)
    wires = generate_witness(circ.data, pw)
    pis = [pw.get(t) or 0 for t in circ.data.prover.pi_targets]
    assert check_witness(circ.data, wires, public_inputs_hash(pis)) == []

    # PI[4:8] must be the felt252 packing of the true sighash
    expect_sighash = hashlib.sha256(hashlib.sha256(
        hint.sighash_preimage).digest()).digest()
    assert pis[4:8] == feltenc.hash256_to_felt252(expect_sighash)

    # PI[0:4] must equal the host-side finalized introspection hash
    deposits = btc.parse_deposits(hint.funding_transactions, 0)
    block_tx = btc.BTCTransaction.parse(hint.sighash_preimage[:-4])
    withdrawals = btc.parse_withdrawals(block_tx)
    result = btc.IntrospectionResult(
        deposits=deposits, withdrawals=withdrawals,
        current_block_state_hash=feltenc.hash256_to_felt248(cur_state),
        next_block_state_hash=feltenc.hash256_to_felt248(next_state),
        current_block_rollup_balance=5_000_000,
        next_block_rollup_balance=5_900_000,
        spend_index=0, sighash=expect_sighash)
    assert pis[0:4] == result.finalized_hash()
