"""BTC tx model, sighash preimages, felt packings, covenant script,
permutation enumeration, whitelist tree (reference:
city_rollup_common/src/introspection/*, block_template/config.rs,
city_store/src/store/sighash — SURVEY.md §2.5)."""

import hashlib
import os

from city_rollup_tpu.crypto import felts as feltenc
from city_rollup_tpu.rollup import btc
from city_rollup_tpu.rollup.sighash_tree import SigHashMerkleTree


def _sha256d(b):
    return hashlib.sha256(hashlib.sha256(b).digest()).digest()


def _mk_tx(n_in=2, n_out=2, script=b"\x51"):
    ins = [btc.BTCTransactionInput(hash=bytes([i]) * 32, index=i,
                                   script=script, sequence=0xFFFFFFFF)
           for i in range(n_in)]
    outs = [btc.BTCTransactionOutput(value=1000 * (i + 1),
                                     script=btc.p2pkh_script(bytes([i]) * 20))
            for i in range(n_out)]
    return btc.BTCTransaction(version=2, inputs=ins, outputs=outs,
                              locktime=0)


def test_tx_serialize_parse_roundtrip():
    tx = _mk_tx()
    data = tx.serialize()
    tx2 = btc.BTCTransaction.parse(data)
    assert tx2 == tx
    assert tx.txid() == _sha256d(data)


def test_varint_boundaries():
    for n in (0, 1, 0xFC, 0xFD, 0xFFFF, 0x10000, 0xFFFFFFFF, 2**40):
        import io
        assert btc.read_varint(io.BytesIO(btc.write_varint(n))) == n


def test_sighash_preimage_structure():
    tx = _mk_tx(n_in=3)
    sub = b"\x76\xa9\x14" + b"\xAA" * 20 + b"\x88\xac"
    pre = btc.sighash_preimage(tx, 1, sub)
    assert pre[-4:] == (1).to_bytes(4, "little")
    parsed = btc.BTCTransaction.parse(pre[:-4])
    assert parsed.inputs[0].script == b""
    assert parsed.inputs[1].script == sub
    assert parsed.inputs[2].script == b""
    assert btc.sighash(tx, 1, sub) == _sha256d(pre)


def test_felt252_roundtrip():
    h = bytes(range(31)) + b"\x0f"          # top nibble < 16 so roundtrips
    limbs = feltenc.hash256_to_felt252(h)
    assert all(0 <= x < (1 << 63) for x in limbs)
    assert feltenc.felt252_to_hash256(limbs) == h


def test_felt248_and_hash224():
    h = os.urandom(32)
    l248 = feltenc.hash256_to_felt248(h)
    assert feltenc.felt248_to_hash256(l248)[:31] == h[:31]
    l224 = feltenc.hash256_to_hash224(h)
    assert feltenc.hash224_to_bytes(l224) == h[:28]
    assert all(0 <= x < (1 << 56) for x in l224)


def test_hash160_felts_roundtrip():
    h = os.urandom(20)
    limbs = feltenc.hash160_to_felts(h, type_flag=1)
    back, flag = feltenc.felts_to_hash160(limbs)
    assert back == h and flag == 1


def test_bytes33_felts_roundtrip():
    pk = b"\x02" + os.urandom(32)
    felts = feltenc.bytes33_to_felts(pk)
    assert len(felts) == 9
    assert feltenc.felts_to_bytes33(felts) == pk


def test_block_script_shape():
    state = bytes(32)
    chunks = [bytes([i]) * 80 for i in range(6)]
    script = btc.encode_block_script(state, chunks)
    assert len(script) == 489
    assert script[0] == btc.OP_PUSHBYTES_32
    assert script[1:33] == state
    # committed hash of chunk 0 embedded after SWAP DUP SHA256 PUSH32
    assert script[37:69] == hashlib.sha256(chunks[0]).digest()


def test_permutation_count_matches_reference():
    # 1,875 whitelisted shapes for max 4 deposits / 4 withdrawals
    # (sighash_wrapper_config.rs:24)
    ids = btc.generate_id_permutations(4, 4)
    assert len(ids) == 1875
    assert len({i.to_felt() for i in ids}) == 1875


def test_whitelist_tree_proofs():
    fps = [(i, i + 1, i + 2, i + 3) for i in range(0, 40, 4)]
    tree = SigHashMerkleTree.build(fps)
    for idx in (0, 3, len(fps) - 1):
        proof = tree.prove(idx)
        assert proof.verify()
        assert proof.value == fps[idx]
    # a non-member leaf proves the zero leaf, not a fingerprint
    p_empty = tree.prove(len(fps) + 5)
    assert p_empty.verify()
    assert p_empty.value == (0, 0, 0, 0)


def test_introspection_deposit_withdrawal_hashes():
    dep = btc.IntrospectionDeposit(txid=os.urandom(32),
                                   public_key=b"\x03" + os.urandom(32),
                                   value=12345)
    h = dep.hash()
    assert len(h) == 4 and all(isinstance(x, int) for x in h)
    wd = btc.IntrospectionWithdrawal(
        script=btc.p2pkh_script(os.urandom(20)), value=777)
    hw = wd.hash()
    assert hw[0] == 777 and len(hw) == 4
    wd2 = btc.IntrospectionWithdrawal(
        script=btc.p2sh_script(os.urandom(20)), value=778)
    assert wd2.hash()[3] >> 48 == 1      # p2sh type flag


def test_events_hash_padding():
    e1 = [1, 2, 3, 4]
    e2 = [5, 6, 7, 8]
    e3 = [9, 10, 11, 12]
    assert btc.events_hash([]) == [0, 0, 0, 0]
    r3 = btc.events_hash([e1, e2, e3])
    from city_rollup_tpu.core import poseidon_host
    expect = poseidon_host.two_to_one(
        poseidon_host.two_to_one(e1, e2),
        poseidon_host.two_to_one(e3, [0, 0, 0, 0]))
    assert r3 == expect


def test_parse_deposits_and_withdrawals():
    fund_block = _mk_tx(n_in=2, n_out=1)
    pk = b"\x02" + os.urandom(32)
    dep_tx = btc.BTCTransaction(
        version=2,
        inputs=[btc.BTCTransactionInput(hash=os.urandom(32), index=0,
                                        script=b"\x47" + os.urandom(71) +
                                        b"\x21" + pk)],
        outputs=[btc.BTCTransactionOutput(value=5000, script=b"\x51")],
        locktime=0)
    deps = btc.parse_deposits([fund_block, dep_tx], block_spend_index=0)
    assert len(deps) == 1
    assert deps[0].public_key == pk and deps[0].value == 5000
    block_tx = _mk_tx(n_in=1, n_out=3)
    wds = btc.parse_withdrawals(block_tx)
    assert len(wds) == 2
    assert wds[0].value == block_tx.outputs[1].value
