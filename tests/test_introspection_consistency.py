"""Host-side identities the sighash↔rollup binding rests on: the deposit/
withdrawal leaf encodings, event-root padding, the finalized-hash
composition, and the felt248 packing equivalence. Fast (no proving) —
these are the invariants the full-block sighash chain exercises in-circuit
(reference: introspection_result.rs get_hash / sighash_final_gl.rs)."""

import random

from city_rollup_tpu.core import poseidon_host
from city_rollup_tpu.crypto import felts as feltenc
from city_rollup_tpu.crypto.qhashout import QHashOut
from city_rollup_tpu.rollup import btc, city_store

rnd = random.Random(7)


def _pk():
    return b"\x02" + bytes(rnd.randrange(256) for _ in range(32))


def test_deposit_leaf_matches_introspection_hash():
    pk = _pk()
    txid = bytes(rnd.randrange(256) for _ in range(32))
    dep = btc.IntrospectionDeposit(txid=txid, public_key=pk, value=123456)
    leaf = city_store.hash_deposit(
        tuple(feltenc.hash256_to_hash224(txid)),
        tuple(feltenc.bytes33_to_felts(pk)), 123456)
    assert list(leaf) == dep.hash()


def test_withdrawal_leaf_matches_introspection_hash():
    pkh = bytes(rnd.randrange(256) for _ in range(20))
    leaf = city_store.hash_withdrawal(
        tuple(feltenc.hash160_to_felts(pkh, 0)), 40_000)
    wd = btc.IntrospectionWithdrawal(script=btc.p2pkh_script(pkh),
                                     value=40_000)
    assert list(leaf) == wd.hash()
    # p2sh flavor
    leaf_s = city_store.hash_withdrawal(
        tuple(feltenc.hash160_to_felts(pkh, 1)), 40_000)
    wd_s = btc.IntrospectionWithdrawal(script=btc.p2sh_script(pkh),
                                       value=40_000)
    assert list(leaf_s) == wd_s.hash()


def test_events_hash_matches_agg_tree_padding():
    hs = [[rnd.randrange(btc.P) for _ in range(4)] for _ in range(3)]
    assert btc.events_hash([hs[0]]) == hs[0]
    two = poseidon_host.two_to_one(hs[0], hs[1])
    assert btc.events_hash(hs[:2]) == two
    four = poseidon_host.two_to_one(
        two, poseidon_host.two_to_one(hs[2], [0, 0, 0, 0]))
    assert btc.events_hash(hs) == four
    assert btc.events_hash([]) == [0, 0, 0, 0]


def test_finalized_hash_and_felt248_identity():
    pk = _pk()
    txid = bytes(rnd.randrange(256) for _ in range(32))
    dep = btc.IntrospectionDeposit(txid=txid, public_key=pk, value=10)
    pkh = bytes(rnd.randrange(256) for _ in range(20))
    wd = btc.IntrospectionWithdrawal(script=btc.p2pkh_script(pkh), value=3)
    old_root = tuple(rnd.randrange(btc.P) for _ in range(4))
    new_root = tuple(rnd.randrange(btc.P) for _ in range(4))
    old_bytes = QHashOut(old_root).to_le_bytes()
    new_bytes = QHashOut(new_root).to_le_bytes()
    res = btc.IntrospectionResult(
        deposits=[dep], withdrawals=[wd],
        current_block_state_hash=feltenc.hash256_to_felt248(old_bytes),
        next_block_state_hash=feltenc.hash256_to_felt248(new_bytes),
        current_block_rollup_balance=100,
        next_block_rollup_balance=107, spend_index=1,
        sighash=b"\x00" * 32)
    got = poseidon_host.hash_no_pad(
        btc.events_hash([dep.hash()]) + btc.events_hash([wd.hash()]) +
        feltenc.hash256_to_felt248(old_bytes) +
        feltenc.hash256_to_felt248(new_bytes) + [100, 107, 1])
    assert got == res.finalized_hash()

    # felt248(hashout) (the final-GL in-circuit packing) == felt248 of the
    # canonical LE byte encoding (the sighash circuit's script parsing)
    def felt248_of_hashout_host(h):
        bits = []
        for e in h:
            e = int(e)
            bits.extend((e >> i) & 1 for i in range(64))
        return [sum(b << i for i, b in enumerate(bits[62 * k:62 * k + 62]))
                for k in range(4)]
    assert felt248_of_hashout_host(old_root) == \
        feltenc.hash256_to_felt248(old_bytes)
