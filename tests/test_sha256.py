"""In-circuit SHA256 gadget vs hashlib (reference:
city_common_circuit/src/builder/hash/sha256.rs tests — SURVEY.md §4)."""

import hashlib

from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark.circuit import generate_witness
from city_rollup_tpu.snark.debug import check_witness
from city_rollup_tpu.snark.prover import public_inputs_hash
from city_rollup_tpu.snark.sha256 import (Sha256Gadget, get_bytes_witness,
                                          set_bytes_witness)

CFG = CircuitConfig.poseidon_config()


def _run(msg: bytes, double: bool = False) -> bytes:
    b = CircuitBuilder(CFG)
    g = Sha256Gadget(b)
    byte_ts = b.add_virtual_targets(len(msg))
    out = g.sha256d_bytes(byte_ts) if double else g.sha256_bytes(byte_ts)
    data = b.build()
    pw = b.partial_witness()
    set_bytes_witness(pw, byte_ts, msg)
    wires = generate_witness(data, pw)
    digest = get_bytes_witness(pw, out)
    pis = [pw.get(t) or 0 for t in data.prover.pi_targets]
    assert check_witness(data, wires, public_inputs_hash(pis)) == []
    return digest


def test_sha256_32_bytes():
    msg = bytes(range(32))
    assert _run(msg) == hashlib.sha256(msg).digest()


def test_sha256_two_blocks():
    msg = bytes(range(64))          # 64-byte message -> 2 blocks with padding
    assert _run(msg) == hashlib.sha256(msg).digest()


def test_sha256_unaligned_lengths():
    """Byte-granular FIPS padding (sighash preimages are rarely 4-byte
    aligned; round-4 fix)."""
    for n in (1, 3, 53, 55, 56, 203):
        msg = bytes((7 * i + 1) % 256 for i in range(n))
        assert _run(msg) == hashlib.sha256(msg).digest(), n


def test_sha256d_unaligned():
    msg = bytes(range(41))
    assert _run(msg, double=True) == hashlib.sha256(
        hashlib.sha256(msg).digest()).digest()


def test_sha256d():
    msg = b"city-rollup-tpu!" * 2
    expect = hashlib.sha256(hashlib.sha256(msg).digest()).digest()
    assert _run(msg, double=True) == expect


def test_two_to_one():
    left, right = bytes(range(32)), bytes(range(32, 64))
    b = CircuitBuilder(CFG)
    g = Sha256Gadget(b)
    lt = b.add_virtual_targets(32)
    rt = b.add_virtual_targets(32)
    out = g.two_to_one(lt, rt)
    data = b.build()
    pw = b.partial_witness()
    set_bytes_witness(pw, lt, left)
    set_bytes_witness(pw, rt, right)
    generate_witness(data, pw)
    assert get_bytes_witness(pw, out) == \
        hashlib.sha256(left + right).digest()
