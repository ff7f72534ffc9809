"""In-circuit RIPEMD-160 / hash160 vs the host implementation."""

from city_rollup_tpu.crypto.hashes import hash160, ripemd160
from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark.circuit import generate_witness
from city_rollup_tpu.snark.ripemd160 import Ripemd160Gadget
from city_rollup_tpu.snark.sha256 import get_bytes_witness, set_bytes_witness

CFG = CircuitConfig.poseidon_config()


def test_ripemd160_circuit():
    msg = bytes(range(32))
    b = CircuitBuilder(CFG)
    g = Ripemd160Gadget(b)
    byte_ts = b.add_virtual_targets(len(msg))
    out = g.ripemd160_bytes(byte_ts)
    data = b.build()
    pw = b.partial_witness()
    set_bytes_witness(pw, byte_ts, msg)
    generate_witness(data, pw)
    assert get_bytes_witness(pw, out) == bytes(ripemd160(msg))


def test_hash160_circuit():
    msg = b"city-rollup-hash160-test-vec!!!!"          # 32 bytes
    b = CircuitBuilder(CFG)
    g = Ripemd160Gadget(b)
    byte_ts = b.add_virtual_targets(len(msg))
    out = g.hash160_bytes(byte_ts)
    data = b.build()
    pw = b.partial_witness()
    set_bytes_witness(pw, byte_ts, msg)
    generate_witness(data, pw)
    assert get_bytes_witness(pw, out) == bytes(hash160(msg))
