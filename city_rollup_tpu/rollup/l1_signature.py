"""L1 (secp256k1 ECDSA) signature proof circuit: proves knowledge of a
valid ECDSA signature on a message under a public key, exposing only
`combined = Poseidon(pk.x felts, y parity, msg felts)` as public input —
the shape the claim-deposit op pins.

Reference role: `Secp256K1SignatureCircuit`
(city_common_circuit/src/crypto/secp256k1/signature_circuit.rs:40-60 —
built in the ecc config then minified twice to the standard shape; here the
ECDSA circuit already lives in the standard config, and an optional
minifier chain normalizes the proof for recursion).
"""

from __future__ import annotations

import dataclasses

from ..crypto import secp256k1 as secp
from ..snark.circuit import CircuitBuilder, CircuitData
from ..snark.config import CircuitConfig
from ..snark.minifier import MinifierChain
from ..snark import prover as snark_prover
from ..snark.prover import Proof
from ..snark.secp_gadgets import SecpGadget
from ..snark.gadgets import split_le_16


def combined_hash_gadget(b: CircuitBuilder, g: SecpGadget, pk_point,
                         msg_biguint) -> list:
    """In-circuit twin of crypto.secp256k1.combined_action_hash."""
    x_felts = g.big.pack_felts(pk_point.x, 48)
    # y parity: y_limb0 = 2*half + bit
    half = b.add_virtual_target()
    bit = b.add_virtual_target()
    y0 = pk_point.y.limbs[0]

    def gen(pw, _y0=y0, _h=half, _b=bit):
        v = pw.get(_y0)
        if v is None:
            return
        pw.set(_b, v & 1)
        pw.set(_h, v >> 1)

    b.add_generator(gen, deps=[y0])
    b.assert_zero(b.mul(bit, b.add_const(bit, (1 << 64) - (1 << 32))))
    b.range_check(half, 15)
    b.connect(b.arithmetic(2, 1, half, b.one(), bit), y0)
    msg_felts = g.big.pack_felts(msg_biguint, 48)
    return b.hash_n_to_hash_no_pad(x_felts + [bit] + msg_felts)


@dataclasses.dataclass
class Secp256K1SignatureCircuit:
    """ECDSA verify in-circuit; public inputs = combined hash (4 felts)."""
    data: CircuitData
    targets: dict

    @classmethod
    def build(cls, config: CircuitConfig) -> "Secp256K1SignatureCircuit":
        b = CircuitBuilder(config)
        g = SecpGadget(b)
        pk = g.add_virtual_point()
        msg = g.big.add_virtual_biguint(16)
        r = g.big.add_virtual_biguint(16)
        s = g.big.add_virtual_biguint(16)
        g.ecdsa_verify(pk, msg, r, s)
        combined = combined_hash_gadget(b, g, pk, msg)
        b.register_public_inputs(combined)
        data = b.build()
        return cls(data=data,
                   targets={"g": g, "pk": pk, "msg": msg, "r": r, "s": s})

    def fill_witness(self, pw, pk: secp.ECDSAPublicKey, msg_hash: int,
                     sig: secp.ECDSASignature):
        t = self.targets
        g: SecpGadget = t["g"]
        g.set_point(pw, t["pk"], pk.point)
        g.big.set_biguint(pw, t["msg"], msg_hash % (1 << 256))
        g.big.set_biguint(pw, t["r"], sig.r)
        g.big.set_biguint(pw, t["s"], sig.s)

    def prove(self, pk: secp.ECDSAPublicKey, msg_hash: int,
              sig: secp.ECDSASignature) -> Proof:
        pw = self.data._builder.partial_witness()
        self.fill_witness(pw, pk, msg_hash, sig)
        return snark_prover.prove(self.data, pw)


@dataclasses.dataclass
class Secp256K1ProverChain:
    """Signature circuit + minifier chain to the standard recursion shape
    (the reference minifies the ecc-config proof twice,
    signature_circuit.rs:40-60)."""
    circuit: Secp256K1SignatureCircuit
    chain: MinifierChain

    @classmethod
    def build(cls, config: CircuitConfig, n_minify: int = 1
              ) -> "Secp256K1ProverChain":
        circ = Secp256K1SignatureCircuit.build(config)
        chain = MinifierChain.build(circ.data, n_minify, config)
        return cls(circuit=circ, chain=chain)

    @property
    def data(self) -> CircuitData:
        return self.chain.data

    def prove(self, pk, msg_hash, sig) -> Proof:
        return self.chain.prove(self.circuit.prove(pk, msg_hash, sig))
