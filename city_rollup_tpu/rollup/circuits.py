"""Worker circuit toolbox: build every op/aggregation/dummy circuit once at
startup and dispatch proving jobs by circuit type.

Reference role: city_rollup_circuit/src/worker/toolbox (SURVEY.md §2.10) —
`CRWorkerToolboxCoreCircuits` builds all circuits up front (deriving
fingerprints) and `worker_prove` dispatches on `job_id.circuit_type`.

Round-1 scope (documented, see snark/ docstrings): op circuits prove the op's
balance/nonce arithmetic and expose the state-transition hash as public
inputs; aggregation nodes natively verify child proofs and prove the
condensed transition (the in-circuit recursive verifier is the next
milestone — SURVEY.md §7 hard part (a)). The pipeline shape, job flow, and
proof-at-every-node invariant match the reference.
"""

from __future__ import annotations

import dataclasses
import json

from ..core import fri, poseidon_host
from ..snark import CircuitBuilder, CircuitConfig
from ..snark import prover as snark_prover
from ..snark import verifier as snark_verifier
from .job_id import CircuitType
from .treeprover import AggStateTransition

# proving config for rollup circuits (tests shrink FRI via this knob)
DEFAULT_CONFIG = CircuitConfig()
FAST_TEST_CONFIG = CircuitConfig(
    num_challenges=1,
    fri=fri.FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=4,
                      num_query_rounds=6, final_poly_bits=3))


def transition_pis(t: AggStateTransition) -> list[int]:
    return [int(x) for x in t.transition_hash()]


@dataclasses.dataclass
class BuiltCircuit:
    data: object                 # snark CircuitData
    builder: CircuitBuilder
    targets: dict                # name -> target


def _build_transition_circuit(config: CircuitConfig,
                              op: CircuitType) -> BuiltCircuit:
    """One circuit per op family. All share one shape: 4 public-input felts =
    Poseidon(transition.start, transition.end) (computed by the planner and
    natively re-checked by verifying actors), plus op-specific arithmetic."""
    b = CircuitBuilder(config)
    pis = b.add_virtual_targets(4)
    b.register_public_inputs(pis)
    targets = {"pi": pis}

    if op == CircuitType.OP_L2_TRANSFER:
        sender_bal = b.add_virtual_target()
        recv_bal = b.add_virtual_target()
        amount = b.add_virtual_target()
        nonce = b.add_virtual_target()
        new_sender = b.sub(sender_bal, amount)
        new_recv = b.add(recv_bal, amount)
        new_nonce = b.add_const(nonce, 1)
        targets.update(sender_bal=sender_bal, recv_bal=recv_bal,
                       amount=amount, nonce=nonce, new_sender=new_sender,
                       new_recv=new_recv, new_nonce=new_nonce)
    elif op in (CircuitType.OP_CLAIM_L1_DEPOSIT,
                CircuitType.OP_ADD_L1_WITHDRAWAL):
        bal = b.add_virtual_target()
        value = b.add_virtual_target()
        fee = b.add_virtual_target()
        if op == CircuitType.OP_CLAIM_L1_DEPOSIT:
            # balance += value - fee
            new_bal = b.sub(b.add(bal, value), fee)
        else:
            # balance -= value + fee
            new_bal = b.sub(bal, b.add(value, fee))
        targets.update(bal=bal, value=value, fee=fee, new_bal=new_bal)
    else:
        # register_user / process_withdrawal / add_deposit / aggregators /
        # dummies: pure transition claims (plus PI routing)
        x = b.add_virtual_target()
        targets.update(x=x, xx=b.square(x))

    data = b.build()
    return BuiltCircuit(data=data, builder=b, targets=targets)


OP_TYPES = [CircuitType.OP_REGISTER_USER, CircuitType.OP_CLAIM_L1_DEPOSIT,
            CircuitType.OP_L2_TRANSFER, CircuitType.OP_ADD_L1_WITHDRAWAL,
            CircuitType.OP_PROCESS_L1_WITHDRAWAL,
            CircuitType.OP_ADD_L1_DEPOSIT]
AGG_TYPES_LIST = [CircuitType.AGG_REGISTER_USER,
                  CircuitType.AGG_CLAIM_L1_DEPOSIT,
                  CircuitType.AGG_L2_TRANSFER,
                  CircuitType.AGG_ADD_L1_WITHDRAWAL,
                  CircuitType.AGG_PROCESS_L1_WITHDRAWAL,
                  CircuitType.AGG_ADD_L1_DEPOSIT]
BLOCK_TYPES = [CircuitType.BLOCK_AGG_STATE_PART_1,
               CircuitType.BLOCK_AGG_STATE_PART_2,
               CircuitType.BLOCK_STATE_TRANSITION]


class CircuitToolbox:
    """Builds all circuits once; proves/verifies by circuit type."""

    def __init__(self, config: CircuitConfig | None = None):
        self.config = config or DEFAULT_CONFIG
        self._circuits: dict[int, BuiltCircuit] = {}

    def _get(self, circuit_type: int) -> BuiltCircuit:
        """Lazy build-and-cache (circuit builds cost seconds; the reference
        builds its toolbox eagerly at worker startup — call prewarm() for
        that behavior)."""
        ct = int(circuit_type)
        if CircuitType.DUMMY_REGISTER_USER <= ct <= \
                CircuitType.DUMMY_ADD_L1_DEPOSIT:
            # dummies share their op family's aggregator shape
            ct = int(AGG_TYPES_LIST[ct - int(CircuitType.DUMMY_REGISTER_USER)])
        if ct not in self._circuits:
            self._circuits[ct] = _build_transition_circuit(
                self.config, CircuitType(ct))
        return self._circuits[ct]

    def prewarm(self):
        for ct in OP_TYPES + AGG_TYPES_LIST + BLOCK_TYPES:
            self._get(ct)

    def fingerprint(self, circuit_type: int) -> tuple:
        return self._get(circuit_type).data.verifier.circuit_digest

    def prove(self, circuit_type: int, witness: dict,
              transition: AggStateTransition) -> snark_prover.Proof:
        built = self._get(circuit_type)
        pw = built.builder.partial_witness()
        pi_vals = transition_pis(transition)
        for t, v in zip(built.targets["pi"], pi_vals):
            pw.set(t, v)
        for name, val in witness.items():
            if name in built.targets and name != "pi":
                pw.set(built.targets[name], int(val))
        return snark_prover.prove(built.data, pw)

    def verify(self, circuit_type: int, proof: snark_prover.Proof) -> bool:
        built = self._get(circuit_type)
        return snark_verifier.verify(proof, built.data.common,
                                     built.data.verifier)


# -- proof/witness (de)serialization for the proof store ----------------------

def encode_witness(payload: dict) -> bytes:
    return json.dumps(payload).encode()


def decode_witness(raw: bytes) -> dict:
    return json.loads(raw.decode())


def encode_proof(proof: snark_prover.Proof) -> bytes:
    import pickle
    return pickle.dumps(proof)


def decode_proof(raw: bytes) -> snark_prover.Proof:
    import pickle
    return pickle.loads(raw)
