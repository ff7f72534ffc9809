"""Orchestrator: block production — apply requested ops to the CityStore,
emit per-op witnesses, plan the aggregation-tree job DAG, enqueue the leaves,
await completion, finalize.

Reference role: city_rollup_core_orchestrator (SURVEY.md §3.2/§3.3) —
CityOrchestratorBlockPlanner::process_requests + plan_jobs. Transitions are
claims over the CITY root (H(H(user,withdrawal),deposit)); deposit/withdrawal
ops additionally accumulate event hashes, exactly like the reference's
`_track_events` aggregators.
"""

from __future__ import annotations

import dataclasses

from .circuits import encode_witness
from .city_store import CityStore
from .job_id import CircuitType, JobDataType, JobID, JobTopic
from .proof_store import QProofStore
from .queues import Q_JOB, QueueHub
from .treeprover import (AggStateTransition, ZERO, generate_tree_inputs)

Digest = tuple[int, int, int, int]


# -- request types (the RPC ingress payloads, SURVEY.md §2.1 row 15) -----------

@dataclasses.dataclass
class RegisterUser:
    user_id: int
    public_key: Digest


@dataclasses.dataclass
class ClaimDeposit:
    user_id: int
    deposit_id: int
    value: int
    fee: int = 0


@dataclasses.dataclass
class TokenTransfer:
    from_user: int
    to_user: int
    value: int


@dataclasses.dataclass
class AddWithdrawal:
    user_id: int
    withdrawal_id: int
    address: Digest
    value: int
    fee: int = 0


@dataclasses.dataclass
class ProcessWithdrawal:
    withdrawal_id: int


@dataclasses.dataclass
class AddDeposit:
    deposit_id: int
    txid224: Digest
    public_key: Digest
    value: int


@dataclasses.dataclass
class BlockRequests:
    register_users: list = dataclasses.field(default_factory=list)
    claim_deposits: list = dataclasses.field(default_factory=list)
    token_transfers: list = dataclasses.field(default_factory=list)
    add_withdrawals: list = dataclasses.field(default_factory=list)
    process_withdrawals: list = dataclasses.field(default_factory=list)
    add_deposits: list = dataclasses.field(default_factory=list)


OP_ORDER = [CircuitType.OP_REGISTER_USER, CircuitType.OP_CLAIM_L1_DEPOSIT,
            CircuitType.OP_L2_TRANSFER, CircuitType.OP_ADD_L1_WITHDRAWAL,
            CircuitType.OP_PROCESS_L1_WITHDRAWAL,
            CircuitType.OP_ADD_L1_DEPOSIT]

OP_TO_DUMMY = {
    CircuitType.OP_REGISTER_USER: CircuitType.DUMMY_REGISTER_USER,
    CircuitType.OP_CLAIM_L1_DEPOSIT: CircuitType.DUMMY_CLAIM_L1_DEPOSIT,
    CircuitType.OP_L2_TRANSFER: CircuitType.DUMMY_L2_TRANSFER,
    CircuitType.OP_ADD_L1_WITHDRAWAL: CircuitType.DUMMY_ADD_L1_WITHDRAWAL,
    CircuitType.OP_PROCESS_L1_WITHDRAWAL:
        CircuitType.DUMMY_PROCESS_L1_WITHDRAWAL,
    CircuitType.OP_ADD_L1_DEPOSIT: CircuitType.DUMMY_ADD_L1_DEPOSIT,
}


def _t_dict(t: AggStateTransition) -> dict:
    return {"start": list(t.start), "end": list(t.end),
            "events": list(t.events)}


@dataclasses.dataclass
class PlannedBlock:
    checkpoint_id: int
    start_root: Digest
    end_root: Digest
    leaf_jobs: list
    final_job: JobID
    notify_job: JobID
    num_jobs: int


class Orchestrator:
    def __init__(self, city: CityStore, store: QProofStore, hub: QueueHub):
        self.city = city
        self.store = store
        self.hub = hub

    # -- op processor (op_processor.rs twin) -----------------------------------
    def _apply_op(self, cp: int, ct: CircuitType, req):
        """Mutate the CityStore; return (fields witness, event digest)."""
        c = self.city
        if ct == CircuitType.OP_REGISTER_USER:
            c.register_user(cp, req.user_id, req.public_key)
            return {}, ZERO
        if ct == CircuitType.OP_CLAIM_L1_DEPOSIT:
            bal, _, _ = c.get_user_state(req.user_id, cp)
            c.mark_deposit_as_claimed(cp, req.deposit_id)
            c.increment_user_balance(cp, req.user_id, req.value - req.fee)
            return {"bal": bal, "value": req.value, "fee": req.fee}, ZERO
        if ct == CircuitType.OP_L2_TRANSFER:
            sb, nonce, _ = c.get_user_state(req.from_user, cp)
            rb, _, _ = c.get_user_state(req.to_user, cp)
            c.decrement_user_balance(cp, req.from_user, req.value,
                                     new_nonce=nonce + 1)
            c.increment_user_balance(cp, req.to_user, req.value)
            return {"sender_bal": sb, "recv_bal": rb, "amount": req.value,
                    "nonce": nonce}, ZERO
        if ct == CircuitType.OP_ADD_L1_WITHDRAWAL:
            bal, _, _ = c.get_user_state(req.user_id, cp)
            d = c.add_withdrawal(cp, req.withdrawal_id, req.address,
                                 req.value)
            c.decrement_user_balance(cp, req.user_id, req.value + req.fee)
            return ({"bal": bal, "value": req.value, "fee": req.fee},
                    d.new_value)
        if ct == CircuitType.OP_PROCESS_L1_WITHDRAWAL:
            d = c.mark_withdrawal_as_completed(cp, req.withdrawal_id)
            return {}, d.old_value          # event: the withdrawal leaf
        if ct == CircuitType.OP_ADD_L1_DEPOSIT:
            d = c.add_deposit(cp, req.deposit_id, req.txid224,
                              req.public_key, req.value)
            return {}, d.new_value          # event: the deposit leaf
        raise ValueError(ct)

    # -- block planner (planner.rs + job_planner.rs twin) -----------------------
    def plan_block(self, checkpoint_id: int,
                   requests: BlockRequests) -> PlannedBlock:
        cp = checkpoint_id
        start_root = self.city.get_city_root(cp)
        reqs_by_type = {
            CircuitType.OP_REGISTER_USER: requests.register_users,
            CircuitType.OP_CLAIM_L1_DEPOSIT: requests.claim_deposits,
            CircuitType.OP_L2_TRANSFER: requests.token_transfers,
            CircuitType.OP_ADD_L1_WITHDRAWAL: requests.add_withdrawals,
            CircuitType.OP_PROCESS_L1_WITHDRAWAL:
                requests.process_withdrawals,
            CircuitType.OP_ADD_L1_DEPOSIT: requests.add_deposits,
        }

        leaf_jobs_all: list[JobID] = []
        root_jobs: list[JobID] = []
        root_transitions: list[AggStateTransition] = []
        num_jobs = 0

        for group, ct in enumerate(OP_ORDER):
            reqs = reqs_by_type[ct]
            leaves: list[AggStateTransition] = []
            leaf_jobs: list[JobID] = []
            if reqs:
                for i, req in enumerate(reqs):
                    before = self.city.get_city_root(cp)
                    fields, event = self._apply_op(cp, ct, req)
                    after = self.city.get_city_root(cp)
                    t = AggStateTransition(before, after, event)
                    leaves.append(t)
                    job = JobID(JobTopic.GENERATE_STANDARD_PROOF, cp,
                                int(ct), group_id=group, sub_group_id=0,
                                task_index=i)
                    self.store.set_bytes(job.input_witness_id(),
                                         encode_witness({
                                             "transition": _t_dict(t),
                                             "fields": fields}))
                    leaf_jobs.append(job)
            else:
                root = self.city.get_city_root(cp)
                t = AggStateTransition(root, root, ZERO)
                leaves.append(t)
                job = JobID(JobTopic.GENERATE_STANDARD_PROOF, cp,
                            int(OP_TO_DUMMY[ct]), group_id=group,
                            sub_group_id=0, task_index=0)
                self.store.set_bytes(job.input_witness_id(),
                                     encode_witness({
                                         "transition": _t_dict(t),
                                         "fields": {}}))
                leaf_jobs.append(job)

            # per-type binary aggregation tree
            levels_inputs = generate_tree_inputs(leaves)
            levels_jobs: list[list[JobID]] = [leaf_jobs]
            prev_jobs = leaf_jobs
            agg_ct = (leaf_jobs[0].tree_parent().circuit_type
                      if len(leaves) > 1 else None)
            for lvl, inputs in enumerate(levels_inputs, start=1):
                jobs = []
                for inp in inputs:
                    job = JobID(JobTopic.GENERATE_STANDARD_PROOF, cp,
                                int(agg_ct), group_id=group,
                                sub_group_id=lvl, task_index=inp.index)
                    children = [prev_jobs[inp.index * 2].hex()]
                    child_ts = [_t_dict(inp.left)]
                    if inp.right is not None:
                        children.append(prev_jobs[inp.index * 2 + 1].hex())
                        child_ts.append(_t_dict(inp.right))
                    self.store.set_bytes(job.input_witness_id(),
                                         encode_witness({
                                             "transition":
                                                 _t_dict(inp.condense()),
                                             "children": children,
                                             "child_transitions": child_ts}))
                    jobs.append(job)
                levels_jobs.append(jobs)
                prev_jobs = jobs
            # chain levels: completing all of level i releases level i+1;
            # the root level's counter releases nothing (cross-type joins
            # below release part1/part2)
            self.store.write_multidimensional_jobs(levels_jobs, [])
            root_jobs.append(prev_jobs[0])
            # condensed per-type root transition
            cur = leaves
            for inputs in levels_inputs:
                cur = [inp.condense() for inp in inputs]
            root_transitions.append(cur[0])
            leaf_jobs_all.extend(leaf_jobs)
            num_jobs += sum(len(l) for l in levels_jobs)

        # block aggregation: part1 (types 0..2), part2 (types 3..5), final
        def _chain(ts):
            t = ts[0]
            for nxt in ts[1:]:
                assert t.end == nxt.start
                from .treeprover import combine_events
                t = AggStateTransition(t.start, nxt.end,
                                       combine_events(t.events, nxt.events))
            return t

        part1_t = _chain(root_transitions[:3])
        part2_t = _chain(root_transitions[3:])
        final_t = _chain([part1_t, part2_t])
        part1 = JobID(JobTopic.GENERATE_STANDARD_PROOF, cp,
                      int(CircuitType.BLOCK_AGG_STATE_PART_1), group_id=100)
        part2 = JobID(JobTopic.GENERATE_STANDARD_PROOF, cp,
                      int(CircuitType.BLOCK_AGG_STATE_PART_2), group_id=101)
        final = JobID(JobTopic.GENERATE_STANDARD_PROOF, cp,
                      int(CircuitType.BLOCK_STATE_TRANSITION), group_id=102)
        notify = JobID(JobTopic.NOTIFY_ORCHESTRATOR_COMPLETE, cp,
                       int(CircuitType.UNKNOWN), group_id=103)

        for part_job, part_t, roots, rts in (
                (part1, part1_t, root_jobs[:3], root_transitions[:3]),
                (part2, part2_t, root_jobs[3:], root_transitions[3:])):
            self.store.set_bytes(part_job.input_witness_id(), encode_witness({
                "transition": _t_dict(part_t),
                "children": [j.hex() for j in roots],
                "child_transitions": [_t_dict(t) for t in rts]}))
            self.store.write_next_jobs(roots, [part_job],
                                       counter_id=part_job.counter_id())
        self.store.set_bytes(final.input_witness_id(), encode_witness({
            "transition": _t_dict(final_t),
            "children": [part1.hex(), part2.hex()],
            "child_transitions": [_t_dict(part1_t), _t_dict(part2_t)]}))
        self.store.write_next_jobs([part1, part2], [final],
                                   counter_id=final.counter_id())
        self.store.write_next_jobs([final], [notify],
                                   counter_id=notify.counter_id())
        num_jobs += 3

        end_root = self.city.get_city_root(cp)
        assert final_t.start == start_root and final_t.end == end_root
        return PlannedBlock(checkpoint_id=cp, start_root=start_root,
                            end_root=end_root, leaf_jobs=leaf_jobs_all,
                            final_job=final, notify_job=notify,
                            num_jobs=num_jobs)

    def enqueue(self, planned: PlannedBlock):
        for job in planned.leaf_jobs:
            self.hub.dispatch(Q_JOB, job.to_bytes())

    # -- finalize ------------------------------------------------------------------
    def finalize(self, planned: PlannedBlock, toolbox) -> bool:
        """Verify the block's final state-transition proof against the
        claimed city-root move (step_2 twin, without the L1 transaction)."""
        from .circuits import decode_proof
        from ..core import poseidon_host
        raw = self.store.get_proof(planned.final_job.output_proof_id())
        if raw is None:
            return False
        proof = decode_proof(raw)
        expected = poseidon_host.two_to_one(list(planned.start_root),
                                            list(planned.end_root))
        if proof.public_inputs != [int(x) for x in expected]:
            return False
        return toolbox.verify(planned.final_job.circuit_type, proof)
