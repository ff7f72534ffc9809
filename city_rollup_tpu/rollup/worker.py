"""Worker actor: pop job -> prove -> store proof -> bump counters -> release
dependents. Leaderless and idempotent; any number of workers can run against
the same proof store + queues.

Reference role: city_rollup_core_worker SimpleActorWorker::process_next_job
(SURVEY.md §3.1 hot path; §2.1 row 12), including per-job wall-clock
benchmarks (QWorkerJobBenchmark twin) and worker-mode filtering.
"""

from __future__ import annotations

import dataclasses
import time

from .circuits import (CircuitToolbox, decode_proof, decode_witness,
                       encode_proof)
from .job_id import JobID, JobTopic, WorkerMode
from .proof_store import QProofStore
from .queues import Q_JOB, Q_NOTIFICATIONS, QueueHub
from .treeprover import AggStateTransition


@dataclasses.dataclass
class JobBenchmark:
    job_id: str
    duration_ms: float


def _transition_from(d: dict) -> AggStateTransition:
    return AggStateTransition(start=tuple(d["start"]), end=tuple(d["end"]),
                              events=tuple(d.get("events", (0, 0, 0, 0))))


class Worker:
    def __init__(self, toolbox: CircuitToolbox, store: QProofStore,
                 hub: QueueHub, mode: WorkerMode = WorkerMode.ALL):
        self.toolbox = toolbox
        self.store = store
        self.hub = hub
        self.mode = mode
        self.benchmarks: list[JobBenchmark] = []

    # -- event loop ------------------------------------------------------------
    def process_next_job(self) -> bool:
        """Returns True if a job was processed."""
        got = self.hub.receive(Q_JOB)
        if got is None:
            return False
        mid, msg = got
        job = JobID.from_bytes(msg)
        if not self.mode.accepts(job):
            # not ours: put it back for a specialized worker
            self.hub.ack(Q_JOB, mid)
            self.hub.dispatch(Q_JOB, msg)
            return False
        t0 = time.perf_counter()
        self.process_job(job)
        self.benchmarks.append(JobBenchmark(
            job_id=job.hex(),
            duration_ms=(time.perf_counter() - t0) * 1e3))
        self.hub.ack(Q_JOB, mid)
        return True

    def process_job(self, job: JobID):
        proof = self.prove_job(job)
        self.store.set_bytes(job.output_proof_id(), encode_proof(proof))
        for nj in self.store.on_job_complete(job):
            if nj.topic == JobTopic.NOTIFY_ORCHESTRATOR_COMPLETE:
                self.hub.dispatch(Q_NOTIFICATIONS, nj.to_bytes())
            else:
                self.hub.dispatch(Q_JOB, nj.to_bytes())

    # -- proving ------------------------------------------------------------------
    def prove_job(self, job: JobID):
        raw = self.store.get_bytes(job.input_witness_id())
        assert raw is not None, f"missing witness for {job}"
        w = decode_witness(raw)
        transition = _transition_from(w["transition"])

        # aggregation/block nodes: natively verify children before proving the
        # condensed claim (recursive in-circuit verification is the next
        # milestone; the DAG/proof-at-every-node shape matches the reference)
        for child_hex, child_t in zip(w.get("children", []),
                                      w.get("child_transitions", [])):
            child = JobID.from_bytes(bytes.fromhex(child_hex))
            craw = self.store.get_proof(child.output_proof_id())
            assert craw is not None, f"missing child proof {child}"
            cproof = decode_proof(craw)
            ct = _transition_from(child_t)
            expected_pis = [int(x) for x in ct.transition_hash()]
            if cproof.public_inputs != expected_pis:
                raise ValueError(f"child {child} public inputs mismatch")
            if not self.toolbox.verify(child.circuit_type, cproof):
                raise ValueError(f"child proof {child} failed verification")

        return self.toolbox.prove(job.circuit_type, w.get("fields", {}),
                                  transition)
