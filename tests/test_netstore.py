"""Networked proof store + queues (rollup/netstore.py).

Reference semantics under test: city_redis_store hset_nx/hincr atomicity,
RSMQ visibility-timeout redelivery, and the reference's scale story —
N worker OS processes draining one shared DAG (SURVEY.md §2.9, §2.11).
"""

import os
import subprocess
import sys
import threading
import time

import pytest

from city_rollup_tpu.rollup.job_id import CircuitType, JobID, JobTopic
from city_rollup_tpu.rollup.netstore import (NetProofStore, NetQueueHub,
                                             StoreServer)

J = lambda i: JobID(JobTopic.GENERATE_STANDARD_PROOF, 1,
                    int(CircuitType.OP_L2_TRANSFER), task_index=i)


@pytest.fixture()
def server():
    srv = StoreServer(visibility_timeout_s=1.0)
    srv.start_background()
    yield srv
    srv.shutdown()


def test_netstore_kv_idempotent(server):
    s = NetProofStore(server.host, server.port)
    assert s.get_bytes(J(0)) is None
    s.set_bytes(J(0), b"first")
    s.set_bytes(J(0), b"second")            # hset_nx: first write wins
    assert s.get_bytes(J(0)) == b"first"


def test_netstore_counter_dag(server):
    s = NetProofStore(server.host, server.port)
    jobs = [J(1), J(2)]
    nxt = [J(9)]
    s.write_next_jobs(jobs, nxt)
    released = s.on_job_complete(jobs[0])
    assert released == []
    released = s.on_job_complete(jobs[1])
    assert [j.hex() for j in released] == [J(9).hex()]


def test_netstore_counter_atomic_across_clients(server):
    """Concurrent increments from many client connections must count
    exactly once each (the hincr contract)."""
    s0 = NetProofStore(server.host, server.port)
    s0.write_next_jobs([J(i) for i in range(32)], [J(99)])
    counter = J(0).counter_id()
    results = []

    def bump():
        s = NetProofStore(server.host, server.port)
        results.append(s.inc_counter(counter))

    threads = [threading.Thread(target=bump) for _ in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == list(range(1, 33))


def test_netqueue_visibility_redelivery(server):
    """A popped-but-unacked message (crashed worker) reappears after the
    visibility window (at-least-once redelivery)."""
    hub = NetQueueHub(server.host, server.port)
    hub.dispatch("q_job", b"payload")
    got = hub.receive("q_job")
    assert got is not None and got[1] == b"payload"
    assert hub.receive("q_job") is None          # hidden while in flight
    time.sleep(1.2)                              # vt = 1 s
    again = hub.receive("q_job")
    assert again is not None and again[1] == b"payload"
    assert hub.ack("q_job", again[0])
    time.sleep(1.2)
    assert hub.receive("q_job") is None          # acked: gone for good


@pytest.mark.slow
def test_two_worker_processes_drain_one_block():
    """The fleet: orchestrator plans a block against the shared netstore,
    TWO worker OS processes drain the DAG concurrently, counters release
    exactly once, the block finalizes (reference full_block_redis shape)."""
    from city_rollup_tpu.rollup import orchestrator as orch_mod
    from city_rollup_tpu.rollup.circuits import (CircuitToolbox,
                                                 FAST_TEST_PARAMS)
    from city_rollup_tpu.rollup.city_store import CityStore
    from city_rollup_tpu.rollup.queues import Q_NOTIFICATIONS

    srv = StoreServer()
    srv.start_background()
    try:
        p = FAST_TEST_PARAMS
        city = CityStore(user_tree_height=p.user_tree_height,
                         deposit_tree_height=p.deposit_tree_height,
                         withdrawal_tree_height=p.withdrawal_tree_height)
        store = NetProofStore(srv.host, srv.port)
        hub = NetQueueHub(srv.host, srv.port)
        orch = orch_mod.Orchestrator(city, store, hub, params=p)
        city.register_user(0, 0, (1, 1, 1, 1))
        city.register_user(0, 1, (2, 2, 2, 2))
        city.increment_user_balance(0, 0, 1000)
        reqs = orch_mod.BlockRequests(
            register_users=[orch_mod.RegisterUser(2, (3, 3, 3, 3))],
            token_transfers=[orch_mod.TokenTransfer(0, 1, 250),
                             orch_mod.TokenTransfer(0, 1, 100)])
        planned = orch.plan_block(1, reqs)
        orch.enqueue(planned)

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs = [subprocess.Popen(
            [sys.executable, "-m", "city_rollup_tpu.cli", "l2-worker",
             "--store", f"{srv.host}:{srv.port}", "--fast",
             "--max-idle", "20"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(__file__)))
            for _ in range(2)]
        outs = []
        for pr in procs:
            out, _ = pr.communicate(timeout=3000)
            outs.append(out)
            assert pr.returncode == 0, out[-2000:]

        # both workers really proved jobs (work was shared)
        import json as _json
        per_worker = []
        for out in outs:
            done = [l for l in out.splitlines() if '"processed"' in l]
            per_worker.append(len(done))
        assert sum(per_worker) == planned.num_jobs, (per_worker, outs[0][-500:])
        assert all(n > 0 for n in per_worker), per_worker

        note = hub.receive(Q_NOTIFICATIONS)
        assert note is not None
        toolbox = CircuitToolbox(p)
        assert orch.finalize(planned, toolbox)
    finally:
        srv.shutdown()
