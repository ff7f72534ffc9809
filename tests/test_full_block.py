"""End-to-end in-memory block pipeline: orchestrator plans a block of mixed
ops, workers drain the job DAG proving every node with the real SNARK
prover, the orchestrator finalizes against the city-root transition.

Reference role: the `full_block.rs` integration harness (SURVEY.md §3.5) —
memory KV store + memory proof store + standard-prover worker loop, no
Redis/Dogecoin.
"""

from city_rollup_tpu.core import poseidon_host
from city_rollup_tpu.rollup import orchestrator as orch_mod
from city_rollup_tpu.rollup.circuits import CircuitToolbox, FAST_TEST_PARAMS
from city_rollup_tpu.rollup.city_store import CityStore
from city_rollup_tpu.rollup.job_id import JobID, JobTopic
from city_rollup_tpu.rollup.proof_store import MemoryProofStore
from city_rollup_tpu.rollup.queues import Q_JOB, Q_NOTIFICATIONS, QueueHub
from city_rollup_tpu.rollup.worker import Worker


def test_full_block_in_memory():
    p = FAST_TEST_PARAMS
    city = CityStore(user_tree_height=p.user_tree_height,
                     deposit_tree_height=p.deposit_tree_height,
                     withdrawal_tree_height=p.withdrawal_tree_height)
    store = MemoryProofStore()
    hub = QueueHub()
    toolbox = CircuitToolbox(p)
    orch = orch_mod.Orchestrator(city, store, hub, params=p)

    # genesis-ish setup at checkpoint 0: two funded users
    wfee = orch.params.withdrawal_fee
    city.register_user(0, 0, (1, 1, 1, 1))
    city.register_user(0, 1, (2, 2, 2, 2))
    city.increment_user_balance(0, 0, 1000)
    city.increment_user_balance(0, 1, wfee)

    reqs = orch_mod.BlockRequests(
        register_users=[orch_mod.RegisterUser(2, (3, 3, 3, 3))],
        token_transfers=[orch_mod.TokenTransfer(0, 1, 250),
                         orch_mod.TokenTransfer(0, 1, 100)],
        add_withdrawals=[orch_mod.AddWithdrawal(1, 0, (9, 9, 9), 50)],
    )
    planned = orch.plan_block(1, reqs)
    assert planned.start_city_root != planned.end_city_root
    orch.enqueue(planned)

    # state applied correctly (withdrawal debits value + protocol fee)
    assert city.get_user_state(0, 1)[0] == 1000 - 250 - 100
    assert city.get_user_state(1, 1)[0] == wfee + 250 + 100 - (50 + wfee)

    # one worker drains the whole DAG
    worker = Worker(toolbox, store, hub)
    processed = 0
    while worker.process_next_job():
        processed += 1
        assert processed < 200, "DAG did not converge"
    assert processed == planned.num_jobs

    # completion notification arrived
    note = hub.receive(Q_NOTIFICATIONS)
    assert note is not None
    assert JobID.from_bytes(note[1]).topic == \
        JobTopic.NOTIFY_ORCHESTRATOR_COMPLETE

    # finalize: the block state-transition proof checks out
    assert orch.finalize(planned, toolbox)
    assert len(worker.benchmarks) == planned.num_jobs

    # second block on top (checkpoint chaining)
    reqs2 = orch_mod.BlockRequests(
        token_transfers=[orch_mod.TokenTransfer(1, 0, 10)])
    planned2 = orch.plan_block(2, reqs2)
    assert planned2.start_city_root == planned.end_city_root
    orch.enqueue(planned2)
    while worker.process_next_job():
        pass
    assert orch.finalize(planned2, toolbox)
