"""End-to-end in-memory block pipeline: orchestrator plans a block of mixed
ops, workers drain the job DAG proving every node with the real SNARK
prover, the orchestrator finalizes against the city-root transition.

Reference role: the `full_block.rs` integration harness (SURVEY.md §3.5) —
memory KV store + memory proof store + standard-prover worker loop, no
Redis/Dogecoin.
"""

import pytest

from city_rollup_tpu.core import poseidon_host
from city_rollup_tpu.rollup import orchestrator as orch_mod
from city_rollup_tpu.rollup.circuits import (CircuitToolbox,
                                             FAST_TEST_PARAMS, encode_proof)
from city_rollup_tpu.rollup.city_store import CityStore
from city_rollup_tpu.rollup.job_id import JobID, JobTopic
from city_rollup_tpu.rollup.proof_store import MemoryProofStore
from city_rollup_tpu.rollup.queues import Q_JOB, Q_NOTIFICATIONS, QueueHub
from city_rollup_tpu.rollup.worker import Worker


@pytest.mark.slow
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


@pytest.mark.slow
def test_full_block_with_signatures():
    """VERDICT r3 item 2: the proven pipeline with user authorization ON —
    transfer and add_withdrawal ops recursively verify a real zk-signature
    wrapper proof binding (the sender's stored pk, the action hash); a
    proof signed under the WRONG key cannot pass the op circuit."""
    from city_rollup_tpu.rollup.wallet import CityMemoryWallet

    toolbox = CircuitToolbox(FAST_TEST_PARAMS, with_signatures=True)
    p = toolbox.params                      # carries the sig wrapper data
    city = CityStore(user_tree_height=p.user_tree_height,
                     deposit_tree_height=p.deposit_tree_height,
                     withdrawal_tree_height=p.withdrawal_tree_height)
    store = MemoryProofStore()
    hub = QueueHub()
    orch = orch_mod.Orchestrator(city, store, hub, params=p)

    wallet = CityMemoryWallet.new_fast_setup(wrapper=toolbox.zk_wrapper)
    pk0 = wallet.zk.create_zk_private_key()
    wfee = p.withdrawal_fee
    city.register_user(0, 0, pk0)
    city.register_user(0, 1, (2, 2, 2, 2))
    city.increment_user_balance(0, 0, 1_000 + 60 + wfee)

    # sign the transfer: nonce 0 -> action binds new_nonce 1
    action_t = orch_mod.transfer_action_hash(p, 0, 1, 1, 250)
    sig_t = wallet.zk.sign(pk0, action_t)
    # sign the withdrawal: nonce bumps again (1 -> 2)
    addr = (7, 8, 9)
    action_w = orch_mod.withdrawal_action_hash(p, 0, 2, addr, 60)
    sig_w = wallet.zk.sign(pk0, action_w)

    reqs = orch_mod.BlockRequests(
        token_transfers=[orch_mod.TokenTransfer(
            0, 1, 250, signature_proof=encode_proof(sig_t).hex())],
        add_withdrawals=[orch_mod.AddWithdrawal(
            0, 0, addr, 60, signature_proof=encode_proof(sig_w).hex())],
    )
    planned = orch.plan_block(1, reqs)
    orch.enqueue(planned)
    worker = Worker(toolbox, store, hub)
    processed = 0
    while worker.process_next_job():
        processed += 1
        assert processed < 100, "DAG did not converge"
    assert processed == planned.num_jobs
    assert orch.finalize(planned, toolbox)

    # negative: a signature under a DIFFERENT key must be rejected by the
    # transfer op circuit (pk binding to the sender's stored leaf)
    intruder = wallet.zk.create_zk_private_key()
    action_bad = orch_mod.transfer_action_hash(p, 1, 1, 0, 10)
    sig_bad = wallet.zk.sign(intruder, action_bad)   # user 1's leaf != pk
    reqs2 = orch_mod.BlockRequests(
        token_transfers=[orch_mod.TokenTransfer(
            1, 0, 10, signature_proof=encode_proof(sig_bad).hex())])
    planned2 = orch.plan_block(2, reqs2)
    orch.enqueue(planned2)
    with pytest.raises((ValueError, AssertionError)):
        while worker.process_next_job():
            pass


@pytest.mark.slow
def test_full_block_batched_worker():
    """The batched drain path: same block, but the worker groups
    same-circuit ready jobs and proves them with one batched device call
    per group (prove_batch DAG integration)."""
    p = FAST_TEST_PARAMS
    city = CityStore(user_tree_height=p.user_tree_height,
                     deposit_tree_height=p.deposit_tree_height,
                     withdrawal_tree_height=p.withdrawal_tree_height)
    store = MemoryProofStore()
    hub = QueueHub()
    toolbox = CircuitToolbox(p)
    orch = orch_mod.Orchestrator(city, store, hub, params=p)
    city.register_user(0, 0, (1, 1, 1, 1))
    city.register_user(0, 1, (2, 2, 2, 2))
    city.increment_user_balance(0, 0, 1000)
    reqs = orch_mod.BlockRequests(
        token_transfers=[orch_mod.TokenTransfer(0, 1, v)
                         for v in (100, 50, 25, 10)])
    planned = orch.plan_block(1, reqs)
    orch.enqueue(planned)
    worker = Worker(toolbox, store, hub)
    processed = 0
    while True:
        n = worker.process_ready_batch(max_batch=8)
        if n == 0:
            break
        processed += n
        assert processed <= planned.num_jobs
    assert processed == planned.num_jobs
    assert orch.finalize(planned, toolbox)
