"""Rollup control-plane tests: KVQ fuzzy reads, versioned Merkle trees with
delta proofs, CityStore ops, job IDs, tree planner, proof-store DAG, queues."""

import pytest

from city_rollup_tpu.rollup import (city_store, job_id, kvq, merkle_model,
                                    proof_store, queues, tree_planner)


# -- kvq ----------------------------------------------------------------------

def test_kvq_sqlite_backend(tmp_path):
    """Persistent KVQ (redb-equivalent): same get_leq semantics, state
    survives reopening the database file (round-4, SURVEY.md §2.1 row 9)."""
    path = str(tmp_path / "kv.sqlite")
    s = kvq.KVQSqliteStore(path)
    s.set(b"aa\x00\x01", b"v1")
    s.set(b"aa\x00\x05", b"v5")
    s.set(b"ab\x00\x03", b"w3")
    assert s.get(b"aa\x00\x05") == b"v5"
    assert s.get_leq(b"aa\x00\x04", 2) == b"v1"
    assert s.get_leq(b"aa\x00\x09", 2) == b"v5"
    assert s.get_leq(b"ab\x00\x02", 2) is None
    assert s.delete(b"aa\x00\x01") and not s.delete(b"aa\x00\x01")
    s.close()
    # durability: reopen and read back
    s2 = kvq.KVQSqliteStore(path)
    assert s2.get_leq(b"aa\x00\x09", 2) == b"v5"
    # the versioned Merkle tree runs unchanged over the sqlite backend
    t = merkle_model.VersionedMerkleTree(s2, 1, height=4)
    t.set_leaf(3, (7, 7, 7, 7), checkpoint=1)
    pr = t.prove(3, 1)
    assert pr.verify()
    s2.close()


def test_kvq_get_leq_versioning():
    s = kvq.KVQMemoryStore()
    key = lambda node, cp: bytes([node]) + cp.to_bytes(8, "big")
    s.set(key(1, 5), b"v5")
    s.set(key(1, 9), b"v9")
    s.set(key(2, 3), b"other")
    assert s.get_leq(key(1, 5), 8) == b"v5"
    assert s.get_leq(key(1, 7), 8) == b"v5"
    assert s.get_leq(key(1, 9), 8) == b"v9"
    assert s.get_leq(key(1, 100), 8) == b"v9"
    assert s.get_leq(key(1, 4), 8) is None          # nothing at or before 4
    assert s.get_leq(key(3, 50), 8) is None         # prefix mismatch guard


# -- versioned merkle tree -----------------------------------------------------

def test_versioned_tree_delta_proofs_and_checkpoints():
    t = merkle_model.VersionedMerkleTree(kvq.KVQMemoryStore(), 1, height=8)
    zh_root = t.get_root(0)
    d1 = t.set_leaf(3, (10, 20, 30, 40), checkpoint=1)
    assert d1.old_root == zh_root
    assert d1.verify()
    d2 = t.set_leaf(200, (1, 2, 3, 4), checkpoint=2)
    assert d2.old_root == d1.new_root
    assert d2.verify()
    # historical reads
    assert t.get_root(1) == d1.new_root
    assert t.get_root(2) == d2.new_root
    assert t.get_leaf(3, 1) == (10, 20, 30, 40)
    assert t.get_leaf(200, 1) == merkle_model.ZERO
    # membership proof at old checkpoint verifies against old root
    p = t.prove(3, 1)
    assert p.root == d1.new_root and p.verify()


def test_zero_hash_ladder_against_manual():
    from city_rollup_tpu.core import poseidon_host
    zh = merkle_model.zero_hashes(3)
    manual = [0, 0, 0, 0]
    for _ in range(3):
        manual = poseidon_host.two_to_one(manual, manual)
    assert zh[0] == tuple(manual)


# -- city store -----------------------------------------------------------------

def test_city_store_user_lifecycle():
    cs = city_store.CityStore()
    root0 = cs.get_city_root(0)
    pk = (11, 22, 33, 44)
    d = cs.register_user(1, user_id=7, public_key=pk)
    assert d.verify()
    assert cs.get_user_state(7, 1)[2] == pk
    cs.increment_user_balance(1, 7, 1000)
    assert cs.get_user_state(7, 1)[0] == 1000
    d2 = cs.decrement_user_balance(1, 7, 400, new_nonce=5)
    assert d2.verify()
    bal, nonce, _ = cs.get_user_state(7, 1)
    assert (bal, nonce) == (600, 5)
    with pytest.raises(AssertionError):
        cs.decrement_user_balance(1, 7, 10_000)
    assert cs.get_city_root(1) != root0
    assert cs.get_city_root(0) == root0          # history intact


def test_city_store_deposit_withdrawal():
    cs = city_store.CityStore()
    pk9 = tuple(range(1, 10))
    d = cs.add_deposit(1, 0, (1, 2, 3, 4), pk9, 5000)
    assert d.verify()
    c = cs.mark_deposit_as_claimed(1, 0)
    assert c.old_value == city_store.hash_deposit((1, 2, 3, 4), pk9, 5000)
    w = cs.add_withdrawal(1, 0, (9, 9, 9), 250)
    assert w.verify()
    assert cs.mark_withdrawal_as_completed(1, 0).verify()


# -- job ids ----------------------------------------------------------------------

def test_job_id_roundtrip_and_tree_parent():
    j = job_id.JobID(topic=job_id.JobTopic.GENERATE_STANDARD_PROOF,
                     goal_id=42, circuit_type=job_id.CircuitType.OP_L2_TRANSFER,
                     group_id=1, sub_group_id=0, task_index=9)
    assert job_id.JobID.from_bytes(j.to_bytes()) == j
    assert len(j.to_bytes()) == 24
    p = j.tree_parent()
    assert p.circuit_type == job_id.CircuitType.AGG_L2_TRANSFER
    assert (p.sub_group_id, p.task_index) == (1, 4)
    pp = p.tree_parent()
    assert pp.circuit_type == job_id.CircuitType.AGG_L2_TRANSFER
    assert (pp.sub_group_id, pp.task_index) == (2, 2)
    assert j.counter_id().data_type == job_id.JobDataType.COUNTER


def test_worker_mode_filter():
    g16 = job_id.JobID(job_id.JobTopic.GENERATE_GROTH16_PROOF, 1,
                       job_id.CircuitType.WRAP_FINAL_SIGHASH_PROOF_BLS12381)
    std = job_id.JobID(job_id.JobTopic.GENERATE_STANDARD_PROOF, 1,
                       job_id.CircuitType.OP_L2_TRANSFER)
    assert job_id.WorkerMode.ALL.accepts(g16)
    assert not job_id.WorkerMode.NO_GROTH16.accepts(g16)
    assert job_id.WorkerMode.NO_GROTH16.accepts(std)
    assert not job_id.WorkerMode.ONLY_GROTH16.accepts(std)


# -- tree planner -------------------------------------------------------------------

@pytest.mark.parametrize("n,heights", [(1, 0), (2, 1), (3, 2), (8, 3),
                                       (9, 4), (64, 6)])
def test_tree_planner_heights(n, heights):
    assert tree_planner.tree_height(n) == heights


def test_tree_planner_odd_carry():
    levels = tree_planner.plan_binary_tree(5)
    # level1: (0,1),(2,3),(4,None); level2: (0,1),(2,None); level3: (0,1)
    assert [len(l) for l in levels] == [3, 2, 1]
    assert levels[0][2].right is None
    assert levels[1][1].right is None


# -- proof store DAG ------------------------------------------------------------------

def test_counter_dag_releases_next_jobs():
    ps = proof_store.MemoryProofStore()
    mk = lambda i: job_id.JobID(job_id.JobTopic.GENERATE_STANDARD_PROOF, 1,
                                job_id.CircuitType.OP_L2_TRANSFER,
                                group_id=3, task_index=i)
    leaves = [mk(i) for i in range(4)]
    parent = [leaves[0].tree_parent()]
    ps.write_next_jobs(leaves, parent)
    released = []
    for j in leaves:
        released += ps.on_job_complete(j)
    assert released == parent


def test_multidimensional_jobs_chain_levels():
    ps = proof_store.MemoryProofStore()
    def mk(level, i):
        return job_id.JobID(job_id.JobTopic.GENERATE_STANDARD_PROOF, 1,
                            job_id.CircuitType.AGG_L2_TRANSFER,
                            group_id=1, sub_group_id=level, task_index=i)
    l1 = [mk(1, i) for i in range(2)]
    l2 = [mk(2, 0)]
    done = [job_id.JobID(job_id.JobTopic.NOTIFY_ORCHESTRATOR_COMPLETE, 1,
                         job_id.CircuitType.UNKNOWN)]
    ps.write_multidimensional_jobs([l1, l2], done)
    assert ps.on_job_complete(l1[0]) == []
    assert ps.on_job_complete(l1[1]) == l2
    assert ps.on_job_complete(l2[0]) == done


def test_proof_store_idempotent_and_dump_restore():
    ps = proof_store.MemoryProofStore()
    j = job_id.JobID(job_id.JobTopic.GENERATE_STANDARD_PROOF, 1,
                     job_id.CircuitType.OP_REGISTER_USER)
    ps.set_bytes(j, b"first")
    ps.set_bytes(j, b"second")           # hset_nx: first write wins
    assert ps.get_bytes(j) == b"first"
    ps.write_next_jobs([j], [])
    dump = ps.dump()
    ps2 = proof_store.MemoryProofStore.restore(dump)
    assert ps2.get_bytes(j) == b"first"
    assert ps2.get_goal(j.counter_id()) == 1


# -- queues ---------------------------------------------------------------------------

def test_queue_visibility_timeout_redelivery():
    q = queues.MemoryQueue(visibility_timeout_s=0.0)
    q.send(b"job1")
    mid, msg = q.receive()
    assert msg == b"job1"
    import time as _t
    _t.sleep(0.01)
    mid2, msg2 = q.receive()             # expired -> redelivered
    assert msg2 == b"job1"
    assert q.ack(mid2)
    assert q.receive() is None


def test_queue_hub_topics():
    hub = queues.QueueHub()
    hub.dispatch(queues.Q_JOB, b"a")
    hub.dispatch(queues.Q_CMD, b"b")
    assert hub.receive(queues.Q_JOB)[1] == b"a"
    assert hub.receive(queues.Q_CMD)[1] == b"b"
    assert hub.receive(queues.Q_NOTIFICATIONS) is None
