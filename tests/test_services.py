"""Service layer (L6): tx-ingress node, query API, typed provider, user
prover service, orchestrator loop plumbing.

Reference roles: city_rollup_core_node handler.rs, city_rollup_core_api
lib.rs, city_rollup_rpc_provider lib.rs, city_rollup_user_prover_api
api/mod.rs, orchestrator sync_infinite_loop (SURVEY.md §2.1 rows 15-19,
§3.2/§3.4)."""

import pytest

from city_rollup_tpu.rollup import orchestrator as orch_mod
from city_rollup_tpu.rollup.city_store import CityStore
from city_rollup_tpu.rollup.proof_store import MemoryProofStore
from city_rollup_tpu.rollup.queues import Q_CMD, QueueHub
from city_rollup_tpu.services.api_server import make_api_server
from city_rollup_tpu.services.node import (PRODUCE_BLOCK_CMD,
                                           flush_rpc_requests,
                                           make_node_server)
from city_rollup_tpu.services.provider import CityRpcProvider
from city_rollup_tpu.services.rpc_common import JsonRpcError, rpc_call


@pytest.fixture()
def stack():
    """node + api + provider over an in-memory hub/store/city."""
    city = CityStore()
    city.register_user(0, 0, (1, 1, 1, 1))
    city.increment_user_balance(0, 0, 500)
    store = MemoryProofStore()
    hub = QueueHub()
    api = make_api_server(city, store)
    api.start_background()
    node = make_node_server(hub, api_url=api.url,
                            fleet_verifies_signatures=True)
    node.start_background()
    provider = CityRpcProvider(node_url=node.url)
    yield {"city": city, "store": store, "hub": hub, "api": api,
           "node": node, "provider": provider}
    node.shutdown()
    api.shutdown()


def test_query_api_roundtrips(stack):
    pr = stack["provider"]
    assert pr.ping() == "pong"
    root = pr.get_city_root(0)
    assert len(root) == 4
    assert root == [int(x) for x in stack["city"].get_city_root(0)]
    user = pr.get_user_by_id(0, 0)
    assert user["balance"] == 500 and user["public_key"] == [1, 1, 1, 1]
    mp = pr.get_user_merkle_proof(0, 0)
    assert len(mp["siblings"]) == stack["city"].user_tree.height
    # reads forward through the node endpoint too
    assert rpc_call(stack["node"].url, "cr_getCityRoot", [0]) == root


def test_node_enqueues_and_flush_rebuilds_requests(stack):
    pr = stack["provider"]
    pr.register_user(5, (9, 9, 9, 9))
    pr.token_transfer(0, 5, 123)
    pr.add_withdrawal(0, 0, (1, 2, 3), 77, signature_proof="aa")
    pr.claim_deposit(0, 0, (1, 2, 3, 4), list(range(9)), 1000)
    reqs = flush_rpc_requests(stack["hub"])
    assert reqs.register_users == [orch_mod.RegisterUser(5, (9, 9, 9, 9))]
    assert reqs.token_transfers[0].value == 123
    assert reqs.add_withdrawals[0].signature_proof == "aa"
    assert reqs.claim_deposits[0].public_key == tuple(range(9))
    # queues are drained
    assert flush_rpc_requests(stack["hub"]).token_transfers == []


def test_node_without_sig_fleet_rejects_signature_proofs():
    """A node fronting a no-signature fleet must refuse signature-bearing
    requests instead of silently proving without verification (ADVICE r4)."""
    from city_rollup_tpu.services.rpc_common import JsonRpcError
    hub = QueueHub()
    node = make_node_server(hub)          # fleet_verifies_signatures=False
    node.start_background()
    try:
        pr = CityRpcProvider(node_url=node.url)
        pr.token_transfer(0, 5, 123)      # unsigned: fine
        with pytest.raises(JsonRpcError):
            pr.add_withdrawal(0, 0, (1, 2, 3), 77, signature_proof="aa")
        with pytest.raises(JsonRpcError):
            pr.token_transfer(0, 5, 9, signature_proof="bb")
    finally:
        node.shutdown()


def test_node_validates_shapes(stack):
    pr = stack["provider"]
    with pytest.raises(JsonRpcError):
        pr.register_user(1, (1, 2, 3))           # pk must be 4 felts
    with pytest.raises(JsonRpcError):
        pr.add_withdrawal(0, 0, (1, 2, 3, 4), 5)  # address must be 3 limbs
    with pytest.raises(JsonRpcError):
        rpc_call(stack["node"].url, "cr_noSuchMethodAnywhere")


def test_produce_block_command(stack):
    stack["provider"].produce_block()
    got = stack["hub"].receive(Q_CMD)
    assert got is not None and got[1] == PRODUCE_BLOCK_CMD


def test_proof_store_inspection(stack):
    from city_rollup_tpu.rollup.job_id import CircuitType, JobID, JobTopic
    j = JobID(JobTopic.GENERATE_STANDARD_PROOF, 1,
              int(CircuitType.OP_L2_TRANSFER))
    stack["store"].set_bytes(j.input_witness_id(), b'{"hello": 1}')
    pr = stack["provider"]
    assert rpc_call(stack["api"].url, "cr_getProofStoreJobWitness",
                    [j.hex()]) == '{"hello": 1}'
    assert pr.get_proof_store_value(j.input_witness_id().hex()) == \
        b'{"hello": 1}'.hex()


@pytest.mark.slow
def test_user_prover_service_end_to_end():
    """Prove a zk signature through the service, then verify it."""
    from city_rollup_tpu.rollup.circuits import FAST_TEST_CONFIG, \
        decode_proof
    from city_rollup_tpu.rollup.zk_signature import (
        ZKSignatureWrapperCircuit, derive_public_key)
    from city_rollup_tpu.services.user_prover import make_user_prover_server
    import time

    wrapper = ZKSignatureWrapperCircuit.build(FAST_TEST_CONFIG)
    srv = make_user_prover_server(wrapper)
    srv.start_background()
    try:
        sk = [11, 22, 33, 44]
        action = [5, 6, 7, 8]
        pk = rpc_call(srv.url, "cr_getZkPublicKey", [sk])
        assert pk == derive_public_key(sk)
        jid = rpc_call(srv.url, "cr_proveZkSignature", [sk, action])
        deadline = time.monotonic() + 1200
        while True:
            st = rpc_call(srv.url, "cr_getProof", [jid])
            if st["status"] == "done":
                break
            assert st["status"] == "pending", st
            assert time.monotonic() < deadline, "prover timed out"
            time.sleep(0.5)
        proof = decode_proof(bytes.fromhex(st["proof"]))
        assert list(proof.public_inputs[:4]) == pk
        assert list(proof.public_inputs[4:8]) == action
        assert wrapper.verify(proof)
        # identical requests dedupe to the same job
        assert rpc_call(srv.url, "cr_proveZkSignature", [sk, action]) == jid
    finally:
        srv.shutdown()


def test_orchestrator_service_plumbing():
    """wait_for_produce_block + flush + plan (no proving): the sync loop's
    step_1 shape."""
    from city_rollup_tpu.services.orchestrator_service import (
        produce_one_block, wait_for_produce_block)
    city = CityStore()
    city.register_user(0, 0, (1, 1, 1, 1))
    city.increment_user_balance(0, 0, 500)
    store = MemoryProofStore()
    hub = QueueHub()
    orch = orch_mod.Orchestrator(city, store, hub)
    node = make_node_server(hub)
    node.start_background()
    try:
        pr = CityRpcProvider(node_url=node.url)
        pr.token_transfer(0, 0, 0)          # self-transfer of 0 still plans
        pr.produce_block()
        assert wait_for_produce_block(hub, timeout_s=5)
        planned, done = produce_one_block(orch, hub, 1)
        assert done is None                  # not awaited
        assert planned.num_jobs > 0
        assert len(planned.leaf_jobs) >= 1
    finally:
        node.shutdown()
