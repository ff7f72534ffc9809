"""Mesh-sharded batched proving (VERDICT r4 item 6): prove_batch with a
jax.sharding.Mesh lays the batch axis of every device pass across the
devices (SPMD data parallelism over the 8-virtual-device CPU mesh here;
the same program runs over ICI on a real slice). Proofs must be
bit-identical to the unsharded batch (standard config is deterministic)."""

import numpy as np
import pytest

from city_rollup_tpu.core import fri as fri_mod
from city_rollup_tpu.parallel import mesh as mesh_mod
from city_rollup_tpu.snark import CircuitBuilder, CircuitConfig
from city_rollup_tpu.snark import prover as prover_mod
from city_rollup_tpu.snark import verifier as verifier_mod

FAST = CircuitConfig.poseidon_config(
    num_challenges=1,
    fri=fri_mod.FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                          num_query_rounds=4, final_poly_bits=3))


def _circuit():
    b = CircuitBuilder(FAST)
    x = b.add_virtual_target()
    y = b.mul(x, b.add_const(x, 5))
    b.register_public_input(y)
    data = b.build()
    return b, data


@pytest.mark.slow
def test_mesh_sharded_prove_batch_matches_unsharded(monkeypatch):
    monkeypatch.setenv("CITY_DEVICE_PASSES", "1")
    b = CircuitBuilder(FAST)
    x = b.add_virtual_target()
    y = b.mul(x, b.add_const(x, 5))
    b.register_public_input(y)
    data = b.build()
    pws = []
    for v in range(8):
        pw = b.partial_witness()
        pw.set(x, v + 1)
        pws.append(pw)

    m = mesh_mod.make_mesh()          # 8 virtual devices
    sharded = prover_mod.prove_batch(data, pws, mesh=m)
    plain = prover_mod.prove_batch(data, pws)
    assert len(sharded) == 8
    for ps, pp in zip(sharded, plain):
        assert ps.public_inputs == pp.public_inputs
        assert np.array_equal(ps.wires_cap, pp.wires_cap)
        assert np.array_equal(ps.quotient_cap, pp.quotient_cap)
        assert [tuple(a) for a in ps.openings.flat()] == \
            [tuple(a) for a in pp.openings.flat()]
    assert verifier_mod.verify(sharded[3], data.common, data.verifier)
