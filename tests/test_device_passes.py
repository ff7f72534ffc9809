"""Device-resident prover passes (snark/device_passes.py): bit-exactness
vs the numpy twins.

The full prove-path equality run is slow on the CPU backend (XLA compiles
the fused quotient graph for several minutes at optimization level 1), so
it lives in the slow tier; the fast tier covers the pass functions
directly on a tiny hand-rolled shape.
"""

import numpy as np
import pytest

from city_rollup_tpu.core import fri as fri_mod
from city_rollup_tpu.core import gl64
from city_rollup_tpu.snark.config import CircuitConfig

FAST = CircuitConfig.poseidon_config(
    num_challenges=1,
    fri=fri_mod.FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=4,
                          num_query_rounds=4, final_poly_bits=3))


def _tiny_circuit():
    from city_rollup_tpu.snark.circuit import CircuitBuilder
    b = CircuitBuilder(FAST)
    x = b.add_virtual_target()
    y = b.mul(x, x)
    b.register_public_input(y)
    data = b.build()
    pw = b.partial_witness()
    pw.set(x, 3)
    return b, data, pw


def test_perm_pass_matches_numpy():
    """Device permutation columns == the numpy loop, same (B, rows, n)."""
    from city_rollup_tpu.snark import device_passes, prover
    from city_rollup_tpu.snark.circuit import generate_witness
    _, data, pw = _tiny_circuit()
    common, pd = data.common, data.prover
    cfg = common.config
    n = common.n
    B = 2
    wires = generate_witness(data, pw)
    wires_b = np.stack([wires, wires])
    rng = np.random.default_rng(0)
    betas = [rng.integers(1, gl64.P, size=B, dtype=np.uint64)
             for _ in range(cfg.num_challenges)]
    gammas = [rng.integers(1, gl64.P, size=B, dtype=np.uint64)
              for _ in range(cfg.num_challenges)]
    got_pair = device_passes.perm_zs_pp(common, pd, wires_b, betas, gammas)
    got = gl64.to_u64(np.asarray(got_pair[0]), np.asarray(got_pair[1]))

    # numpy twin (the prove_batch step-3 loop, replicated)
    R = cfg.num_routed_wires
    x = pd.subgroup
    k_is = common.k_is
    sigmas = pd.sigmas
    zs_rows, pp_rows = [], []
    for c in range(cfg.num_challenges):
        beta = betas[c].reshape(B, 1)
        gamma = gammas[c].reshape(B, 1)
        ratios = np.empty((R, B, n), dtype=np.uint64)
        for i in range(R):
            bkx = gl64.np_mul(x, gl64.np_mul(beta, np.uint64(k_is[i])))
            nums = gl64.np_add(gl64.np_add(wires_b[:, i, :], bkx), gamma)
            bs = gl64.np_mul(sigmas[i], beta)
            dens = gl64.np_add(gl64.np_add(wires_b[:, i, :], bs), gamma)
            ratios[i] = gl64.np_mul(nums, gl64.np_inverse(dens))
        cs = cfg.perm_chunk_size
        chunk_prod = []
        for j in range(cfg.num_perm_chunks):
            blk = ratios[j * cs:(j + 1) * cs]
            pr = blk[0]
            for rrow in blk[1:]:
                pr = gl64.np_mul(pr, rrow)
            chunk_prod.append(pr)
        row_prod = chunk_prod[0]
        for cp in chunk_prod[1:]:
            row_prod = gl64.np_mul(row_prod, cp)
        cum = prover.np_cumprod_mod(row_prod)
        z = np.concatenate(
            [np.ones((B, 1), dtype=np.uint64), cum[:, :-1]], axis=1)
        zs_rows.append(z)
        run = z
        for j in range(cfg.num_partial_products):
            run = gl64.np_mul(run, chunk_prod[j])
            pp_rows.append(run)
    want = np.stack(zs_rows + pp_rows, axis=1)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_device_prove_equals_numpy_prove(monkeypatch):
    """Full prove through the device passes produces a proof the host
    verifier accepts and whose openings equal the numpy path's (the
    standard config is deterministic — no blinding)."""
    from city_rollup_tpu.snark import prover as prover_mod
    from city_rollup_tpu.snark import verifier as verifier_mod
    _, data, pw = _tiny_circuit()
    monkeypatch.setenv("CITY_DEVICE_PASSES", "1")
    p_dev = prover_mod.prove(data, pw)
    monkeypatch.delenv("CITY_DEVICE_PASSES")
    monkeypatch.setenv("CITY_NO_DEVICE_PASSES", "1")
    p_np = prover_mod.prove(data, pw)
    assert verifier_mod.verify(p_dev, data.common, data.verifier)
    assert [tuple(a) for a in p_dev.openings.flat()] == \
        [tuple(a) for a in p_np.openings.flat()]
    assert np.array_equal(p_dev.wires_cap, p_np.wires_cap)
    assert np.array_equal(p_dev.quotient_cap, p_np.quotient_cap)
