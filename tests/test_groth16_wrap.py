"""Groth16 wrap statement (rollup/groth16_wrap.py) + engine fast paths.

Reference role: gnark-plonky2-wrapper consumed at
city_rollup_circuit/src/worker/toolbox/root.rs:256-318."""

import random

import pytest

from city_rollup_tpu.crypto import groth16 as g16
from city_rollup_tpu.crypto.bls12_381 import (G1, G2, R, FixedBaseTable,
                                              g1_msm, g2_msm)
from city_rollup_tpu.rollup.groth16_wrap import (Groth16WrapCircuit,
                                                 binding_digest, mimc_sponge,
                                                 pack_state)

rnd = random.Random(11)


def test_jacobian_mul_and_msm_match_affine():
    g1 = G1.generator()

    def slow_mul(pt, k, ident):
        out, base = ident, pt
        while k:
            if k & 1:
                out = out.add(base)
            base = base.add(base)
            k >>= 1
        return out

    for _ in range(3):
        k = rnd.randrange(1, R)
        assert g1.mul(k) == slow_mul(g1, k, G1.identity())
    assert g1.mul(0) == G1.identity()
    assert g1.mul(R) == G1.identity()

    pts = [g1.mul(rnd.randrange(R)) for _ in range(6)]
    scs = [rnd.randrange(R) for _ in range(6)]
    exp = G1.identity()
    for p, s in zip(pts, scs):
        exp = exp.add(p.mul(s))
    assert g1_msm(pts, scs) == exp

    tb = FixedBaseTable(g1)
    for _ in range(3):
        k = rnd.randrange(R)
        assert tb.mul(k) == g1.mul(k)

    g2 = G2.generator()
    pts2 = [g2.mul(rnd.randrange(R)) for _ in range(3)]
    scs2 = [rnd.randrange(R) for _ in range(3)]
    exp2 = G2.identity()
    for p, s in zip(pts2, scs2):
        exp2 = exp2.add(p.mul(s))
    assert g2_msm(pts2, scs2) == exp2


def test_groth16_toy_circuit():
    r1cs = g16.R1CS(num_public=1, num_vars=4,
                    a_rows=[{2: 1}], b_rows=[{3: 1}], c_rows=[{1: 1}])
    pk, vk = g16.setup(r1cs, b"test", dev_deterministic=True)
    pr = g16.prove(pk, [1, 6, 2, 3])
    assert g16.verify(vk, [6], pr)
    assert not g16.verify(vk, [7], pr)
    # invalid points rejected before pairing
    assert not g16.verify(vk, [6], g16.Groth16Proof(a=G1(5, 7), b=pr.b,
                                                    c=pr.c))
    # explicit seed requires the dev flag
    with pytest.raises(ValueError):
        g16.setup(r1cs, b"seed")
    assert len(pr.to_ps_bytes()) == 192


@pytest.mark.slow
def test_wrap_statement_end_to_end():
    fp = (123456789, 987654321, 555, 777)
    wc = Groth16WrapCircuit.build(fp, setup_seed=b"test",
                                  dev_deterministic=True)
    pis = [(1 << 62) - 1, 3, 5, 7, (1 << 63) - 1, 11, 13, 17]
    proof, pub = wc.prove(pis)
    assert wc.verify(proof, pub)
    x_state, x_sighash = pack_state(pis)
    assert pub[0] == x_state and pub[1] == x_sighash
    assert pub[2] == binding_digest(pis, fp)
    # tampering any public input kills the proof
    for i in range(3):
        bad = list(pub)
        bad[i] ^= 1
        assert not wc.verify(proof, bad)
    # out-of-range felt fails witness construction
    with pytest.raises(AssertionError):
        wc.prove([1 << 62, 0, 0, 0, 0, 0, 0, 0])


def test_mimc_sponge_determinism():
    a = mimc_sponge([1, 2, 3])
    assert a == mimc_sponge([1, 2, 3])
    assert a != mimc_sponge([1, 2, 4])
    assert binding_digest([0] * 8, (0, 0, 0, 0)) != \
        binding_digest([0] * 8, (1, 0, 0, 0))
