"""Quadratic extension field: device vs host, field axioms."""

import numpy as np
import jax

from city_rollup_tpu.core import gl64, gl64_ext

P = gl64.P
rng = np.random.default_rng(11)


def _rand_ext(shape):
    a0 = rng.integers(0, P, size=shape, dtype=np.uint64)
    a1 = rng.integers(0, P, size=shape, dtype=np.uint64)
    return (a0, a1)


def _to_dev(a):
    return (gl64.from_u64(a[0]), gl64.from_u64(a[1]))


def _to_np(a):
    return (gl64.to_u64(np.asarray(a[0][0]), np.asarray(a[0][1])),
            gl64.to_u64(np.asarray(a[1][0]), np.asarray(a[1][1])))


def test_mul_matches_host():
    a, b = _rand_ext(32), _rand_ext(32)
    got = _to_np(jax.jit(gl64_ext.mul)(_to_dev(a), _to_dev(b)))
    for i in range(32):
        exp = gl64_ext.h_mul((int(a[0][i]), int(a[1][i])),
                             (int(b[0][i]), int(b[1][i])))
        assert (int(got[0][i]), int(got[1][i])) == exp


def test_inverse():
    a = _rand_ext(8)
    inv = jax.jit(gl64_ext.inverse)(_to_dev(a))
    prod = _to_np(gl64_ext.mul(_to_dev(a), inv))
    assert prod[0].tolist() == [1] * 8
    assert prod[1].tolist() == [0] * 8


def test_host_inverse_and_exp():
    a = (int(rng.integers(1, P, dtype=np.uint64)),
         int(rng.integers(0, P, dtype=np.uint64)))
    inv = gl64_ext.h_inverse(a)
    assert gl64_ext.h_mul(a, inv) == (1, 0)
    # Fermat in GF(p^2): a^(p^2 - 1) = 1
    assert gl64_ext.h_exp(a, P * P - 1) == (1, 0)
