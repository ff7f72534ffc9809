"""Goldilocks limb arithmetic vs exact python-int ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from city_rollup_tpu.core import gl64

P = gl64.P
rng = np.random.default_rng(0)


def rand_elems(n):
    # uniform over [0, p), biased-free enough for tests; include edge cases
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    edge = np.array([0, 1, P - 1, P - 2, 0xFFFFFFFF, 0x100000000,
                     P - 0xFFFFFFFF, 2**63, 2**63 - 1, P - 2**32],
                    dtype=np.uint64)
    vals[:len(edge)] = edge
    return vals


def test_pack_roundtrip():
    x = rand_elems(128)
    lo, hi = gl64.from_u64(x)
    assert np.array_equal(gl64.to_u64(np.asarray(lo), np.asarray(hi)), x)


def test_add_sub_neg():
    a = rand_elems(512)
    b = rand_elems(512)[::-1].copy()
    aj, bj = gl64.from_u64(a), gl64.from_u64(b)
    got_add = gl64.to_u64(*[np.asarray(x) for x in jax.jit(gl64.add)(aj, bj)])
    got_sub = gl64.to_u64(*[np.asarray(x) for x in jax.jit(gl64.sub)(aj, bj)])
    got_neg = gl64.to_u64(*[np.asarray(x) for x in jax.jit(gl64.neg)(aj)])
    exp_add = np.array([(int(x) + int(y)) % P for x, y in zip(a, b)],
                       dtype=np.uint64)
    exp_sub = np.array([(int(x) - int(y)) % P for x, y in zip(a, b)],
                       dtype=np.uint64)
    exp_neg = np.array([(-int(x)) % P for x in a], dtype=np.uint64)
    assert np.array_equal(got_add, exp_add)
    assert np.array_equal(got_sub, exp_sub)
    assert np.array_equal(got_neg, exp_neg)


def test_mul():
    a = rand_elems(512)
    b = rand_elems(512)[::-1].copy()
    aj, bj = gl64.from_u64(a), gl64.from_u64(b)
    got = gl64.to_u64(*[np.asarray(x) for x in jax.jit(gl64.mul)(aj, bj)])
    exp = np.array([(int(x) * int(y)) % P for x, y in zip(a, b)],
                   dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_mul_small():
    a = rand_elems(256)
    aj = gl64.from_u64(a)
    for k in [0, 1, 2, 17, 41, 1 << 19]:
        got = gl64.to_u64(*[np.asarray(x) for x in gl64.mul_small(aj, k)])
        exp = np.array([(int(x) * k) % P for x in a], dtype=np.uint64)
        assert np.array_equal(got, exp), k


def test_exp7():
    a = rand_elems(256)
    aj = gl64.from_u64(a)
    got = gl64.to_u64(*[np.asarray(x) for x in jax.jit(gl64.exp7)(aj)])
    exp = np.array([pow(int(x), 7, P) for x in a], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_inverse():
    a = rand_elems(64)
    a[a == 0] = 1
    aj = gl64.from_u64(a)
    got = gl64.to_u64(*[np.asarray(x) for x in jax.jit(gl64.inverse)(aj)])
    exp = np.array([pow(int(x), P - 2, P) for x in a], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_roots_of_unity():
    g32 = gl64.POWER_OF_TWO_GENERATOR
    assert pow(g32, 2**32, P) == 1
    assert pow(g32, 2**31, P) != 1
    for k in [1, 2, 10, 22]:
        w = gl64.h_primitive_root_of_unity(k)
        assert pow(w, 2**k, P) == 1
        assert pow(w, 2**(k - 1), P) != 1


def test_np_inverse_batch_tree():
    """Product-tree batch inversion must match elementwise Fermat,
    including zeros (-> 0), ones, and p-1 (round-4 hot-path rewrite)."""
    import numpy as np
    from city_rollup_tpu.core import gl64
    rng = np.random.default_rng(7)
    a = rng.integers(0, gl64.P, size=(5, 33), dtype=np.uint64)
    a[0, 0] = 0
    a[1, 1] = 1
    a[2, 2] = gl64.P - 1
    inv = gl64.np_inverse(a)
    prod = gl64.np_mul(a, inv)
    nz = a != 0
    assert (prod[nz] == 1).all()
    assert (inv[~nz] == 0).all()
    assert int(inv[2, 2]) == gl64.P - 1          # (p-1)^-1 == p-1
    assert gl64.np_inverse(np.empty(0, dtype=np.uint64)).size == 0
