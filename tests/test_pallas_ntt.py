"""Pallas four-step NTT: bit-exactness vs the jnp radix-2 path, run in
interpreter mode on CPU (the real-chip path is cross-checked on axon; the
kernel body is identical — only the Mosaic lowering differs)."""

import numpy as np
import pytest

from city_rollup_tpu.core import gl64
from city_rollup_tpu.core import ntt as jntt
from city_rollup_tpu.core import pallas_ntt as pn


def _clear():
    pn._fourstep_jit._clear_cache()
    pn._scale_const_jit._clear_cache()
    pn._coset_scale_pad_jit._clear_cache()
    pn._mul_table_jit._clear_cache()


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("CITY_PALLAS_INTERPRET", "1")
    _clear()
    yield
    _clear()


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl64.P, size=shape, dtype=np.uint64)


def _jnp_ref(fn, *args, monkeypatch=None, **kw):
    """Run a core/ntt.py entry point with the Pallas dispatch disabled."""
    import os
    os.environ["CITY_NO_PALLAS_NTT"] = "1"
    try:
        return fn(*args, **kw)
    finally:
        del os.environ["CITY_NO_PALLAS_NTT"]


@pytest.mark.parametrize("log_n,batch", [(10, 3), (13, 2)])
def test_ntt_matches_jnp(log_n, batch):
    vals = _rand((batch, 1 << log_n), seed=log_n)
    x = gl64.from_u64(vals)
    want = _jnp_ref(jntt.ntt, x, log_n)
    got = pn.ntt(x, log_n)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(got[0]), np.asarray(got[1])),
        gl64.to_u64(np.asarray(want[0]), np.asarray(want[1])))


def test_intt_roundtrip():
    log_n = 12
    vals = _rand((2, 1 << log_n), seed=99)
    x = gl64.from_u64(vals)
    y = pn.ntt(x, log_n)
    back = pn.intt(y, log_n)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(back[0]), np.asarray(back[1])), vals)


def test_coset_lde_matches_jnp():
    log_n, rate = 9, 3
    vals = _rand((2, 1 << log_n), seed=7)
    x = gl64.from_u64(vals)
    want = _jnp_ref(jntt.coset_lde, x, log_n, rate)
    got = pn.coset_lde(x, log_n, rate)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(got[0]), np.asarray(got[1])),
        gl64.to_u64(np.asarray(want[0]), np.asarray(want[1])))


def test_coset_intt_matches_jnp():
    log_m = 12
    vals = _rand((1, 1 << log_m), seed=8)
    x = gl64.from_u64(vals)
    want = _jnp_ref(jntt.coset_intt, x, log_m)
    got = pn.coset_intt(x, log_m)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(got[0]), np.asarray(got[1])),
        gl64.to_u64(np.asarray(want[0]), np.asarray(want[1])))


def test_tail_stages_beyond_kernel_block(monkeypatch):
    """Transforms longer than MAX_KERNEL_LOG split into per-block kernel
    stages + jnp tail butterflies; force a tiny cap to exercise that path."""
    monkeypatch.setattr(pn, "MAX_KERNEL_LOG", 3)
    log_n = 9          # split: log_n2=3 (kernel), log_n1=6 -> 3 tail stages
    vals = _rand((2, 1 << log_n), seed=11)
    x = gl64.from_u64(vals)
    want = _jnp_ref(jntt.ntt, x, log_n)
    got = pn.ntt(x, log_n)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(got[0]), np.asarray(got[1])),
        gl64.to_u64(np.asarray(want[0]), np.asarray(want[1])))


def test_3d_batch_shape():
    log_n = 12
    vals = _rand((2, 3, 1 << log_n), seed=5)
    x = gl64.from_u64(vals)
    want = _jnp_ref(jntt.ntt, x, log_n)
    got = pn.ntt(x, log_n)
    np.testing.assert_array_equal(
        gl64.to_u64(np.asarray(got[0]), np.asarray(got[1])),
        gl64.to_u64(np.asarray(want[0]), np.asarray(want[1])))
