"""Number-theoretic transform (radix-2) and coset LDE over Goldilocks, in JAX.

TPU-first design: polynomials are batched along leading dims as ``(lo, hi)``
uint32 limb pairs of shape ``(..., N)``. Each butterfly stage is one fused
elementwise pass (one gl64.mul of N/2 lanes + add/sub); the python loop over
log2(N) stages unrolls into a static XLA graph. A single bit-reversal gather
up front keeps every stage a pure reshape/slice (XLA-tileable, no dynamic
shapes).

Reference role: plonky2's fft/coset LDE consumed by the prover for every wire
polynomial (rate 8 LDE; SURVEY.md §2.14, BASELINE.md north-star metric).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import gl64

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side tables (python-int exact; cached per size)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _root_powers(log_n: int) -> np.ndarray:
    """w^0 .. w^(N/2 - 1) for w the 2^log_n-th primitive root, as uint64."""
    n = 1 << log_n
    w = gl64.h_primitive_root_of_unity(log_n)
    return gl64.np_powers(w, max(n // 2, 1))


@functools.lru_cache(maxsize=None)
def _inv_root_powers(log_n: int) -> np.ndarray:
    n = 1 << log_n
    w_inv = gl64.h_inverse(gl64.h_primitive_root_of_unity(log_n))
    return gl64.np_powers(w_inv, max(n // 2, 1))


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _coset_powers(log_n: int, shift: int) -> np.ndarray:
    """shift^0 .. shift^(N-1) as uint64 (for coset NTT input scaling)."""
    return gl64.np_powers(shift, 1 << log_n)


def _to_pair_const(arr_u64: np.ndarray):
    """Host uint64 array -> (lo, hi) jnp constant pair."""
    lo = (arr_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr_u64 >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


# ---------------------------------------------------------------------------
# Core transforms
# ---------------------------------------------------------------------------

def _ntt_impl(x, log_n: int, root_pows: np.ndarray):
    """Iterative radix-2 DIT NTT along the last axis. x: (lo, hi) (..., N)."""
    n = 1 << log_n
    lo, hi = x
    assert lo.shape[-1] == n, (lo.shape, n)
    batch = lo.shape[:-1]

    perm = jnp.asarray(_bit_reverse_perm(log_n))
    lo = jnp.take(lo, perm, axis=-1)
    hi = jnp.take(hi, perm, axis=-1)

    for s in range(log_n):
        half = 1 << s
        blocks = n // (2 * half)
        # twiddle_j = w^(j * N / (2*half)), j in [0, half)
        stride = n // (2 * half)
        tw = root_pows[::stride][:half] if half > 1 else root_pows[:1]
        tw_lo, tw_hi = _to_pair_const(np.ascontiguousarray(tw))

        lo = lo.reshape(batch + (blocks, 2, half))
        hi = hi.reshape(batch + (blocks, 2, half))
        even = (lo[..., 0, :], hi[..., 0, :])
        odd = (lo[..., 1, :], hi[..., 1, :])
        t = gl64.mul(odd, (jnp.broadcast_to(tw_lo, odd[0].shape),
                           jnp.broadcast_to(tw_hi, odd[1].shape)))
        top = gl64.add(even, t)
        bot = gl64.sub(even, t)
        lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(batch + (n,))
        hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(batch + (n,))
    return lo, hi


# Each public transform is a thin shell around ONE jitted core per
# (transform, batch shape, size) — instead of one eager dispatch-and-
# compile per elementwise op per stage. The twiddle/permutation tables are
# passed as runtime ARGUMENTS (cached device arrays), not closed-over
# constants: at 2^24+ the embedded tables exceed 100 MB of HLO constants,
# which the axon remote compiler rejects outright (HTTP 413) and every
# compiler swallows slowly. `jax.ensure_compile_time_eval` keeps the cache
# safe to populate even when a shell is first called inside an outer trace
# (a cached tracer would poison later retraces).

_DEV_TABLES: dict = {}


def _dev_pair(key, arr_u64_fn):
    ent = _DEV_TABLES.get(key)
    if ent is None:
        arr = arr_u64_fn()
        with jax.ensure_compile_time_eval():
            ent = (jnp.asarray((arr & np.uint64(0xFFFFFFFF))
                               .astype(np.uint32)),
                   jnp.asarray((arr >> np.uint64(32)).astype(np.uint32)))
        _DEV_TABLES[key] = ent
    return ent


def _dev_perm(log_n: int):
    key = ("brev", log_n)
    ent = _DEV_TABLES.get(key)
    if ent is None:
        with jax.ensure_compile_time_eval():
            ent = jnp.asarray(_bit_reverse_perm(log_n))
        _DEV_TABLES[key] = ent
    return ent


def _ntt_args(log_n: int, inverse: bool):
    pows = (("ipow", log_n) if inverse else ("pow", log_n))
    fn = (lambda: _inv_root_powers(log_n)) if inverse else         (lambda: _root_powers(log_n))
    p_lo, p_hi = _dev_pair(pows, fn)
    return p_lo, p_hi, _dev_perm(log_n)


def _ntt_core(x, p_lo, p_hi, perm, log_n: int):
    """Arg-table twin of _ntt_impl: stage twiddles are SLICES of the
    passed root-power array (graph ops, nothing embedded)."""
    n = 1 << log_n
    lo, hi = x
    batch = lo.shape[:-1]
    lo = jnp.take(lo, perm, axis=-1)
    hi = jnp.take(hi, perm, axis=-1)
    for s in range(log_n):
        half = 1 << s
        blocks = n // (2 * half)
        stride = n // (2 * half)
        tw_lo = p_lo[::stride][:half] if half > 1 else p_lo[:1]
        tw_hi = p_hi[::stride][:half] if half > 1 else p_hi[:1]
        lo = lo.reshape(batch + (blocks, 2, half))
        hi = hi.reshape(batch + (blocks, 2, half))
        even = (lo[..., 0, :], hi[..., 0, :])
        odd = (lo[..., 1, :], hi[..., 1, :])
        t = gl64.mul(odd, (jnp.broadcast_to(tw_lo, odd[0].shape),
                           jnp.broadcast_to(tw_hi, odd[1].shape)))
        top = gl64.add(even, t)
        bot = gl64.sub(even, t)
        lo = jnp.stack([top[0], bot[0]], axis=-2).reshape(batch + (n,))
        hi = jnp.stack([top[1], bot[1]], axis=-2).reshape(batch + (n,))
    return lo, hi


@functools.partial(jax.jit, static_argnums=(4,))
def _ntt_jit(x, p_lo, p_hi, perm, log_n: int):
    return _ntt_core(x, p_lo, p_hi, perm, log_n)


def _pallas(log_m: int):
    """Route big transforms to the Pallas four-step path (VMEM-resident
    stages, ~5 HBM sweeps instead of ~log_m). Lazy import: pallas_ntt
    imports this module for its table caches."""
    from . import pallas_ntt
    if pallas_ntt.available() and log_m >= pallas_ntt.MIN_LOG_N:
        return pallas_ntt
    return None


def ntt(x, log_n: int):
    """Forward NTT: coefficients -> evaluations on the 2^log_n subgroup."""
    pn = _pallas(log_n)
    if pn is not None:
        return pn.ntt(x, log_n)
    return _ntt_jit(x, *_ntt_args(log_n, False), log_n)


@functools.partial(jax.jit, static_argnums=(4,))
def _intt_jit(x, p_lo, p_hi, perm, log_n: int):
    n = 1 << log_n
    y = _ntt_core(x, p_lo, p_hi, perm, log_n)
    n_inv = gl64.h_inverse(n)
    c_lo, c_hi = _to_pair_const(np.array([n_inv], dtype=np.uint64))
    return gl64.mul(y, (jnp.broadcast_to(c_lo, y[0].shape),
                        jnp.broadcast_to(c_hi, y[1].shape)))


def intt(x, log_n: int):
    """Inverse NTT: evaluations -> coefficients (includes 1/N scaling)."""
    pn = _pallas(log_n)
    if pn is not None:
        return pn.intt(x, log_n)
    return _intt_jit(x, *_ntt_args(log_n, True), log_n)


@functools.partial(jax.jit, static_argnums=(6, 7))
def _coset_lde_jit(coeffs, c_lo, c_hi, p_lo, p_hi, perm, log_n: int,
                   rate_bits: int):
    lo, hi = coeffs
    n = 1 << log_n
    m = 1 << (log_n + rate_bits)
    scaled = gl64.mul((lo, hi), (jnp.broadcast_to(c_lo, lo.shape),
                                 jnp.broadcast_to(c_hi, hi.shape)))
    pad = [(0, 0)] * (lo.ndim - 1) + [(0, m - n)]
    padded = (jnp.pad(scaled[0], pad), jnp.pad(scaled[1], pad))
    return _ntt_core(padded, p_lo, p_hi, perm, log_n + rate_bits)


def coset_lde(coeffs, log_n: int, rate_bits: int,
              shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Low-degree extension: coeffs (..., 2^log_n) -> evals (..., 2^(log_n+rate_bits))
    on the coset shift * <w>. Mirrors plonky2's PolynomialCoeffs::coset_fft with
    rate 2^rate_bits (SURVEY.md §2.14; BASELINE.md op-circuit LDE rate 1/8)."""
    assert coeffs[0].shape[-1] == 1 << log_n
    pn = _pallas(log_n + rate_bits)
    if pn is not None:
        return pn.coset_lde(coeffs, log_n, rate_bits, shift)
    sh = shift % gl64.P
    c_lo, c_hi = _dev_pair(("coset", log_n, sh),
                           lambda: _coset_powers(log_n, sh))
    p_lo, p_hi, perm = _ntt_args(log_n + rate_bits, False)
    return _coset_lde_jit(coeffs, c_lo, c_hi, p_lo, p_hi, perm, log_n,
                          rate_bits)


@functools.partial(jax.jit, static_argnums=(6,))
def _coset_intt_jit(evals, p_lo, p_hi, perm, s_lo, s_hi, log_m: int):
    n = 1 << log_m
    y = _ntt_core(evals, p_lo, p_hi, perm, log_m)
    n_inv = gl64.h_inverse(n)
    c_lo, c_hi = _to_pair_const(np.array([n_inv], dtype=np.uint64))
    c = gl64.mul(y, (jnp.broadcast_to(c_lo, y[0].shape),
                     jnp.broadcast_to(c_hi, y[1].shape)))
    return gl64.mul(c, (jnp.broadcast_to(s_lo, c[0].shape),
                        jnp.broadcast_to(s_hi, c[1].shape)))


def coset_intt(evals, log_m: int,
               shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Inverse of evaluation on coset shift * <w>: evals -> coefficients."""
    pn = _pallas(log_m)
    if pn is not None:
        return pn.coset_intt(evals, log_m, shift)
    inv_shift = gl64.h_inverse(shift % gl64.P)
    s_lo, s_hi = _dev_pair(("coset", log_m, inv_shift),
                           lambda: _coset_powers(log_m, inv_shift))
    p_lo, p_hi, perm = _ntt_args(log_m, True)
    return _coset_intt_jit(evals, p_lo, p_hi, perm, s_lo, s_hi, log_m)


# ---------------------------------------------------------------------------
# Host reference (exact, python ints; for tests on small sizes)
# ---------------------------------------------------------------------------

def h_ntt(coeffs: list[int], log_n: int) -> list[int]:
    n = 1 << log_n
    assert len(coeffs) == n
    w = gl64.h_primitive_root_of_unity(log_n)
    # naive O(n^2) evaluation — ground truth
    out = []
    wk = 1
    for _ in range(n):
        acc = 0
        xp = 1
        for c in coeffs:
            acc = (acc + c * xp) % gl64.P
            xp = (xp * wk) % gl64.P
        out.append(acc)
        wk = (wk * w) % gl64.P
    return out


def h_eval_poly(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % gl64.P
    return acc
