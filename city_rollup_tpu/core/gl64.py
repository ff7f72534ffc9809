"""Goldilocks field (p = 2^64 - 2^32 + 1) arithmetic for TPU, in JAX.

TPUs have no native 64-bit integer datapath, so field elements are represented as
pairs of uint32 limbs ``(lo, hi)`` (arrays of identical shape). All operations are
pure elementwise jnp ops that vectorize on the VPU and fuse under jit; the same code
runs on CPU for tests.

Representation invariant: every element returned by public ops is *canonical*
(< p). Intermediate values may be non-canonical internally.

Mirrors the role of plonky2's ``GoldilocksField`` (the external prover core the
reference consumes, SURVEY.md §2.14; reference usage e.g.
city_crypto/src/hash/qhashout.rs:21) but is an original TPU-first design.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Field constants
P = 0xFFFF_FFFF_0000_0001          # 2^64 - 2^32 + 1
EPSILON = 0xFFFF_FFFF              # 2^32 - 1 == 2^64 mod p
P_LO = np.uint32(0x0000_0001)
P_HI = np.uint32(0xFFFF_FFFF)
MULTIPLICATIVE_GROUP_GENERATOR = 7
TWO_ADICITY = 32
# 7^((p-1) / 2^32) mod p — generator of the maximal 2-adic subgroup.
POWER_OF_TWO_GENERATOR = 0x185629DCDA58878C

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# Packing helpers (host <-> device representation)
# ---------------------------------------------------------------------------

def from_u64(x) -> tuple[jnp.ndarray, jnp.ndarray]:
    """numpy uint64 (or python-int array-like) -> (lo, hi) uint32 pair."""
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def to_u64(lo, hi) -> np.ndarray:
    """(lo, hi) uint32 pair -> numpy uint64 array (host)."""
    lo = np.asarray(lo, dtype=np.uint64)
    hi = np.asarray(hi, dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> tuple[jnp.ndarray, jnp.ndarray]:
    z = jnp.zeros(shape, dtype=_U32)
    return z, z


def full(shape, value: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    value = int(value) % P
    return (jnp.full(shape, value & 0xFFFFFFFF, dtype=_U32),
            jnp.full(shape, value >> 32, dtype=_U32))


# ---------------------------------------------------------------------------
# u64 primitive ops on (lo, hi) uint32 pairs
# ---------------------------------------------------------------------------

def _add64(alo, ahi, blo, bhi):
    """64-bit wrapping add; returns (lo, hi, carry_out[uint32 0/1])."""
    lo = alo + blo
    carry = (lo < alo).astype(_U32)
    hi = ahi + bhi
    carry_hi = (hi < ahi).astype(_U32)
    hi2 = hi + carry
    carry_hi2 = (hi2 < hi).astype(_U32)
    return lo, hi2, carry_hi | carry_hi2


def _sub64(alo, ahi, blo, bhi):
    """64-bit wrapping sub; returns (lo, hi, borrow_out[uint32 0/1])."""
    lo = alo - blo
    borrow = (alo < blo).astype(_U32)
    hi = ahi - bhi
    borrow_hi = (ahi < bhi).astype(_U32)
    hi2 = hi - borrow
    borrow_hi2 = (hi < borrow).astype(_U32)
    return lo, hi2, borrow_hi | borrow_hi2


def _geq_p(lo, hi):
    """uint32 bool mask: (lo, hi) >= p."""
    return (hi == P_HI) & (lo >= P_LO)


def _mul32_wide(x, y):
    """32x32 -> 64 bit multiply via 16-bit halves. Returns (lo, hi) uint32."""
    x0 = x & _MASK16
    x1 = x >> 16
    y0 = y & _MASK16
    y1 = y >> 16
    ll = x0 * y0
    lh = x0 * y1
    hl = x1 * y0
    hh = x1 * y1
    # mid accumulation with carry capture
    mid = lh + (ll >> 16)            # fits in u32
    mid2 = mid + hl                  # may wrap
    carry = (mid2 < hl).astype(_U32)
    lo = (ll & _MASK16) | (mid2 << 16)
    hi = hh + (mid2 >> 16) + (carry << 16)
    return lo, hi


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------

def canonicalize(lo, hi):
    """Reduce a u64 < 2p into canonical form by one conditional subtract of p."""
    m = _geq_p(lo, hi)
    slo, shi, _ = _sub64(lo, hi, P_LO, P_HI)
    return jnp.where(m, slo, lo), jnp.where(m, shi, hi)


def add(a, b):
    """(a + b) mod p for canonical inputs."""
    alo, ahi = a
    blo, bhi = b
    lo, hi, carry = _add64(alo, ahi, blo, bhi)
    # On carry, the true value is 2^64 + v; 2^64 ≡ EPSILON (mod p), so add EPSILON.
    # v < 2p - 2^64 < EPSILON? a,b < p so sum < 2p = 2^65 - 2^33 + 2; on carry
    # v = sum - 2^64 < 2^64 - 2^33 + 2; v + EPSILON cannot re-carry past 2^64
    # because v < p - EPSILON... handled below by a second conditional add.
    lo2 = lo + (carry * np.uint32(0xFFFFFFFF))
    c2 = ((lo2 < lo) & (carry == 1)).astype(_U32)
    hi2 = hi + c2
    return canonicalize(lo2, hi2)


def neg(a):
    alo, ahi = a
    is_zero = (alo == 0) & (ahi == 0)
    lo, hi, _ = _sub64(P_LO, P_HI, alo, ahi)
    return jnp.where(is_zero, 0, lo).astype(_U32), jnp.where(is_zero, 0, hi).astype(_U32)


def sub(a, b):
    """(a - b) mod p for canonical inputs."""
    alo, ahi = a
    blo, bhi = b
    lo, hi, borrow = _sub64(alo, ahi, blo, bhi)
    # On borrow, true value is v - 2^64; add p (mod 2^64 this subtracts EPSILON... )
    # v_wrapped + p mod 2^64: since v_wrapped = a - b + 2^64, we want a - b + p =
    # v_wrapped + p - 2^64 = v_wrapped - EPSILON.
    lo2 = lo - (borrow * np.uint32(0xFFFFFFFF))
    b2 = ((lo < (borrow * np.uint32(0xFFFFFFFF)))).astype(_U32)
    hi2 = hi - b2
    return lo2, hi2


def _reduce128(n0, n1, n2, n3):
    """Reduce a 128-bit value (four uint32 limbs, little-endian) mod p.

    Uses 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p):
        n ≡ (n0 + n1·2^32) - n3 + n2·(2^32 - 1)
    """
    lo, hi = n0, n1
    # step 1: subtract n3 (64-bit borrow); on borrow, value went -2^64 ≡ -EPSILON,
    # so add back by subtracting EPSILON from the wrapped value... borrow means
    # wrapped = v + 2^64; true ≡ wrapped - EPSILON (mod p).
    t_lo, t_hi, borrow = _sub64(lo, hi, n3, jnp.zeros_like(n3))
    t_lo2 = t_lo - (borrow * np.uint32(0xFFFFFFFF))
    bb = (t_lo < (borrow * np.uint32(0xFFFFFFFF))).astype(_U32)
    t_hi2 = t_hi - bb
    # step 2: add n2 * EPSILON = (n2 << 32) - n2
    #   n2*EPSILON as u64: lo = -n2 (wrapping: 0 - n2), hi = n2 - (n2 != 0)
    e_lo = jnp.zeros_like(n2) - n2
    e_hi = n2 - (n2 != 0).astype(_U32)
    r_lo, r_hi, carry = _add64(t_lo2, t_hi2, e_lo, e_hi)
    # On carry, wrapped ≡ true - 2^64 ≡ true - EPSILON; add EPSILON back.
    r_lo2 = r_lo + (carry * np.uint32(0xFFFFFFFF))
    cc = ((r_lo2 < r_lo) & (carry == 1)).astype(_U32)
    r_hi2 = r_hi + cc
    return canonicalize(r_lo2, r_hi2)


def mul(a, b):
    """(a * b) mod p for canonical inputs. ~16 uint32 multiplies on the VPU."""
    alo, ahi = a
    blo, bhi = b
    # 128-bit product via four 32x32->64 partials
    ll_lo, ll_hi = _mul32_wide(alo, blo)
    lh_lo, lh_hi = _mul32_wide(alo, bhi)
    hl_lo, hl_hi = _mul32_wide(ahi, blo)
    hh_lo, hh_hi = _mul32_wide(ahi, bhi)
    # n = ll + (lh + hl) << 32 + hh << 64
    n0 = ll_lo
    # limb 1: ll_hi + lh_lo + hl_lo
    s1 = ll_hi + lh_lo
    c1 = (s1 < lh_lo).astype(_U32)
    n1 = s1 + hl_lo
    c1 = c1 + (n1 < hl_lo).astype(_U32)
    # limb 2: lh_hi + hl_hi + hh_lo + c1
    s2 = lh_hi + hl_hi
    c2 = (s2 < hl_hi).astype(_U32)
    s2b = s2 + hh_lo
    c2 = c2 + (s2b < hh_lo).astype(_U32)
    n2 = s2b + c1
    c2 = c2 + (n2 < c1).astype(_U32)
    # limb 3: hh_hi + c2 (cannot overflow: product < 2^128)
    n3 = hh_hi + c2
    return _reduce128(n0, n1, n2, n3)


def mul_small(a, k: int):
    """Multiply by a small compile-time constant k (0 <= k < 2^20), e.g. MDS entries."""
    alo, ahi = a
    ku = np.uint32(k)
    lo_lo, lo_hi = _mul32_wide(alo, jnp.full_like(alo, ku))
    hi_lo, hi_hi = _mul32_wide(ahi, jnp.full_like(ahi, ku))
    # n = lo + (hi << 32): limbs n0=lo_lo, n1=lo_hi+hi_lo (+carry), n2=hi_hi+carry, n3=0
    n1 = lo_hi + hi_lo
    c = (n1 < hi_lo).astype(_U32)
    n2 = hi_hi + c
    return _reduce128(lo_lo, n1, n2, jnp.zeros_like(n2))


def square(a):
    return mul(a, a)


def _pow_const(a, e: int):
    """a^e for a compile-time exponent (square-and-multiply, unrolled)."""
    result = None
    base = a
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        base = square(base)
        e >>= 1
    if result is None:
        return full(jnp.shape(a[0]), 1)
    return result


def exp7(a):
    """a^7 — the Poseidon S-box. 4 field muls."""
    a2 = square(a)
    a3 = mul(a2, a)
    a6 = square(a3)
    return mul(a6, a)


def inverse(a):
    """a^(p-2) — field inverse via Fermat. Implemented as a lax.scan over
    the 64 exponent bits (one square + one masked mul per step) instead of
    an unrolled 126-mul chain: the unrolled graph takes ~15 s of XLA CPU
    compile per process, the scan body compiles in <1 s, and inverse is off
    the hot path (batch-inverted denominators use np_inverse)."""
    import jax
    import jax.numpy as jnp

    e = P - 2
    bits = jnp.array([(e >> i) & 1 for i in range(64)], dtype=jnp.uint32)

    def step(carry, bit):
        acc, base = carry
        mul_acc = mul(acc, base)
        acc = select(bit == 1, mul_acc, acc)
        base = square(base)
        return (acc, base), None

    one_v = full(jnp.shape(a[0]), 1)
    (acc, _), _ = jax.lax.scan(step, (one_v, a), bits)
    return acc


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a):
    return (a[0] == 0) & (a[1] == 0)


def select(mask, a, b):
    """Elementwise select: mask ? a : b."""
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


# ---------------------------------------------------------------------------
# Host-side vectorized exact ops (numpy uint64; for large constant tables)
# ---------------------------------------------------------------------------

_NP_MASK32 = np.uint64(0xFFFFFFFF)
_NP_EPS = np.uint64(0xFFFFFFFF)

# uint64 wraparound is intentional throughout (mod-2^64 limb arithmetic);
# numpy only warns for 0-d scalars, which show up on single-element inputs.
np.seterr(over="ignore")


def np_mul(a, b) -> np.ndarray:
    """Exact (a * b) mod p on numpy uint64 arrays (vectorized host twin of mul)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    alo = a & _NP_MASK32
    ahi = a >> np.uint64(32)
    blo = b & _NP_MASK32
    bhi = b >> np.uint64(32)
    ll = alo * blo                       # exact, < 2^64
    lh = alo * bhi
    hl = ahi * blo
    hh = ahi * bhi
    # mid = lh + hl + (ll >> 32), tracking carry into the high 64 bits
    mid = lh + hl
    c_mid = (mid < hl).astype(np.uint64)
    mid2 = mid + (ll >> np.uint64(32))
    c_mid += (mid2 < (ll >> np.uint64(32))).astype(np.uint64)
    lo64 = (ll & _NP_MASK32) | (mid2 << np.uint64(32))
    hi64 = hh + (mid2 >> np.uint64(32)) + (c_mid << np.uint64(32))
    # reduce n = lo64 + hi64 * 2^64 mod p, via 2^64 = eps, 2^96 = -1:
    #   n = lo64 - hi_hi + hi_lo * eps
    hi_lo = hi64 & _NP_MASK32
    hi_hi = hi64 >> np.uint64(32)
    t = lo64 - hi_hi
    borrow = (lo64 < hi_hi).astype(np.uint64)
    t -= borrow * _NP_EPS                # wrapped: subtract eps on borrow
    mid_term = hi_lo * _NP_EPS           # < 2^64, exact
    r = t + mid_term
    carry = (r < mid_term).astype(np.uint64)
    r += carry * _NP_EPS
    # canonicalize (one conditional subtract)
    geq = r >= np.uint64(P)
    r = np.where(geq, r - np.uint64(P), r)
    return r


def np_add(a, b) -> np.ndarray:
    """Exact (a + b) mod p on numpy uint64 arrays."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    s = a + b
    carry = s < a                       # wrapped past 2^64: add EPSILON back
    s = np.where(carry, s + _NP_EPS, s)
    geq = s >= np.uint64(P)
    return np.where(geq, s - np.uint64(P), s)


def np_sub(a, b) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return np_add(a, np.where(b == 0, np.uint64(0), np.uint64(P) - b))


def np_pow(a, e: int) -> np.ndarray:
    """Elementwise a^e mod p (square-and-multiply over a fixed exponent)."""
    a = np.asarray(a, dtype=np.uint64)
    result = np.ones_like(a)
    base = a
    while e > 0:
        if e & 1:
            result = np_mul(result, base)
        base = np_mul(base, base)
        e >>= 1
    return result


def np_inverse(a) -> np.ndarray:
    """Elementwise modular inverse (vectorized host path for permutation-
    argument denominators and opening-quotient division). Montgomery-style
    batch inversion over a pairwise product tree: ~3 multiplies per element
    + ONE scalar exponentiation, vs ~96 multiply-passes for elementwise
    Fermat. Zeros map to zero (Fermat semantics preserved)."""
    a = np.asarray(a, dtype=np.uint64)
    flat = a.reshape(-1)
    n = flat.size
    if n == 0:
        return a.copy()
    if n == 1:
        v = int(flat[0])
        inv = pow(v, P - 2, P) if v else 0
        return np.full(a.shape, inv, dtype=np.uint64)
    zero_mask = flat == 0
    vals = np.where(zero_mask, np.uint64(1), flat)
    m = 1 << (n - 1).bit_length()
    buf = np.ones(m, dtype=np.uint64)
    buf[:n] = vals
    levels = [buf]
    cur = buf
    while cur.size > 1:
        cur = np_mul(cur[0::2], cur[1::2])
        levels.append(cur)
    inv = np.array([pow(int(cur[0]), P - 2, P)], dtype=np.uint64)
    for lvl in reversed(levels[:-1]):
        left, right = lvl[0::2], lvl[1::2]
        inv_left = np_mul(inv, right)
        inv_right = np_mul(inv, left)
        nxt = np.empty_like(lvl)
        nxt[0::2] = inv_left
        nxt[1::2] = inv_right
        inv = nxt
    out = np.where(zero_mask, np.uint64(0), inv[:n])
    return out.reshape(a.shape)


def np_powers(base: int, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod p as uint64, via log-doubling."""
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    out = np.ones(1, dtype=np.uint64)
    cur = np.uint64(base % P)
    while len(out) < n:
        out = np.concatenate([out, np_mul(out, cur)])
        cur = np_mul(cur, cur)[()] if np.ndim(cur) == 0 else np_mul(cur, cur)
        cur = np.uint64(cur)
    return out[:n]


# ---------------------------------------------------------------------------
# Host-side exact scalar helpers (python ints; for twiddle tables, tests)
# ---------------------------------------------------------------------------

def h_mul(a: int, b: int) -> int:
    return (a * b) % P


def h_add(a: int, b: int) -> int:
    return (a + b) % P


def h_exp(a: int, e: int) -> int:
    return pow(a, e, P)


def h_inverse(a: int) -> int:
    return pow(a, P - 2, P)


def h_primitive_root_of_unity(n_log: int) -> int:
    """2^n_log-th primitive root of unity (matches plonky2's subgroup generator)."""
    assert 0 <= n_log <= TWO_ADICITY
    base = POWER_OF_TWO_GENERATOR
    for _ in range(TWO_ADICITY - n_log):
        base = (base * base) % P
    return base
