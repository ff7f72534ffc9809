"""Pallas/Mosaic four-step NTT / coset-LDE over Goldilocks for TPU.

The jnp radix-2 path (core/ntt.py) runs one fused elementwise pass per
butterfly stage: at the headline LDE size (2^23 points) that is ~23 full
read+write sweeps of HBM — the transform is purely bandwidth-bound and the
VPU idles. This module is the [NATIVE] kernel the build plan calls for
(SURVEY.md §7-1/3; reference role: plonky2's in-crate fft consumed for every
wire/quotient LDE): a **four-step NTT** whose small transforms run entirely
in VMEM, cutting HBM traffic to ~5 sweeps:

  1. one XLA gather fuses the (n2, n1) matrix view + bit-reversal;
  2. a Pallas kernel runs all log2(n2) butterfly stages of the length-n2
     transform on a VMEM-resident tile, then applies the four-step twiddle
     w^(n1*k2) (built in-kernel by sublane doubling from one per-lane seed);
  3. one XLA gather transposes + bit-reverses for the second axis;
  4. a second kernel runs the length-n1 stages;
  5. one XLA transpose restores natural order.

Kernel layout is **transposed** like core/pallas_poseidon.py: the transform
axis rides the sublanes, independent transforms ride the 128-wide lane axis,
so every butterfly is an elementwise (m, TILE_B) op plus a sublane
`pltpu.roll` — no lane-crossing reshapes anywhere. Stage twiddles are
precomputed per-row columns (w^((i & (2^s-1)) * m/2^(s+1))), so a stage is
exactly: roll up, roll down, one gl64.mul against the twiddle column, one
add/sub select. Numerics are bit-identical to core/ntt.py (cross-checked in
tests/test_pallas_ntt.py on the interpreter and the real chip).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gl64
from . import ntt as jntt

_U32 = jnp.uint32

# Smallest transform (log_m of the FULL transform) routed to the Pallas
# path by core/ntt.py's dispatch. Below this the jnp path's handful of
# passes is cheaper than two kernel launches + gathers.
MIN_LOG_N = int(os.environ.get("CITY_PALLAS_NTT_MIN", "12"))


def available() -> bool:
    if os.environ.get("CITY_NO_PALLAS") or os.environ.get("CITY_NO_PALLAS_NTT"):
        return False
    if os.environ.get("CITY_PALLAS_INTERPRET"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    return bool(os.environ.get("CITY_PALLAS_INTERPRET"))


# ---------------------------------------------------------------------------
# Host tables (cached; shipped to device once via the runtime-arg cache)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _stage_twiddle_cols(log_m: int, inverse: bool) -> np.ndarray:
    """(log_m * m,) uint64: rows [s*m + i] = w^((i & (2^s-1)) * m >> (s+1)),
    the per-row butterfly twiddle for stage s in the rolled formulation."""
    m = 1 << log_m
    w = gl64.h_primitive_root_of_unity(log_m)
    if inverse:
        w = gl64.h_inverse(w)
    pw = gl64.np_powers(w, max(m // 2, 1))
    idx = np.arange(m)
    out = np.empty(log_m * m, dtype=np.uint64)
    for s in range(log_m):
        h = 1 << s
        stride = m >> (s + 1)
        out[s * m:(s + 1) * m] = pw[(idx & (h - 1)) * stride]
    return out


@functools.lru_cache(maxsize=None)
def _gcol(log_n: int, log_n2: int, b: int, lanes_padded: int,
          inverse: bool) -> np.ndarray:
    """(lanes_padded,) uint64 four-step twiddle seeds: lane r (= bb*n1 + c)
    carries g = w_N^c; the kernel raises it to k2 along the sublanes."""
    n1 = 1 << (log_n - log_n2)
    w = gl64.h_primitive_root_of_unity(log_n)
    if inverse:
        w = gl64.h_inverse(w)
    pw = gl64.np_powers(w, n1)
    out = np.zeros(lanes_padded, dtype=np.uint64)
    out[:b * n1] = np.tile(pw, b)
    return out


def _dev_col(key, fn):
    """Device-resident (rows, 1) uint32 limb pair, via the ntt table cache."""
    ent = jntt._DEV_TABLES.get(key)
    if ent is None:
        arr = fn()
        with jax.ensure_compile_time_eval():
            ent = (jnp.asarray((arr & np.uint64(0xFFFFFFFF))
                               .astype(np.uint32)).reshape(-1, 1),
                   jnp.asarray((arr >> np.uint64(32))
                               .astype(np.uint32)).reshape(-1, 1))
        jntt._DEV_TABLES[key] = ent
    return ent


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _stages(lo, hi, twl_ref, twh_ref, log_m: int):
    """All log_m DIT butterfly stages on a VMEM-resident (m, B) tile.
    Input rows must be bit-reversed; output rows are natural order.

    Stages run under lax.fori_loop (dynamic roll shift + dynamic twiddle
    ref slice), NOT unrolled: Mosaic stacks every unrolled stage's temps in
    scoped VMEM (11 stages x ~5 temps blew the 16MB cap at 2^23)."""
    m = 1 << log_m
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def stage(s, carry):
        lo, hi = carry
        h = jnp.int32(1) << s
        twl = twl_ref[pl.ds(s * m, m), :]
        twh = twh_ref[pl.ds(s * m, m), :]
        clear = ((iota >> s) & 1) == 0
        up = (pltpu.roll(lo, m - h, 0), pltpu.roll(hi, m - h, 0))
        dn = (pltpu.roll(lo, h, 0), pltpu.roll(hi, h, 0))
        # rows with bit s clear pair downward: out = x + tw * x[i+h];
        # rows with bit s set:                out = x[i-h] - tw * x
        plo = jnp.where(clear, up[0], lo)
        phi = jnp.where(clear, up[1], hi)
        t = gl64.mul((plo, phi), (twl, twh))
        a = gl64.add((lo, hi), t)
        d = gl64.sub(dn, t)
        return (jnp.where(clear, a[0], d[0]),
                jnp.where(clear, a[1], d[1]))

    return jax.lax.fori_loop(0, log_m, stage, (lo, hi))


def _apply_fourstep_twiddle(lo, hi, glo_ref, ghi_ref, log_m: int):
    """Multiply row k2 of each lane by g^k2: binary exponentiation over the
    row index bits with FIXED-size buffers (P *= g^(2^t) on rows whose bit t
    is set; a concat-doubling build stacks growing temps in scoped VMEM)."""
    m = 1 << log_m
    b = lo.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def body(t, carry):
        plo, phi, gplo, gphi = carry
        bit = ((iota >> t) & 1) == 1
        q = gl64.mul((plo, phi), (jnp.broadcast_to(gplo, plo.shape),
                                  jnp.broadcast_to(gphi, phi.shape)))
        plo = jnp.where(bit, q[0], plo)
        phi = jnp.where(bit, q[1], phi)
        gp2 = gl64.mul((gplo, gphi), (gplo, gphi))
        return plo, phi, gp2[0], gp2[1]

    init = (jnp.ones((m, b), _U32), jnp.zeros((m, b), _U32),
            glo_ref[:], ghi_ref[:])
    plo, phi, _, _ = jax.lax.fori_loop(0, log_m, body, init)
    return gl64.mul((lo, hi), (plo, phi))


def _kernel_plain(twl_ref, twh_ref, lo_ref, hi_ref, olo_ref, ohi_ref,
                  *, log_m: int):
    lo, hi = _stages(lo_ref[:], hi_ref[:], twl_ref, twh_ref, log_m)
    olo_ref[:] = lo
    ohi_ref[:] = hi


def _kernel_tw(twl_ref, twh_ref, glo_ref, ghi_ref, lo_ref, hi_ref,
               olo_ref, ohi_ref, *, log_m: int):
    lo, hi = _stages(lo_ref[:], hi_ref[:], twl_ref, twh_ref, log_m)
    lo, hi = _apply_fourstep_twiddle(lo, hi, glo_ref, ghi_ref, log_m)
    olo_ref[:] = lo
    ohi_ref[:] = hi


# Max stages run inside one kernel invocation. Blocks are (2^K, 128+) and
# the fori_loop stage body spills ~30 such u32 temporaries to scoped VMEM;
# 2^12 x 128 x 4B x ~30 = ~60MB fits under the raised limit, 2^13 does not
# (and lane tiles below 128 are not lowerable).
MAX_KERNEL_LOG = 12


def _tile_for(log_m: int) -> int:
    if log_m <= 11:
        return 256
    return 128


def _tail_stage(lo, hi, s: int, log_m: int, ttl, tth):
    """One cross-block DIT butterfly stage in plain XLA (transposed layout,
    transform down axis 0). Used for the >MAX_KERNEL_LOG stages a single
    kernel block cannot hold — one fused HBM pass each. ttl/tth: the packed
    full-length stage-twiddle column (log_m * m, 1)."""
    m = 1 << log_m
    half = 1 << s
    blocks = m // (2 * half)
    L = lo.shape[-1]
    # packed rows [s*m, s*m+half) are exactly tw_s[j], j < half
    twl = ttl[s * m:s * m + half].reshape(1, half, 1)
    twh = tth[s * m:s * m + half].reshape(1, half, 1)
    lo4 = lo.reshape(blocks, 2, half, L)
    hi4 = hi.reshape(blocks, 2, half, L)
    even = (lo4[:, 0], hi4[:, 0])
    odd = (lo4[:, 1], hi4[:, 1])
    t = gl64.mul(odd, (jnp.broadcast_to(twl, odd[0].shape),
                       jnp.broadcast_to(twh, odd[1].shape)))
    top = gl64.add(even, t)
    bot = gl64.sub(even, t)
    lo = jnp.stack([top[0], bot[0]], axis=1).reshape(m, L)
    hi = jnp.stack([top[1], bot[1]], axis=1).reshape(m, L)
    return lo, hi


def _small_ntt(lo, hi, twl, twh, g, log_m: int, ttl=None, tth=None):
    """(m, L) -> (m, L): length-m transforms down the sublanes, one grid
    program per lane tile. g = (glo, ghi) (1, L) enables the four-step
    twiddle; None for the plain second transform.

    The kernel runs the first ks = min(log_m, MAX_KERNEL_LOG) stages: with
    bit-reversed input those are independent per contiguous 2^ks-row block
    (and their stage twiddles equal the length-2^ks tables), so the grid
    tiles the sublane axis too. Remaining cross-block stages run as fused
    jnp passes via _tail_stage (needs ttl/tth; g requires log_m <= ks)."""
    ks = min(log_m, MAX_KERNEL_LOG)
    mk = 1 << ks
    m = 1 << log_m
    assert g is None or log_m <= MAX_KERNEL_LOG
    L = lo.shape[-1]
    tile = min(_tile_for(ks), max(128, L))
    pad = (-L) % tile
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
    Lp = lo.shape[-1]
    tw_spec = pl.BlockSpec((ks * mk, 1), lambda h, i: (0, 0),
                           memory_space=pltpu.VMEM)
    dat_spec = pl.BlockSpec((mk, tile), lambda h, i: (h, i),
                            memory_space=pltpu.VMEM)
    if g is None:
        kern = functools.partial(_kernel_plain, log_m=ks)
        in_specs = [tw_spec, tw_spec, dat_spec, dat_spec]
        args = (twl, twh, lo, hi)
    else:
        glo, ghi = g
        if pad:
            glo = jnp.pad(glo, ((0, 0), (0, pad)))
            ghi = jnp.pad(ghi, ((0, 0), (0, pad)))
        g_spec = pl.BlockSpec((1, tile), lambda h, i: (0, i),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel_tw, log_m=ks)
        in_specs = [tw_spec, tw_spec, g_spec, g_spec, dat_spec, dat_spec]
        args = (twl, twh, glo, ghi, lo, hi)
    out_lo, out_hi = pl.pallas_call(
        kern,
        grid=(m // mk, Lp // tile),
        in_specs=in_specs,
        out_specs=[dat_spec, dat_spec],
        out_shape=[jax.ShapeDtypeStruct((m, Lp), _U32)] * 2,
        # mul-heavy stage bodies spill wide u32 temporaries; the default
        # 16MB scoped cap is too tight at (4096, 128) tiles — v5e VMEM is
        # far larger, so let Mosaic use it.
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*args)
    for s in range(ks, log_m):
        out_lo, out_hi = _tail_stage(out_lo, out_hi, s, log_m, ttl, tth)
    return out_lo[:, :L], out_hi[:, :L]


# ---------------------------------------------------------------------------
# Four-step orchestration (XLA gathers around the two kernels)
# ---------------------------------------------------------------------------

def _fourstep_core(lo, hi, brev2, brev1, tw2l, tw2h, tw1l, tw1h, tt1l, tt1h,
                   glo, ghi, log_n: int, log_n2: int):
    """(b, n) -> (b, n) NTT; tables passed as runtime args (never embedded —
    the same 100MB-constant pitfall core/ntt.py's shells avoid)."""
    b = lo.shape[0]
    n = 1 << log_n
    n2 = 1 << log_n2
    n1 = n >> log_n2
    # step 1: matrix view x[bb, a*n1 + c] -> A[a(bit-rev), bb*n1 + c]
    lo3 = jnp.take(lo.reshape(b, n2, n1), brev2, axis=1)
    hi3 = jnp.take(hi.reshape(b, n2, n1), brev2, axis=1)
    Alo = jnp.moveaxis(lo3, 1, 0).reshape(n2, b * n1)
    Ahi = jnp.moveaxis(hi3, 1, 0).reshape(n2, b * n1)
    # step 2: length-n2 transforms + four-step twiddle w_N^(c * k2)
    Ylo, Yhi = _small_ntt(Alo, Ahi, tw2l, tw2h, (glo, ghi), log_n2)
    # step 3: regroup for the n1-axis: B[c(bit-rev), bb*n2 + k2]
    Blo = jnp.take(jnp.transpose(Ylo.reshape(n2, b, n1), (2, 1, 0)),
                   brev1, axis=0).reshape(n1, b * n2)
    Bhi = jnp.take(jnp.transpose(Yhi.reshape(n2, b, n1), (2, 1, 0)),
                   brev1, axis=0).reshape(n1, b * n2)
    # step 4: length-n1 transforms
    Clo, Chi = _small_ntt(Blo, Bhi, tw1l, tw1h, None, log_n - log_n2,
                          tt1l, tt1h)
    # step 5: C[k1, bb*n2 + k2] -> X[bb, k1*n2 + k2]
    Xlo = jnp.transpose(Clo.reshape(n1, b, n2), (1, 0, 2)).reshape(b, n)
    Xhi = jnp.transpose(Chi.reshape(n1, b, n2), (1, 0, 2)).reshape(b, n)
    return Xlo, Xhi


@functools.partial(jax.jit, static_argnums=(12, 13))
def _fourstep_jit(lo, hi, brev2, brev1, tw2l, tw2h, tw1l, tw1h, tt1l, tt1h,
                  glo, ghi, log_n: int, log_n2: int):
    return _fourstep_core(lo, hi, brev2, brev1, tw2l, tw2h, tw1l, tw1h,
                          tt1l, tt1h, glo, ghi, log_n, log_n2)


def _split(log_n: int) -> int:
    """log_n2 (first-kernel transform size). Balanced, but capped at
    MAX_KERNEL_LOG: the four-step twiddle runs inside kernel 1, so that
    transform must fit a single block; kernel 2 spills its cross-block
    stages to _tail_stage passes instead."""
    return min(log_n // 2, MAX_KERNEL_LOG)


def _tables(log_n: int, b: int, inverse: bool):
    log_n2 = _split(log_n)
    log_n1 = log_n - log_n2
    n1 = 1 << log_n1
    lanes = b * n1
    tile = min(_tile_for(log_n2), max(128, lanes))
    lanes_p = lanes + ((-lanes) % tile)
    tag = "i" if inverse else "f"
    log_k1 = min(log_n1, MAX_KERNEL_LOG)
    tw2 = _dev_col(("ptw", log_n2, tag),
                   lambda: _stage_twiddle_cols(log_n2, inverse))
    tw1 = _dev_col(("ptw", log_k1, tag),
                   lambda: _stage_twiddle_cols(log_k1, inverse))
    # full-length packed column for kernel 2's cross-block tail stages
    # (equals tw1 when log_n1 <= MAX_KERNEL_LOG; tail loop is then empty)
    tt1 = _dev_col(("ptw", log_n1, tag),
                   lambda: _stage_twiddle_cols(log_n1, inverse))
    gpair = _dev_col(("pg", log_n, log_n2, b, lanes_p, tag),
                     lambda: _gcol(log_n, log_n2, b, lanes_p, inverse))
    # g rides lanes, not sublanes: reshape the cached column to a row
    glo, ghi = gpair[0].reshape(1, -1)[:, :lanes], \
        gpair[1].reshape(1, -1)[:, :lanes]
    return (jntt._dev_perm(log_n2), jntt._dev_perm(log_n1),
            tw2[0], tw2[1], tw1[0], tw1[1], tt1[0], tt1[1], glo, ghi,
            log_n2)


def _run(x, log_n: int, inverse: bool):
    lo, hi = x
    shape = lo.shape
    n = 1 << log_n
    assert shape[-1] == n
    b = int(np.prod(shape[:-1], dtype=np.int64)) if len(shape) > 1 else 1
    lo2, hi2 = lo.reshape(b, n), hi.reshape(b, n)
    (brev2, brev1, tw2l, tw2h, tw1l, tw1h, tt1l, tt1h, glo, ghi,
     log_n2) = _tables(log_n, b, inverse)
    olo, ohi = _fourstep_jit(lo2, hi2, brev2, brev1, tw2l, tw2h, tw1l,
                             tw1h, tt1l, tt1h, glo, ghi, log_n, log_n2)
    return olo.reshape(shape), ohi.reshape(shape)


# ---------------------------------------------------------------------------
# Public entry points (drop-in twins of core/ntt.py)
# ---------------------------------------------------------------------------

def ntt(x, log_n: int):
    return _run(x, log_n, inverse=False)


@functools.partial(jax.jit, static_argnums=(2,))
def _scale_const_jit(lo, hi, c: int):
    c_lo = jnp.full_like(lo, np.uint32(c & 0xFFFFFFFF))
    c_hi = jnp.full_like(hi, np.uint32(c >> 32))
    return gl64.mul((lo, hi), (c_lo, c_hi))


def intt(x, log_n: int):
    lo, hi = _run(x, log_n, inverse=True)
    return _scale_const_jit(lo, hi, gl64.h_inverse(1 << log_n))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _coset_scale_pad_jit(lo, hi, c_lo, c_hi, log_n: int, rate_bits: int):
    n = 1 << log_n
    m = n << rate_bits
    s = gl64.mul((lo, hi), (jnp.broadcast_to(c_lo, lo.shape),
                            jnp.broadcast_to(c_hi, hi.shape)))
    pad = [(0, 0)] * (lo.ndim - 1) + [(0, m - n)]
    return jnp.pad(s[0], pad), jnp.pad(s[1], pad)


def coset_lde(coeffs, log_n: int, rate_bits: int,
              shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """coeffs (..., 2^log_n) -> evals (..., 2^(log_n+rate_bits)) on the
    coset shift*<w> — the bench/prover hot path, Pallas end to end."""
    assert coeffs[0].shape[-1] == 1 << log_n
    sh = shift % gl64.P
    c_lo, c_hi = jntt._dev_pair(("coset", log_n, sh),
                                lambda: jntt._coset_powers(log_n, sh))
    lo, hi = _coset_scale_pad_jit(coeffs[0], coeffs[1], c_lo, c_hi,
                                  log_n, rate_bits)
    return ntt((lo, hi), log_n + rate_bits)


def coset_intt(evals, log_m: int,
               shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    inv_shift = gl64.h_inverse(shift % gl64.P)
    s_lo, s_hi = jntt._dev_pair(("coset", log_m, inv_shift),
                                lambda: jntt._coset_powers(log_m, inv_shift))
    lo, hi = intt(evals, log_m)
    return _mul_table_jit(lo, hi, s_lo, s_hi)


@jax.jit
def _mul_table_jit(lo, hi, t_lo, t_hi):
    return gl64.mul((lo, hi), (jnp.broadcast_to(t_lo, lo.shape),
                               jnp.broadcast_to(t_hi, hi.shape)))
