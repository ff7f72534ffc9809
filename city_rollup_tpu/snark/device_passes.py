"""Device-resident prover passes, jitted per (circuit, batch) shape.

Round-4 profiling showed a warm prove spending ~60% in many small device
dispatches and ~25% in host numpy (`gl64.np_mul` in the permutation and
quotient passes). These functions port those passes to the jnp/gl64 pair
API — one fused XLA graph each for

  * the permutation-argument columns (Z + partial products, incl. the
    batched modular inverse and the Hillis-Steele cumulative product),
  * the constraint/quotient evaluation over the LDE domain (the gates'
    algebra-generic `eval_alg` running under `JnpAlg`), and
  * the FRI reduced-codeword combination (alpha-power matvec + the
    (x - zeta)^-1 extension division),

mirroring plonky2's in-crate quotient loop (SURVEY.md §3.1 HOT LOOPS).
Numerics are bit-identical to the numpy twins in snark/prover.py (CI
cross-checks with CITY_DEVICE_PASSES=1 on CPU).

Dispatch: the numpy twins stay the default on the CPU test backend (numpy
is fast there and jit compiles are not); a real TPU — or the forcing env —
routes through these.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core import gl64, gl64_ext, ntt
from .algebra import JnpAlg, lift_jnp

P = gl64.P


def enabled() -> bool:
    if os.environ.get("CITY_NO_DEVICE_PASSES"):
        return False
    if os.environ.get("CITY_DEVICE_PASSES"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _bc(pair, shape):
    return (jnp.broadcast_to(pair[0], shape), jnp.broadcast_to(pair[1], shape))


def _pair_const(arr_u64: np.ndarray):
    a = np.asarray(arr_u64, dtype=np.uint64)
    return (jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))


def _cumprod_mod(pair):
    """Inclusive cumulative product mod p along the last axis (Hillis-
    Steele, log n batched mul passes — device twin of np_cumprod_mod)."""
    lo, hi = pair
    n = lo.shape[-1]
    s = 1
    while s < n:
        ones = gl64.full(lo.shape[:-1] + (s,), 1)
        sh = (jnp.concatenate([ones[0], lo[..., :-s]], axis=-1),
              jnp.concatenate([ones[1], hi[..., :-s]], axis=-1))
        lo, hi = gl64.mul((lo, hi), sh)
        s <<= 1
    return lo, hi


# ---------------------------------------------------------------------------
# Permutation-argument columns (prover step 3)
# ---------------------------------------------------------------------------

_PERM_CACHE: dict = {}


def perm_zs_pp(common, prover_data, wires_b: np.ndarray,
               betas: list, gammas: list, shard=None):
    """(B, W, n) u64 wire matrices -> zs_pp (lo, hi) pair of shape
    (B, nc*(1+npp), n), challenge-major ([Z_c...] then [pp_{c,j}...]) —
    bit-identical to the numpy loop in prove_batch step 3.

    betas/gammas: challenge-major lists of (B,) u64 arrays.
    """
    cfg = common.config
    key = (id(common), wires_b.shape)
    fn = _PERM_CACHE.get(key)
    if fn is None:
        fn = _make_perm_fn(common, prover_data)
        _PERM_CACHE[key] = (common, fn)      # keep common alive for id()
    else:
        fn = fn[1]
    b_pair = _pair_const(np.stack(betas))     # (nc, B)
    g_pair = _pair_const(np.stack(gammas))
    w_pair = gl64.from_u64(wires_b)
    if shard is not None:
        w_pair = shard(w_pair)
    return fn(w_pair, b_pair, g_pair)


def _make_perm_fn(common, prover_data):
    cfg = common.config
    R = cfg.num_routed_wires
    cs = cfg.perm_chunk_size
    nchunks = cfg.num_perm_chunks
    npp = cfg.num_partial_products
    nc = cfg.num_challenges
    n = common.n
    sig_pair = _pair_const(prover_data.sigmas)          # (R, n)
    x_pair = _pair_const(prover_data.subgroup)          # (n,)
    k_pair = _pair_const(np.array(common.k_is, dtype=np.uint64)
                         .reshape(R, 1))                # (R, 1)

    @jax.jit
    def fn(wires_pair, betas_pair, gammas_pair):
        wlo, whi = wires_pair
        B = wlo.shape[0]
        w = (wlo[:, :R, :], whi[:, :R, :])              # (B, R, n)
        shape = (B, R, n)
        zs_rows, pp_rows = [], []
        for c in range(nc):
            beta = (betas_pair[0][c][:, None, None],
                    betas_pair[1][c][:, None, None])    # (B, 1, 1)
            gamma = (gammas_pair[0][c][:, None, None],
                     gammas_pair[1][c][:, None, None])
            bk = gl64.mul(_bc(beta, (B, R, 1)), _bc(k_pair, (B, R, 1)))
            bkx = gl64.mul(_bc(bk, shape), _bc(x_pair, shape))
            nums = gl64.add(gl64.add(w, bkx), _bc(gamma, shape))
            bs = gl64.mul(_bc(sig_pair, shape), _bc(beta, shape))
            dens = gl64.add(gl64.add(w, bs), _bc(gamma, shape))
            ratios = gl64.mul(nums, gl64.inverse(dens))
            pad = nchunks * cs - R
            if pad:
                ones = gl64.full((B, pad, n), 1)
                ratios = (jnp.concatenate([ratios[0], ones[0]], axis=1),
                          jnp.concatenate([ratios[1], ones[1]], axis=1))
            r4 = (ratios[0].reshape(B, nchunks, cs, n),
                  ratios[1].reshape(B, nchunks, cs, n))
            cp = (r4[0][:, :, 0, :], r4[1][:, :, 0, :])  # (B, nchunks, n)
            for i in range(1, cs):
                cp = gl64.mul(cp, (r4[0][:, :, i, :], r4[1][:, :, i, :]))
            row_prod = (cp[0][:, 0, :], cp[1][:, 0, :])
            for j in range(1, nchunks):
                row_prod = gl64.mul(row_prod,
                                    (cp[0][:, j, :], cp[1][:, j, :]))
            cum = _cumprod_mod(row_prod)                 # (B, n)
            one_col = gl64.full((B, 1), 1)
            z = (jnp.concatenate([one_col[0], cum[0][:, :-1]], axis=1),
                 jnp.concatenate([one_col[1], cum[1][:, :-1]], axis=1))
            zs_rows.append(z)
            run = z
            for j in range(npp):
                run = gl64.mul(run, (cp[0][:, j, :], cp[1][:, j, :]))
                pp_rows.append(run)
        rows = zs_rows + pp_rows
        return (jnp.stack([r[0] for r in rows], axis=1),
                jnp.stack([r[1] for r in rows], axis=1))

    return fn


# ---------------------------------------------------------------------------
# Constraint / quotient evaluation (prover step 4)
# ---------------------------------------------------------------------------

_QUOT_CACHE: dict = {}


def quotient_coeffs(common, ldes_pairs: dict, betas, gammas, alphas,
                    pi_cols):
    """Device twin of prover.compute_quotients. ldes_pairs values are
    (lo, hi) pairs: "csv" (S, M), "wires" (B, W, M), "zs_pp"
    (B, nc*(1+npp), M). Returns q_coeffs pair of shape (B, nc*chunks, n).

    betas/gammas/alphas: challenge-major lists of (B,) u64 arrays; pi_cols:
    list of 4 (B,) u64 arrays.
    """
    key = (id(common), ldes_pairs["wires"][0].shape)
    ent = _QUOT_CACHE.get(key)
    if ent is None:
        fn = _make_quotient_fn(common)
        _QUOT_CACHE[key] = (common, fn)
    else:
        fn = ent[1]
    b_pair = _pair_const(np.stack(betas))
    g_pair = _pair_const(np.stack(gammas))
    a_pair = _pair_const(np.stack(alphas))
    pi_pair = _pair_const(np.stack(pi_cols))            # (4, B)
    return fn(ldes_pairs["csv"], ldes_pairs["wires"], ldes_pairs["zs_pp"],
              b_pair, g_pair, a_pair, pi_pair)


def _make_quotient_fn(common):
    from .prover import _lde_points_cached, _l0_lde, _zh_inv_lde
    cfg = common.config
    R = cfg.num_routed_wires
    cs = cfg.perm_chunk_size
    nchunks = cfg.num_perm_chunks
    npp = cfg.num_partial_products
    nc = cfg.num_challenges
    n = common.n
    rate = 1 << cfg.rate_bits
    M = n << cfg.rate_bits
    num_sel = common.num_sel_cols
    k_is = common.k_is
    x_pair = _pair_const(_lde_points_cached(common.log_n + cfg.rate_bits))
    l0_pair = _pair_const(_l0_lde(common.log_n, cfg.rate_bits))
    zh_pair = _pair_const(_zh_inv_lde(common.log_n, cfg.rate_bits))

    @jax.jit
    def fn(csv, wires, zs_pp, betas_pair, gammas_pair, alphas_pair,
           pi_pair):
        B = wires[0].shape[0]
        dom = (B, M)
        one = gl64.full(dom, 1)
        wire_list = [(wires[0][:, i, :], wires[1][:, i, :])
                     for i in range(wires[0].shape[1])]
        const_list = [(csv[0][num_sel + i], csv[1][num_sel + i])
                      for i in range(cfg.num_constants)]
        sel_list = [(csv[0][i], csv[1][i]) for i in range(num_sel)]
        sig_list = [(csv[0][num_sel + cfg.num_constants + i],
                     csv[1][num_sel + cfg.num_constants + i])
                    for i in range(R)]
        pi_list = [(pi_pair[0][i][:, None], pi_pair[1][i][:, None])
                   for i in range(4)]
        out_lo, out_hi = [], []
        for c in range(nc):
            beta = (betas_pair[0][c][:, None], betas_pair[1][c][:, None])
            gamma = (gammas_pair[0][c][:, None], gammas_pair[1][c][:, None])
            alpha = (alphas_pair[0][c][:, None], alphas_pair[1][c][:, None])
            z = (zs_pp[0][:, c, :], zs_pp[1][:, c, :])
            pps = [(zs_pp[0][:, nc + c * npp + j, :],
                    zs_pp[1][:, nc + c * npp + j, :]) for j in range(npp)]
            z_next = (jnp.roll(z[0], -rate, axis=-1),
                      jnp.roll(z[1], -rate, axis=-1))

            acc = gl64.zeros(dom)
            apow = one

            def emit(term, acc, apow):
                acc = gl64.add(acc, gl64.mul(term, _bc(apow, dom)))
                apow = gl64.mul(apow, _bc(alpha, apow[0].shape))
                return acc, apow

            term0 = gl64.mul(_bc(l0_pair, dom), gl64.sub(z, one))
            acc, apow = emit(term0, acc, apow)

            for j in range(nchunks):
                cols = range(j * cs, min((j + 1) * cs, R))
                num = one
                den = one
                for i in cols:
                    w_i = _bc(wire_list[i], dom)
                    bk = JnpAlg.cmul(k_is[i], beta)
                    bkx = gl64.mul(_bc(x_pair, dom), _bc(bk, dom))
                    n_i = gl64.add(gl64.add(w_i, bkx), _bc(gamma, dom))
                    bs = gl64.mul(_bc(sig_list[i], dom), _bc(beta, dom))
                    d_i = gl64.add(gl64.add(w_i, bs), _bc(gamma, dom))
                    num = gl64.mul(num, n_i)
                    den = gl64.mul(den, d_i)
                prev = z if j == 0 else pps[j - 1]
                nxt = z_next if j == nchunks - 1 else pps[j]
                term = gl64.sub(gl64.mul(nxt, den), gl64.mul(prev, num))
                acc, apow = emit(term, acc, apow)

            for gid, gate in enumerate(common.gates):
                group = common.gate_group(gid)
                sel = _bc(sel_list[group], dom)
                filt = one
                for t in common.filter_terms(gid):
                    filt = gl64.mul(filt, gl64.sub(
                        sel, gl64.full(dom, t % P)))
                wires_bc = [_bc(w, dom) for w in wire_list]
                consts_bc = [_bc(cst, dom) for cst in const_list]
                pi_bc = [_bc(p, dom) for p in pi_list]
                if hasattr(gate, "eval_jnp_vec"):
                    # compact traced graph (PoseidonGate unrolls to ~600k
                    # ops under the generic algebra — see eval_jnp_vec)
                    cvals = gate.eval_jnp_vec(wires_bc, consts_bc, pi_bc)
                else:
                    cvals = gate.eval_alg(wires_bc, consts_bc, pi_bc,
                                          JnpAlg)
                for cv in cvals:
                    acc, apow = emit(gl64.mul(filt, cv), acc, apow)

            q_lde = gl64.mul(acc, _bc(zh_pair, dom))
            cf = ntt.coset_intt(q_lde, common.log_n + cfg.rate_bits)
            for j in range(cfg.quotient_chunks):
                out_lo.append(cf[0][..., j * n:(j + 1) * n])
                out_hi.append(cf[1][..., j * n:(j + 1) * n])
        return jnp.stack(out_lo, axis=-2), jnp.stack(out_hi, axis=-2)

    return fn


# ---------------------------------------------------------------------------
# FRI reduced-codeword combination (prover step 6)
# ---------------------------------------------------------------------------

_CW_CACHE: dict = {}


def reduced_codeword(common, all_ldes_pair, zs_pp_pair, apows0, apows1,
                     y0s, y1s, zetas, gzetas):
    """F = (sum_i apow_i * lde_i - y0) / (x - zeta)
         + (sum_c apow'_c * Z_c - y1) / (x - g zeta), on device.

    all_ldes_pair: (B, K, M) pair; zs_pp_pair: (B, nc*(1+npp), M) pair.
    apows0: (B, K, 2) u64 ext alpha powers; apows1: (B, nc, 2);
    y0s/y1s: (B, 2); zetas/gzetas: (B, 2). Returns (B, M) ext pair.
    """
    key = (id(common), all_ldes_pair[0].shape)
    ent = _CW_CACHE.get(key)
    if ent is None:
        fn = _make_codeword_fn(common)
        _CW_CACHE[key] = (common, fn)
    else:
        fn = ent[1]
    return fn(all_ldes_pair, zs_pp_pair,
              _pair_const(apows0), _pair_const(apows1),
              _pair_const(y0s), _pair_const(y1s),
              _pair_const(zetas), _pair_const(gzetas))


def _make_codeword_fn(common):
    from .prover import _lde_points_cached
    cfg = common.config
    nc = cfg.num_challenges
    M = common.n << cfg.rate_bits
    x_pair = _pair_const(_lde_points_cached(common.log_n + cfg.rate_bits))

    def _matvec(mat_pair, coef_pair):
        """sum_i coef[:, i] * mat[:, i, :] mod p -> (B, M) pair."""
        K = mat_pair[0].shape[1]
        acc = gl64.zeros((mat_pair[0].shape[0], mat_pair[0].shape[2]))
        for i in range(K):
            row = (mat_pair[0][:, i, :], mat_pair[1][:, i, :])
            cf = (coef_pair[0][:, i][:, None], coef_pair[1][:, i][:, None])
            acc = gl64.add(acc, gl64.mul(row, _bc(cf, row[0].shape)))
        return acc

    @jax.jit
    def fn(all_ldes, zs_pp, ap0, ap1, y0, y1, zetas, gzetas):
        B = all_ldes[0].shape[0]
        dom = (B, M)
        # batch 0: G0 = sum apow_i * lde_i (ext coeff x base row — two
        # base matvecs, one per ext component)
        g0_a = _matvec(all_ldes, (ap0[0][..., 0], ap0[1][..., 0]))
        g0_b = _matvec(all_ldes, (ap0[0][..., 1], ap0[1][..., 1]))
        zrows = (zs_pp[0][:, :nc, :], zs_pp[1][:, :nc, :])
        g1_a = _matvec(zrows, (ap1[0][..., 0], ap1[1][..., 0]))
        g1_b = _matvec(zrows, (ap1[0][..., 1], ap1[1][..., 1]))
        xe = (_bc(x_pair, dom), gl64.zeros(dom))
        z_e = ((_bc((zetas[0][:, 0][:, None], zetas[1][:, 0][:, None]), dom)),
               (_bc((zetas[0][:, 1][:, None], zetas[1][:, 1][:, None]), dom)))
        gz_e = ((_bc((gzetas[0][:, 0][:, None], gzetas[1][:, 0][:, None]),
                     dom)),
                (_bc((gzetas[0][:, 1][:, None], gzetas[1][:, 1][:, None]),
                     dom)))
        inv0 = gl64_ext.inverse(gl64_ext.sub(xe, z_e))
        inv1 = gl64_ext.inverse(gl64_ext.sub(xe, gz_e))
        y0e = ((_bc((y0[0][:, 0][:, None], y0[1][:, 0][:, None]), dom)),
               (_bc((y0[0][:, 1][:, None], y0[1][:, 1][:, None]), dom)))
        y1e = ((_bc((y1[0][:, 0][:, None], y1[1][:, 0][:, None]), dom)),
               (_bc((y1[0][:, 1][:, None], y1[1][:, 1][:, None]), dom)))
        num0 = gl64_ext.sub((g0_a, g0_b), y0e)
        num1 = gl64_ext.sub((g1_a, g1_b), y1e)
        F = gl64_ext.add(gl64_ext.mul(num0, inv0),
                         gl64_ext.mul(num1, inv1))
        return F

    return fn
