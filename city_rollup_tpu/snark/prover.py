"""The PLONK+FRI prover: witness -> proof, with every polynomial-sized pass
batched on device (LDE NTTs, Merkle hashing, constraint/quotient evaluation,
FRI folds) and the irregular glue (transcript, cycle products bookkeeping)
vectorized on host.

Reference role: plonky2 `CircuitData::prove` — the hot loop the whole
city-rollup worker fleet spends its time in (SURVEY.md §3.1 "HOT LOOPS").
"""

from __future__ import annotations

import dataclasses

import numpy as np

import functools

from ..core import fri, gl64, gl64_ext, merkle, ntt
from ..core.challenger import Challenger
from .circuit import (CircuitData, PartialWitness, generate_witness,
                      interp_and_lde)

P = gl64.P


# ---------------------------------------------------------------------------
# Proof objects
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class OpeningSet:
    constants_sigmas: list      # ext (int,int) per preprocessing poly
    wires: list
    zs: list                    # Z_c(zeta)
    pps: list                   # partial products (challenge-major)
    quotient: list              # chunks (challenge-major)
    zs_next: list               # Z_c(g*zeta)

    def flat(self):
        return (self.constants_sigmas + self.wires + self.zs + self.pps +
                self.quotient + self.zs_next)


@dataclasses.dataclass
class InitialTreeOpening:
    values: list[list[int]]     # per tree: leaf row (all polys at the index)
    paths: list[list[list[int]]]


@dataclasses.dataclass
class Proof:
    public_inputs: list[int]
    wires_cap: np.ndarray
    zs_pp_cap: np.ndarray
    quotient_cap: np.ndarray
    openings: OpeningSet
    fri_proof: fri.FriProof
    initial_openings: list[InitialTreeOpening]   # one per query round


# ---------------------------------------------------------------------------
# Host helpers
# ---------------------------------------------------------------------------

def _blinding_rows(num_wires: int, nb: int) -> np.ndarray:
    """CSPRNG blinding values, uniform mod p via a 128-bit fold per felt
    (2^128 mod-p bias ~2^-64 — vs the 2^-32 bias of a raw u64 % p)."""
    import secrets
    raw = np.frombuffer(secrets.token_bytes(16 * num_wires * nb),
                        dtype=np.uint64).reshape(num_wires, nb, 2)
    # hi * 2^64 + lo == hi * EPSILON + lo (mod p)
    return gl64.np_add(gl64.np_mul(raw[..., 1], np.uint64(gl64.EPSILON)),
                       raw[..., 0] % np.uint64(P))


SALT_WIDTH = 4      # salt felts per committed leaf in zk mode (plonky2 SALT_SIZE)


def _salt_rows(m: int, batch: int | None = None) -> np.ndarray:
    """CSPRNG salt columns ((4, M) or (B, 4, M)) for zk-mode Merkle leaves:
    every leaf of the wires / zs_pp / quotient trees gets 4 fresh random
    felts, making the Merkle openings at FRI query indices statistically
    independent of the witness (plonky2's salted commitments; completes the
    zk config together with the wire blinding rows — ADVICE r4 #3)."""
    import secrets
    shape = (SALT_WIDTH, m) if batch is None else (batch, SALT_WIDTH, m)
    raw = np.frombuffer(secrets.token_bytes(16 * int(np.prod(shape))),
                        dtype=np.uint64).reshape(shape + (2,))
    return gl64.np_add(gl64.np_mul(raw[..., 1], np.uint64(gl64.EPSILON)),
                       raw[..., 0] % np.uint64(P))


def public_inputs_hash(pis: list[int]) -> list[int]:
    """<=4 PIs pass through zero-padded; more are Poseidon-hashed (matches
    CircuitBuilder.build's public-input wiring)."""
    from ..core import poseidon_host
    pis = [int(v) % P for v in pis]
    if len(pis) > 4:
        return poseidon_host.hash_no_pad(pis)
    return (pis + [0, 0, 0, 0])[:4]

def np_cumprod_mod(a: np.ndarray) -> np.ndarray:
    """Inclusive cumulative product mod p along the last axis (Hillis-Steele,
    O(n log n) vectorized muls)."""
    a = np.array(a, dtype=np.uint64)
    n = a.shape[-1]
    s = 1
    while s < n:
        shifted = np.concatenate(
            [np.ones(a.shape[:-1] + (s,), dtype=np.uint64), a[..., :-s]],
            axis=-1)
        a = gl64.np_mul(a, shifted)
        s <<= 1
    return a


def np_ext_horner(coeffs: np.ndarray, point: tuple[int, int]) -> list:
    """Evaluate B base-coefficient polys (B, n) at one extension point.
    Vectorized over B; returns list of (int, int)."""
    b, n = coeffs.shape
    acc0 = np.zeros(b, dtype=np.uint64)
    acc1 = np.zeros(b, dtype=np.uint64)
    z = (np.uint64(point[0]), np.uint64(point[1]))
    for i in range(n - 1, -1, -1):
        acc0, acc1 = gl64_ext.np_ext_mul(
            (acc0, acc1), (np.broadcast_to(z[0], acc0.shape),
                           np.broadcast_to(z[1], acc1.shape)))
        acc0 = gl64.np_add(acc0, coeffs[:, i])
    return [(int(acc0[i]), int(acc1[i])) for i in range(b)]


def np_ext_horner_batch(coeffs: np.ndarray, points: list) -> np.ndarray:
    """Evaluate (B, K, n) coefficient polys at per-batch extension points
    (B of them). Returns (B, K, 2) uint64."""
    bsz, k, n = coeffs.shape
    z0 = np.array([p[0] for p in points], dtype=np.uint64).reshape(bsz, 1)
    z1 = np.array([p[1] for p in points], dtype=np.uint64).reshape(bsz, 1)
    acc0 = np.zeros((bsz, k), dtype=np.uint64)
    acc1 = np.zeros((bsz, k), dtype=np.uint64)
    for i in range(n - 1, -1, -1):
        acc0, acc1 = gl64_ext.np_ext_mul(
            (acc0, acc1), (np.broadcast_to(z0, acc0.shape),
                           np.broadcast_to(z1, acc1.shape)))
        acc0 = gl64.np_add(acc0, coeffs[:, :, i])
    return np.stack([acc0, acc1], axis=-1)


@functools.lru_cache(maxsize=None)
def _lde_points_cached(log_m: int) -> np.ndarray:
    w = gl64.h_primitive_root_of_unity(log_m)
    pows = gl64.np_powers(w, 1 << log_m)
    return gl64.np_mul(pows, np.uint64(gl64.MULTIPLICATIVE_GROUP_GENERATOR))


@functools.lru_cache(maxsize=None)
def _zh_inv_lde(log_n: int, rate_bits: int) -> np.ndarray:
    """(x^n - 1)^-1 over the LDE coset ((M,), 2^rate-periodic)."""
    n, M = 1 << log_n, 1 << (log_n + rate_bits)
    x = _lde_points_cached(log_n + rate_bits)
    xn = gl64.np_pow(x[: 1 << rate_bits], n)        # periodic: first period
    vals = gl64.np_sub(xn, np.ones_like(xn))
    inv = gl64.np_inverse(vals)
    return np.tile(inv, M >> rate_bits)


@functools.lru_cache(maxsize=None)
def _l0_lde(log_n: int, rate_bits: int) -> np.ndarray:
    """L_0(x) = (x^n - 1) / (n (x - 1)) over the LDE coset."""
    n, M = 1 << log_n, 1 << (log_n + rate_bits)
    x = _lde_points_cached(log_n + rate_bits)
    zh = gl64.np_sub(gl64.np_pow(x, n), np.ones(M, dtype=np.uint64))
    den = gl64.np_mul(gl64.np_sub(x, np.ones(M, dtype=np.uint64)),
                      np.full(M, n % P, dtype=np.uint64))
    return gl64.np_mul(zh, gl64.np_inverse(den))


# ---------------------------------------------------------------------------
# Quotient evaluation (host-vectorized numpy; device offload via the same
# gl64 API is shape-identical and lands with the Pallas kernels)
# ---------------------------------------------------------------------------

def _as_col(v):
    """Scalar int -> 0-d uint64; per-batch (B,) array -> (B, 1) column
    broadcastable against (B, M) domain arrays (batched proving)."""
    if isinstance(v, np.ndarray):
        return v.reshape(v.shape[0], 1).astype(np.uint64)
    return np.uint64(v % P)


def _constraint_terms(common, ldes: dict, betas, gammas, pi_hash,
                      challenge: int):
    """Yield the canonical-order constraint evaluations over the LDE domain
    for one challenge index: [L0*(Z-1)] + chunk constraints + gate
    constraints (filtered). Domain arrays are (M,) uint64 — or (B, M) when
    batched, with betas/gammas/pi_hash entries as (B,) arrays."""
    cfg = common.config
    R = cfg.num_routed_wires
    cs = cfg.perm_chunk_size
    num_chunks = cfg.num_perm_chunks
    rate = 1 << cfg.rate_bits
    M = common.n << cfg.rate_bits

    x = _lde_points_cached(common.log_n + cfg.rate_bits)
    l0 = _l0_lde(common.log_n, cfg.rate_bits)
    beta = _as_col(betas[challenge])
    gamma = _as_col(gammas[challenge])
    k_is = common.k_is

    z = ldes["zs"][challenge]                    # (..., M)
    pps = ldes["pps"][challenge]                 # (npp, ..., M)
    z_next = np.roll(z, -rate, axis=-1)

    terms = []
    one = np.ones(M, dtype=np.uint64)
    terms.append(gl64.np_mul(l0, gl64.np_sub(z, one)))

    for j in range(num_chunks):
        cols = range(j * cs, min((j + 1) * cs, R))
        num = one
        den = one
        for i in cols:
            w_i = ldes["wires"][i]
            bkx = gl64.np_mul(x, gl64.np_mul(beta, np.uint64(k_is[i])))
            n_i = gl64.np_add(gl64.np_add(w_i, bkx), gamma)
            bs = gl64.np_mul(ldes["sigmas"][i], beta)
            d_i = gl64.np_add(gl64.np_add(w_i, bs), gamma)
            num = gl64.np_mul(num, n_i)
            den = gl64.np_mul(den, d_i)
        prev = z if j == 0 else pps[j - 1]
        nxt = z_next if j == num_chunks - 1 else pps[j]
        terms.append(gl64.np_sub(gl64.np_mul(nxt, den),
                                 gl64.np_mul(prev, num)))

    # gate constraints
    for gid, gate in enumerate(common.gates):
        group = common.gate_group(gid)
        sel = ldes["selectors"][group]
        filt = one
        for t in common.filter_terms(gid):
            filt = gl64.np_mul(filt, gl64.np_sub(
                sel, np.full(M, t % P, dtype=np.uint64)))
        cvals = gate.eval_vec(ldes["wires"], ldes["constants"], pi_hash)
        for cv in cvals:
            terms.append(gl64.np_mul(filt, cv))
    return terms


def compute_quotients(common, ldes: dict, betas, gammas, alphas, pi_hash
                      ) -> np.ndarray:
    """Per challenge: combine constraints with alpha powers, divide by Z_H,
    interpolate, split into `quotient_chunks` degree-n chunks.
    Returns (..., num_challenges * chunks, n) coefficients — the leading
    batch axis rides through every pass when proving a same-shape batch."""
    cfg = common.config
    n = common.n
    M = n << cfg.rate_bits
    zh_inv = _zh_inv_lde(common.log_n, cfg.rate_bits)
    out = []
    for c in range(cfg.num_challenges):
        terms = _constraint_terms(common, ldes, betas, gammas, pi_hash, c)
        acc = np.zeros(M, dtype=np.uint64)
        alpha = _as_col(alphas[c])
        apow = np.uint64(1) if alpha.ndim == 0 else \
            np.ones_like(alpha)
        for t in terms:
            acc = gl64.np_add(acc, gl64.np_mul(t, apow))
            apow = gl64.np_mul(apow, alpha)
        q_lde = gl64.np_mul(acc, zh_inv)
        # interpolate on the coset -> M coefficients, degree < M
        import jax
        cf = ntt.coset_intt(gl64.from_u64(q_lde), common.log_n +
                            cfg.rate_bits)
        jax.block_until_ready(cf)
        coeffs = gl64.to_u64(np.asarray(cf[0]), np.asarray(cf[1]))
        for j in range(cfg.quotient_chunks):
            out.append(coeffs[..., j * n:(j + 1) * n])
    return np.stack(out, axis=-2)


# ---------------------------------------------------------------------------
# Prove
# ---------------------------------------------------------------------------

def prove(data: CircuitData, pw: PartialWitness) -> Proof:
    from . import device_passes
    if device_passes.enabled():
        return _prove_batch_impl(data, [pw])[0]
    common, pd, vd = data.common, data.prover, data.verifier
    cfg = common.config
    n, log_n = common.n, common.log_n
    rate_bits = cfg.rate_bits
    M = n << rate_bits
    R = cfg.num_routed_wires
    nc = cfg.num_challenges
    npp = cfg.num_partial_products
    cap_h = min(cfg.fri.cap_height, log_n + rate_bits)

    # 1. witness + public inputs
    wires = generate_witness(data, pw)                       # (W, n)
    pis = [pw.get(t) or 0 for t in pd.pi_targets]
    pi_hash = public_inputs_hash(pis)

    # zk blinding: fill trailing gate-less padding rows of every wire
    # column with CSPRNG randomness (see CircuitConfig.num_blinding_rows)
    if cfg.num_blinding_rows:
        nb = cfg.num_blinding_rows
        assert all(pd.rows[r] is None for r in range(n - nb, n)), \
            "zk blinding rows must be gate-less padding"
        wires[:, n - nb:] = _blinding_rows(cfg.num_wires, nb)

    # 2. wire commitment (zk: leaves carry 4 salt felts)
    wire_coeffs, wire_ldes = interp_and_lde(wires, log_n, rate_bits)
    salts = {}
    if cfg.zk:
        salts["wires"] = _salt_rows(M)
        wires_leaf = np.concatenate([wire_ldes, salts["wires"]])
    else:
        wires_leaf = wire_ldes
    wires_tree = merkle.MerkleTree(gl64.from_u64(wires_leaf.T), cap_h)
    wires_cap = wires_tree.cap_u64()

    ch = Challenger()
    ch.observe_hash(list(vd.circuit_digest))
    ch.observe_cap(vd.constants_sigmas_cap)
    ch.observe_elements(pi_hash)
    ch.observe_cap(wires_cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)

    # 3. permutation argument columns
    x = pd.subgroup                                          # (n,)
    k_is = common.k_is
    sigmas = pd.sigmas                                       # (R, n)
    zs_rows, pp_rows = [], []
    for c in range(nc):
        beta, gamma = betas[c], gammas[c]
        gamma_v = np.full(n, gamma % P, dtype=np.uint64)
        nums = np.empty((R, n), dtype=np.uint64)
        dens = np.empty((R, n), dtype=np.uint64)
        for i in range(R):
            bkx = gl64.np_mul(x, np.uint64((beta * k_is[i]) % P))
            nums[i] = gl64.np_add(gl64.np_add(wires[i], bkx), gamma_v)
            bs = gl64.np_mul(sigmas[i], np.uint64(beta % P))
            dens[i] = gl64.np_add(gl64.np_add(wires[i], bs), gamma_v)
        ratios = gl64.np_mul(nums, gl64.np_inverse(dens))    # (R, n)
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
        cum = np_cumprod_mod(row_prod)
        z = np.concatenate([np.ones(1, dtype=np.uint64), cum[:-1]])  # Z[0]=1
        zs_rows.append(z)
        run = z
        for j in range(npp):
            run = gl64.np_mul(run, chunk_prod[j])
            pp_rows.append(run)
    zs_pp = np.stack(zs_rows + pp_rows)                      # (nc*(1+npp), n)
    zs_pp_coeffs, zs_pp_ldes = interp_and_lde(zs_pp, log_n, rate_bits)
    if cfg.zk:
        salts["zs_pp"] = _salt_rows(M)
        zs_pp_leaf = np.concatenate([zs_pp_ldes, salts["zs_pp"]])
    else:
        zs_pp_leaf = zs_pp_ldes
    zs_pp_tree = merkle.MerkleTree(gl64.from_u64(zs_pp_leaf.T), cap_h)
    zs_pp_cap = zs_pp_tree.cap_u64()
    ch.observe_cap(zs_pp_cap)
    alphas = ch.get_n_challenges(nc)

    # 4. quotient
    num_sel = common.num_sel_cols
    csv = pd.const_sigma_ldes
    ldes = {
        "selectors": [csv[i] for i in range(num_sel)],
        "constants": [csv[num_sel + i] for i in range(cfg.num_constants)],
        "sigmas": [csv[num_sel + cfg.num_constants + i] for i in range(R)],
        "wires": [wire_ldes[i] for i in range(cfg.num_wires)],
        "zs": [zs_pp_ldes[c] for c in range(nc)],
        "pps": [zs_pp_ldes[nc + c * npp: nc + (c + 1) * npp]
                for c in range(nc)],
    }
    q_coeffs = compute_quotients(common, ldes, betas, gammas, alphas,
                                 pi_hash)                     # (nc*8, n)
    q_ldes_pair = ntt.coset_lde(gl64.from_u64(q_coeffs), log_n, rate_bits)
    q_ldes = gl64.to_u64(np.asarray(q_ldes_pair[0]),
                         np.asarray(q_ldes_pair[1]))
    if cfg.zk:
        salts["q"] = _salt_rows(M)
        q_leaf = np.concatenate([q_ldes, salts["q"]])
    else:
        q_leaf = q_ldes
    q_tree = merkle.MerkleTree(gl64.from_u64(q_leaf.T), cap_h)
    q_cap = q_tree.cap_u64()
    ch.observe_cap(q_cap)

    # 5. openings at zeta (and g*zeta for Zs)
    zeta = ch.get_extension_challenge()
    cs_coeffs = pd.const_sigma_coeffs
    S = cs_coeffs.shape[0]
    all_coeffs = np.concatenate(
        [cs_coeffs, wire_coeffs, zs_pp_coeffs, q_coeffs])
    ys = np_ext_horner(all_coeffs, zeta)
    g_n = gl64.h_primitive_root_of_unity(log_n)
    gzeta = gl64_ext.h_mul(zeta, (g_n, 0))
    ys_next = np_ext_horner(zs_pp_coeffs[:nc], gzeta)
    W = cfg.num_wires
    openings = OpeningSet(
        constants_sigmas=ys[:S],
        wires=ys[S:S + W],
        zs=ys[S + W:S + W + nc],
        pps=ys[S + W + nc:S + W + nc + nc * npp],
        quotient=ys[S + W + nc + nc * npp:],
        zs_next=ys_next)
    for y in openings.flat():
        ch.observe_ext(y)

    # 6. FRI opening proof over the reduced codeword
    fri_alpha = ch.get_extension_challenge()
    all_ldes = np.concatenate([csv, wire_ldes, zs_pp_ldes, q_ldes])
    n_polys = all_ldes.shape[0]
    xs = _lde_points_cached(log_n + rate_bits)
    # batch 0: everything at zeta
    apow = (1, 0)
    G0 = (np.zeros(M, dtype=np.uint64), np.zeros(M, dtype=np.uint64))
    y0 = (0, 0)
    for i in range(n_polys):
        G0 = gl64_ext.np_ext_add(
            G0, gl64_ext.np_ext_scale((all_ldes[i], np.zeros_like(all_ldes[i])),
                                      apow))
        y0 = gl64_ext.h_add(y0, gl64_ext.h_mul(apow, ys[i]))
        apow = gl64_ext.h_mul(apow, fri_alpha)
    inv0 = gl64_ext.np_ext_inverse(
        gl64_ext.np_ext_sub((xs, np.zeros_like(xs)),
                            (np.full(M, zeta[0], dtype=np.uint64),
                             np.full(M, zeta[1], dtype=np.uint64))))
    num0 = gl64_ext.np_ext_sub(G0, (np.full(M, y0[0], dtype=np.uint64),
                                    np.full(M, y0[1], dtype=np.uint64)))
    F = gl64_ext.np_ext_mul(num0, inv0)
    # batch 1: Zs at g*zeta (alpha powers continue)
    G1 = (np.zeros(M, dtype=np.uint64), np.zeros(M, dtype=np.uint64))
    y1 = (0, 0)
    for c in range(nc):
        zlde = zs_pp_ldes[c]
        G1 = gl64_ext.np_ext_add(
            G1, gl64_ext.np_ext_scale((zlde, np.zeros_like(zlde)), apow))
        y1 = gl64_ext.h_add(y1, gl64_ext.h_mul(apow, ys_next[c]))
        apow = gl64_ext.h_mul(apow, fri_alpha)
    inv1 = gl64_ext.np_ext_inverse(
        gl64_ext.np_ext_sub((xs, np.zeros_like(xs)),
                            (np.full(M, gzeta[0], dtype=np.uint64),
                             np.full(M, gzeta[1], dtype=np.uint64))))
    num1 = gl64_ext.np_ext_sub(G1, (np.full(M, y1[0], dtype=np.uint64),
                                    np.full(M, y1[1], dtype=np.uint64)))
    F = gl64_ext.np_ext_add(F, gl64_ext.np_ext_mul(num1, inv1))

    codeword = (gl64.from_u64(F[0]), gl64.from_u64(F[1]))
    fri_proof = fri.fri_prove(codeword, log_n + rate_bits,
                              gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                              cfg.fri, ch)

    # 7. initial-tree openings at the FRI query indices
    trees = [pd.tree, wires_tree, zs_pp_tree, q_tree]
    mats = [csv, wire_ldes, zs_pp_ldes, q_ldes]
    tree_salts = [None, salts.get("wires"), salts.get("zs_pp"),
                  salts.get("q")]
    initial = []
    for idx in fri_proof.query_indices:
        values, paths = [], []
        for tr, mat, sl in zip(trees, mats, tree_salts):
            vals = [int(v) for v in mat[:, idx]]
            if sl is not None:
                vals += [int(v) for v in sl[:, idx]]
            values.append(vals)
            paths.append(tr.prove(idx))
        initial.append(InitialTreeOpening(values=values, paths=paths))

    return Proof(public_inputs=[int(v) for v in pis],
                 wires_cap=wires_cap, zs_pp_cap=zs_pp_cap,
                 quotient_cap=q_cap, openings=openings,
                 fri_proof=fri_proof, initial_openings=initial)


# ---------------------------------------------------------------------------
# Batched same-shape proving (SURVEY.md §2.11 "levels batched": all proofs
# of an aggregation-tree level — same circuit, different witnesses — run as
# ONE sequence of batched device calls; transcripts stay per-proof on host)
# ---------------------------------------------------------------------------

def prove_batch(data: CircuitData, pws: list[PartialWitness],
                mesh=None) -> list[Proof]:
    """Prove B same-circuit witnesses together. Every polynomial-sized pass
    (LDE NTTs, Merkle levels, constraint/quotient evaluation, opening
    reductions) carries a leading batch axis — one kernel launch for the
    whole batch instead of B launches — while Fiat-Shamir transcripts,
    challenges, and FRI query sampling remain per-proof (identical proofs
    to `prove` one at a time, bar prover randomness).

    On a real TPU (or under CITY_DEVICE_PASSES=1) the permutation,
    quotient, and reduced-codeword passes run as fused device graphs
    (snark/device_passes.py); the numpy twins remain the CPU default and
    the bit-exactness reference."""
    from . import device_passes
    B = len(pws)
    if B == 1 and not device_passes.enabled():
        return [prove(data, pws[0])]
    return _prove_batch_impl(data, pws)


def _prove_batch_impl(data: CircuitData,
                      pws: list[PartialWitness]) -> list[Proof]:
    import jax
    from . import device_passes
    use_dev = device_passes.enabled()
    B = len(pws)
    common, pd, vd = data.common, data.prover, data.verifier
    cfg = common.config
    n, log_n = common.n, common.log_n
    rate_bits = cfg.rate_bits
    M = n << rate_bits
    R = cfg.num_routed_wires
    nc = cfg.num_challenges
    npp = cfg.num_partial_products
    cap_h = min(cfg.fri.cap_height, log_n + rate_bits)

    # 1. witnesses (irregular — host loop)
    wires_list, pis_list, pi_hashes = [], [], []
    for pw in pws:
        w = generate_witness(data, pw)
        if cfg.num_blinding_rows:
            nb = cfg.num_blinding_rows
            assert all(pd.rows[r] is None for r in range(n - nb, n)), \
                "zk blinding rows must be gate-less padding"
            w[:, n - nb:] = _blinding_rows(cfg.num_wires, nb)
        wires_list.append(w)
        pis = [pw.get(t) or 0 for t in pd.pi_targets]
        pis_list.append(pis)
        pi_hashes.append(public_inputs_hash(pis))
    wires_b = np.stack(wires_list)                      # (B, W, n)
    shard_batch = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        assert B % mesh.devices.size == 0, \
            f"batch {B} must divide the {mesh.devices.size}-device mesh"
        axis = mesh.axis_names[0]

        def shard_batch(pair):
            """Lay a (B, ...)-leading (lo, hi) pair across the mesh."""
            spec = PartitionSpec(axis, *([None] * (pair[0].ndim - 1)))
            sh = NamedSharding(mesh, spec)
            return (jax.device_put(pair[0], sh), jax.device_put(pair[1], sh))

    # 2. wire commitment (batched LDE + batched trees; zk: salted leaves)
    wire_coeffs, wire_ldes = interp_and_lde(wires_b, log_n, rate_bits)
    salts = {}
    if cfg.num_blinding_rows:
        salts["wires"] = _salt_rows(M, B)
        wires_leaf = np.concatenate([wire_ldes, salts["wires"]], axis=1)
    else:
        wires_leaf = wire_ldes
    _leafpair = gl64.from_u64(wires_leaf.transpose(0, 2, 1))
    if shard_batch is not None:
        _leafpair = shard_batch(_leafpair)
    wires_tree = merkle.BatchedMerkleTree(_leafpair, cap_h)
    wire_caps = [wires_tree.cap_u64(b) for b in range(B)]

    chs = []
    betas_b, gammas_b = [], []
    for b in range(B):
        ch = Challenger()
        ch.observe_hash(list(vd.circuit_digest))
        ch.observe_cap(vd.constants_sigmas_cap)
        ch.observe_elements(pi_hashes[b])
        ch.observe_cap(wire_caps[b])
        betas_b.append(ch.get_n_challenges(nc))
        gammas_b.append(ch.get_n_challenges(nc))
        chs.append(ch)
    # challenge-major per-batch arrays: betas[c] -> (B,)
    betas = [np.array([betas_b[b][c] for b in range(B)], dtype=np.uint64)
             for c in range(nc)]
    gammas = [np.array([gammas_b[b][c] for b in range(B)], dtype=np.uint64)
              for c in range(nc)]

    # 3. permutation columns, batched over B
    if use_dev:
        zs_pp_pair = device_passes.perm_zs_pp(common, pd, wires_b,
                                              betas, gammas,
                                              shard=shard_batch)
        jax.block_until_ready(zs_pp_pair)
        zs_pp = gl64.to_u64(np.asarray(zs_pp_pair[0]),
                            np.asarray(zs_pp_pair[1]))
    x = pd.subgroup
    k_is = common.k_is
    sigmas = pd.sigmas                                   # (R, n)
    zs_rows, pp_rows = [], []
    for c in range(nc) if not use_dev else []:
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
            chunk_prod.append(pr)                        # (B, n)
        row_prod = chunk_prod[0]
        for cp in chunk_prod[1:]:
            row_prod = gl64.np_mul(row_prod, cp)
        cum = np_cumprod_mod(row_prod)                   # (B, n)
        z = np.concatenate(
            [np.ones((B, 1), dtype=np.uint64), cum[:, :-1]], axis=1)
        zs_rows.append(z)
        run = z
        for j in range(npp):
            run = gl64.np_mul(run, chunk_prod[j])
            pp_rows.append(run)
    if not use_dev:
        zs_pp = np.stack(zs_rows + pp_rows, axis=1)      # (B, nc(1+npp), n)
    zs_pp_coeffs, zs_pp_ldes = interp_and_lde(zs_pp, log_n, rate_bits)
    if cfg.num_blinding_rows:
        salts["zs_pp"] = _salt_rows(M, B)
        zs_pp_leaf = np.concatenate([zs_pp_ldes, salts["zs_pp"]], axis=1)
    else:
        zs_pp_leaf = zs_pp_ldes
    _leafpair = gl64.from_u64(zs_pp_leaf.transpose(0, 2, 1))
    if shard_batch is not None:
        _leafpair = shard_batch(_leafpair)
    zs_pp_tree = merkle.BatchedMerkleTree(_leafpair, cap_h)
    zs_pp_caps = [zs_pp_tree.cap_u64(b) for b in range(B)]
    alphas_b = []
    for b in range(B):
        chs[b].observe_cap(zs_pp_caps[b])
        alphas_b.append(chs[b].get_n_challenges(nc))
    alphas = [np.array([alphas_b[b][c] for b in range(B)], dtype=np.uint64)
              for c in range(nc)]

    # 4. quotients, batched
    num_sel = common.num_sel_cols
    csv = pd.const_sigma_ldes                            # (S, M)
    pi_cols = [np.array([pi_hashes[b][i] for b in range(B)],
                        dtype=np.uint64).reshape(B, 1) for i in range(4)]
    ldes = {
        "selectors": [csv[i] for i in range(num_sel)],
        "constants": [csv[num_sel + i] for i in range(cfg.num_constants)],
        "sigmas": [csv[num_sel + cfg.num_constants + i] for i in range(R)],
        "wires": [wire_ldes[:, i, :] for i in range(cfg.num_wires)],
        "zs": [zs_pp_ldes[:, c, :] for c in range(nc)],
        "pps": [zs_pp_ldes[:, nc + c * npp: nc + (c + 1) * npp, :]
                .transpose(1, 0, 2) for c in range(nc)],
    }
    if use_dev:
        csv_pair = getattr(pd, "_csv_pair", None)
        if csv_pair is None:
            csv_pair = gl64.from_u64(csv)
            try:
                pd._csv_pair = csv_pair
            except Exception:
                pass
        pairs = {
            "csv": csv_pair,
            "wires": gl64.from_u64(wire_ldes),
            "zs_pp": gl64.from_u64(zs_pp_ldes),
        }
        if shard_batch is not None:
            pairs["wires"] = shard_batch(pairs["wires"])
            pairs["zs_pp"] = shard_batch(pairs["zs_pp"])
        q_pair = device_passes.quotient_coeffs(
            common, pairs, betas, gammas, alphas,
            [c.reshape(-1) for c in pi_cols])
        jax.block_until_ready(q_pair)
        q_coeffs = gl64.to_u64(np.asarray(q_pair[0]), np.asarray(q_pair[1]))
    else:
        q_coeffs = compute_quotients(common, ldes, betas, gammas, alphas,
                                     pi_cols)            # (B, nc*8, n)
    q_ldes_pair = ntt.coset_lde(gl64.from_u64(q_coeffs), log_n, rate_bits)
    q_ldes = gl64.to_u64(np.asarray(q_ldes_pair[0]),
                         np.asarray(q_ldes_pair[1]))     # (B, nc*8, M)
    if cfg.num_blinding_rows:
        salts["q"] = _salt_rows(M, B)
        q_leaf = np.concatenate([q_ldes, salts["q"]], axis=1)
    else:
        q_leaf = q_ldes
    _leafpair = gl64.from_u64(q_leaf.transpose(0, 2, 1))
    if shard_batch is not None:
        _leafpair = shard_batch(_leafpair)
    q_tree = merkle.BatchedMerkleTree(_leafpair, cap_h)
    q_caps = [q_tree.cap_u64(b) for b in range(B)]
    zetas = []
    for b in range(B):
        chs[b].observe_cap(q_caps[b])
        zetas.append(chs[b].get_extension_challenge())

    # 5. openings at zeta / g*zeta, batched horner
    cs_coeffs = pd.const_sigma_coeffs                    # (S, n)
    S = cs_coeffs.shape[0]
    all_coeffs = np.concatenate(
        [np.broadcast_to(cs_coeffs, (B,) + cs_coeffs.shape),
         wire_coeffs, zs_pp_coeffs, q_coeffs], axis=1)   # (B, K, n)
    ys_b = np_ext_horner_batch(all_coeffs, zetas)        # (B, K, 2)
    g_n = gl64.h_primitive_root_of_unity(log_n)
    gzetas = [gl64_ext.h_mul(z, (g_n, 0)) for z in zetas]
    ys_next_b = np_ext_horner_batch(zs_pp_coeffs[:, :nc, :], gzetas)
    W = cfg.num_wires
    n_polys = S + W + nc * (1 + npp) + nc * cfg.quotient_chunks

    # per-proof transcripts + batched reduced-codeword build, then ONE
    # batched FRI (folds + layer trees shared across the batch)
    xs = _lde_points_cached(log_n + rate_bits)
    all_ldes_b = np.concatenate(
        [np.broadcast_to(csv, (B,) + csv.shape), wire_ldes, zs_pp_ldes,
         q_ldes], axis=1)                                # (B, K, M)
    openings_list = []
    F_lo = np.empty((B, M), dtype=np.uint64)
    F_hi = np.empty((B, M), dtype=np.uint64)
    apows0 = np.empty((B, n_polys, 2), dtype=np.uint64)
    apows1 = np.empty((B, nc, 2), dtype=np.uint64)
    y0s = np.empty((B, 2), dtype=np.uint64)
    y1s = np.empty((B, 2), dtype=np.uint64)
    for b in range(B):
        ch = chs[b]
        ys = [(int(ys_b[b, i, 0]), int(ys_b[b, i, 1]))
              for i in range(n_polys)]
        ys_next = [(int(ys_next_b[b, c, 0]), int(ys_next_b[b, c, 1]))
                   for c in range(nc)]
        openings = OpeningSet(
            constants_sigmas=ys[:S],
            wires=ys[S:S + W],
            zs=ys[S + W:S + W + nc],
            pps=ys[S + W + nc:S + W + nc + nc * npp],
            quotient=ys[S + W + nc + nc * npp:],
            zs_next=ys_next)
        openings_list.append(openings)
        for y in openings.flat():
            ch.observe_ext(y)
        fri_alpha = ch.get_extension_challenge()
        zeta = zetas[b]
        gzeta = gzetas[b]
        # alpha-power schedule + reduced opening values (host-exact ints)
        apow = (1, 0)
        y0 = (0, 0)
        for i in range(n_polys):
            apows0[b, i] = apow
            y0 = gl64_ext.h_add(y0, gl64_ext.h_mul(apow, ys[i]))
            apow = gl64_ext.h_mul(apow, fri_alpha)
        y1 = (0, 0)
        for c in range(nc):
            apows1[b, c] = apow
            y1 = gl64_ext.h_add(y1, gl64_ext.h_mul(apow, ys_next[c]))
            apow = gl64_ext.h_mul(apow, fri_alpha)
        y0s[b] = y0
        y1s[b] = y1
        if not use_dev:
            all_ldes = all_ldes_b[b]
            G0 = (np.zeros(M, dtype=np.uint64),
                  np.zeros(M, dtype=np.uint64))
            for i in range(n_polys):
                G0 = gl64_ext.np_ext_add(
                    G0, gl64_ext.np_ext_scale(
                        (all_ldes[i], np.zeros_like(all_ldes[i])),
                        tuple(int(v) for v in apows0[b, i])))
            inv0 = gl64_ext.np_ext_inverse(
                gl64_ext.np_ext_sub((xs, np.zeros_like(xs)),
                                    (np.full(M, zeta[0], dtype=np.uint64),
                                     np.full(M, zeta[1], dtype=np.uint64))))
            num0 = gl64_ext.np_ext_sub(
                G0, (np.full(M, y0[0], dtype=np.uint64),
                     np.full(M, y0[1], dtype=np.uint64)))
            F = gl64_ext.np_ext_mul(num0, inv0)
            G1 = (np.zeros(M, dtype=np.uint64),
                  np.zeros(M, dtype=np.uint64))
            for c in range(nc):
                zlde = zs_pp_ldes[b, c, :]
                G1 = gl64_ext.np_ext_add(
                    G1, gl64_ext.np_ext_scale(
                        (zlde, np.zeros_like(zlde)),
                        tuple(int(v) for v in apows1[b, c])))
            inv1 = gl64_ext.np_ext_inverse(
                gl64_ext.np_ext_sub((xs, np.zeros_like(xs)),
                                    (np.full(M, gzeta[0], dtype=np.uint64),
                                     np.full(M, gzeta[1], dtype=np.uint64))))
            num1 = gl64_ext.np_ext_sub(
                G1, (np.full(M, y1[0], dtype=np.uint64),
                     np.full(M, y1[1], dtype=np.uint64)))
            F = gl64_ext.np_ext_add(F, gl64_ext.np_ext_mul(num1, inv1))
            F_lo[b], F_hi[b] = F[0], F[1]

    if use_dev:
        _all_pair = gl64.from_u64(all_ldes_b)
        _zs_pair = gl64.from_u64(zs_pp_ldes)
        if shard_batch is not None:
            _all_pair = shard_batch(_all_pair)
            _zs_pair = shard_batch(_zs_pair)
        Fe = device_passes.reduced_codeword(
            common, _all_pair, _zs_pair,
            apows0, apows1, y0s, y1s,
            np.array(zetas, dtype=np.uint64),
            np.array(gzetas, dtype=np.uint64))
        codewords = (Fe[0], Fe[1])
    else:
        codewords = (gl64.from_u64(F_lo), gl64.from_u64(F_hi))
    fri_proofs = fri.fri_prove_batch(codewords, log_n + rate_bits,
                                     gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                                     cfg.fri, chs)

    proofs = []
    for b in range(B):
        fri_proof = fri_proofs[b]
        trees = [pd.tree, wires_tree, zs_pp_tree, q_tree]
        mats = [csv, wire_ldes[b], zs_pp_ldes[b], q_ldes[b]]
        tree_salts = [None] + [salts[k][b] if k in salts else None
                               for k in ("wires", "zs_pp", "q")]
        initial = []
        for idx in fri_proof.query_indices:
            values, paths = [], []
            for tr, mat, sl in zip(trees, mats, tree_salts):
                vals = [int(v) for v in mat[:, idx]]
                if sl is not None:
                    vals += [int(v) for v in sl[:, idx]]
                values.append(vals)
                if isinstance(tr, merkle.BatchedMerkleTree):
                    paths.append(tr.prove(b, idx))
                else:
                    paths.append(tr.prove(idx))
            initial.append(InitialTreeOpening(values=values, paths=paths))
        proofs.append(Proof(
            public_inputs=[int(v) for v in pis_list[b]],
            wires_cap=wire_caps[b], zs_pp_cap=zs_pp_caps[b],
            quotient_cap=q_caps[b], openings=openings_list[b],
            fri_proof=fri_proof, initial_openings=initial))
    return proofs
