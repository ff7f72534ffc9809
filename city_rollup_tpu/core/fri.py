"""FRI low-degree proofs over Goldilocks^2, TPU-batched.

Commit phase: every fold layer's codeword (natural order, extension field) is
committed as a Poseidon Merkle cap; the fold itself is ONE fused elementwise
device pass over all lanes (the (v(x)+v(-x))/2 + beta*(v(x)-v(-x))/(2x)
radix-2 rule), so a 2^22 codeword folds in microseconds on the VPU. Grinding
(proof-of-work) evaluates 2^17 candidate transcripts as one batched Poseidon
call instead of a host loop.

The verifier is exact host-side python-int math (tiny: 28 queries x ~15
layers) — it doubles as the spec for the in-circuit FRI verifier gadget.

Reference role: plonky2 `fri::{prover,verifier}` consumed by every proof in
city-rollup (SURVEY.md §2.1 row 1: "FRI commit/fold/query (28 query rounds,
cap height 4)"; §7 step 4).
"""

from __future__ import annotations

import copy
import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import gl64, gl64_ext, merkle, ntt, poseidon
from .challenger import Challenger
from .poseidon_params import SPONGE_RATE


@dataclasses.dataclass(frozen=True)
class FriConfig:
    """Mirrors plonky2 FriConfig (standard recursion: rate 1/8, 28 queries,
    cap height 4, 16 pow bits; BASELINE.md 'Recursion config' row)."""
    rate_bits: int = 3
    cap_height: int = 4
    proof_of_work_bits: int = 16
    num_query_rounds: int = 28
    final_poly_bits: int = 5        # log2(len) of the directly-sent final poly

    def num_folds(self, log_degree: int) -> int:
        return max(log_degree - self.final_poly_bits, 0)


@dataclasses.dataclass
class FriQueryLayer:
    """One layer's opening for one query: the sibling pair + Merkle path."""
    coset: list[tuple[int, int]]          # [v_j, v_{j+m/2}] as ext (int, int)
    merkle_path: list[list[int]]          # sibling digests, leaf level first


@dataclasses.dataclass
class FriProof:
    commit_caps: list[np.ndarray]         # per layer: (2^cap, 4) uint64
    final_poly: list[tuple[int, int]]     # ext coefficients
    pow_witness: int
    query_rounds: list[list[FriQueryLayer]]
    # transcript-derived (not trusted by the verifier — it recomputes them):
    # the prover surfaces them so callers can open their own witness trees
    # at the same indices.
    query_indices: list[int] = dataclasses.field(default_factory=list)


# ---------------------------------------------------------------------------
# Device helpers
# ---------------------------------------------------------------------------

def _ext_codeword_to_leaves(codeword):
    """Ext codeword ((a0),(a1)) of length m -> (..., m/2, 4) leaf felts
    pairing index j with j + m/2 (the radix-2 fold sibling). Leading batch
    dims ride through."""
    (a0lo, a0hi), (a1lo, a1hi) = codeword
    m = a0lo.shape[-1]
    h = m // 2
    lo = jnp.stack([a0lo[..., :h], a1lo[..., :h],
                    a0lo[..., h:], a1lo[..., h:]], axis=-1)
    hi = jnp.stack([a0hi[..., :h], a1hi[..., :h],
                    a0hi[..., h:], a1hi[..., h:]], axis=-1)
    return (lo, hi)


@functools.lru_cache(maxsize=None)
def _fold_inv_x_table(log_m: int, shift: int):
    """1/(2*x_j) for j in [0, m/2): inv(2*shift) * w^{-j}, as HOST (lo, hi)
    uint32 arrays. Cached as numpy on purpose: this is reached from inside
    `_fold_codeword_jit`'s trace, and caching `jnp.asarray` results there
    would memoize constant TRACERS that leak into the next trace of a
    different batch shape (UnexpectedTracerError). Callers lift to device
    per trace (the conversion constant-folds)."""
    h = 1 << (log_m - 1)
    w_inv = gl64.h_inverse(gl64.h_primitive_root_of_unity(log_m))
    base = gl64.h_inverse((2 * shift) % gl64.P)
    pows = gl64.np_powers(w_inv, h)
    vals = gl64.np_mul(pows, np.uint64(base))
    return ((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (vals >> np.uint64(32)).astype(np.uint32))


def _fold_codeword(codeword, beta, log_m: int, shift: int):
    """One radix-2 FRI fold on the device codeword. beta: ext (int, int).
    Thin wrapper turning beta into traced device scalars so the jitted body
    compiles once per (log_m, shift), not once per challenge value."""
    beta_arr = np.array([beta[0], beta[1]], dtype=np.uint64)
    beta_dev = (jnp.asarray(beta_arr & np.uint64(0xFFFFFFFF),
                            dtype=jnp.uint32),
                jnp.asarray(beta_arr >> np.uint64(32), dtype=jnp.uint32))
    return _fold_codeword_jit(codeword, beta_dev, log_m, shift)


def _bc_scalar(x, like):
    """Broadcast a per-batch scalar ((,) or (B,)) against (..., h) arrays."""
    if x.ndim:
        x = x[..., None]
    return jnp.broadcast_to(x, like.shape)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _fold_codeword_jit(codeword, beta_dev, log_m: int, shift: int):
    """Batch-polymorphic radix-2 fold: codeword arrays (..., m), beta_dev
    (lo, hi) of shape (..., 2) — per-batch challenges fold B codewords in
    one kernel (the batched-proving FRI path)."""
    (a0, a1) = codeword
    h = 1 << (log_m - 1)
    lo_half = lambda c: ((c[0][0][..., :h], c[0][1][..., :h]),
                         (c[1][0][..., :h], c[1][1][..., :h]))
    hi_half = lambda c: ((c[0][0][..., h:], c[0][1][..., h:]),
                         (c[1][0][..., h:], c[1][1][..., h:]))
    ve = lo_half((a0, a1))      # v(x)
    vo = hi_half((a0, a1))      # v(-x)
    s = gl64_ext.add(ve, vo)                        # v(x) + v(-x)
    d = gl64_ext.sub(ve, vo)                        # v(x) - v(-x)
    inv2 = gl64.h_inverse(2)
    c_lo, c_hi = ntt._to_pair_const(np.array([inv2], dtype=np.uint64))
    half = (jnp.broadcast_to(c_lo, s[0][0].shape),
            jnp.broadcast_to(c_hi, s[0][1].shape))
    even_part = gl64_ext.mul_base(s, half)          # (v+v-)/2
    invx_np = _fold_inv_x_table(log_m, shift % gl64.P)
    invx = (jnp.asarray(invx_np[0]), jnp.asarray(invx_np[1]))
    invx_b = (jnp.broadcast_to(invx[0], d[0][0].shape),
              jnp.broadcast_to(invx[1], d[0][1].shape))
    odd_part = gl64_ext.mul_base(d, invx_b)         # (v-v-)/(2x)
    beta_lo, beta_hi = beta_dev
    beta_b = ((_bc_scalar(beta_lo[..., 0], d[0][0]),
               _bc_scalar(beta_hi[..., 0], d[0][1])),
              (_bc_scalar(beta_lo[..., 1], d[0][0]),
               _bc_scalar(beta_hi[..., 1], d[0][1])))
    return gl64_ext.add(even_part, gl64_ext.mul(beta_b, odd_part))


def grind(challenger: Challenger, pow_bits: int, max_batches: int = 64) -> int:
    """Find pow_witness w such that the challenge drawn right after observing
    w has `pow_bits` leading zero bits. Candidates are evaluated as batched
    device Poseidon permutations, sized ~4x the expected search length."""
    base = copy.deepcopy(challenger)
    k = len(base.input_buffer)
    assert k + 1 <= SPONGE_RATE
    threshold = 1 << (64 - pow_bits)
    state = np.array(base.state, dtype=np.uint64)
    batch = max(256, min(1 << 17, 4 << pow_bits))
    start = 0
    for _ in range(max_batches):
        ws = np.arange(start, start + batch, dtype=np.uint64)
        start += batch
        states = np.tile(state, (batch, 1))
        if k:
            states[:, :k] = np.array(base.input_buffer, dtype=np.uint64)
        states[:, k] = ws
        out = poseidon.permute(gl64.from_u64(states))
        c = gl64.to_u64(np.asarray(out[0][:, SPONGE_RATE - 1]),
                        np.asarray(out[1][:, SPONGE_RATE - 1]))
        hits = np.nonzero(c < threshold)[0]
        if hits.size:
            return int(ws[hits[0]])
    raise RuntimeError("grind failed")


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def fri_prove(codeword, log_m: int, shift: int, config: FriConfig,
              challenger: Challenger) -> FriProof:
    """Prove the ext codeword (natural order, on coset shift*<w_m>) is the LDE
    of a polynomial of degree < 2^(log_m - rate_bits).

    codeword: ((a0lo,a0hi),(a1lo,a1hi)) arrays of shape (2^log_m,).
    The first commit round commits this initial codeword (layer 0), matching
    plonky2's transcript shape so callers answer layer-0 consistency from
    their own witness trees.
    """
    log_degree = log_m - config.rate_bits
    n_folds = config.num_folds(log_degree)

    layers = []          # (codeword, tree, log_m_l, shift_l)
    cur, cur_log, cur_shift = codeword, log_m, shift % gl64.P
    betas = []
    caps = []
    for _ in range(n_folds):
        leaves = _ext_codeword_to_leaves(cur)
        tree = merkle.MerkleTree(
            leaves, cap_height=min(config.cap_height, cur_log - 1))
        cw_np = (gl64.to_u64(np.asarray(cur[0][0]), np.asarray(cur[0][1])),
                 gl64.to_u64(np.asarray(cur[1][0]), np.asarray(cur[1][1])))
        layers.append((cw_np, tree, cur_log, cur_shift))
        cap = tree.cap_u64()
        caps.append(cap)
        challenger.observe_cap(cap)
        beta = challenger.get_extension_challenge()
        betas.append(beta)
        cur = _fold_codeword(cur, beta, cur_log, cur_shift)
        cur_shift = (cur_shift * cur_shift) % gl64.P
        cur_log -= 1

    # final polynomial: interpolate the last codeword on its coset
    fin_a0 = ntt.coset_intt(cur[0], cur_log, shift=cur_shift)
    fin_a1 = ntt.coset_intt(cur[1], cur_log, shift=cur_shift)
    n_coeffs = 1 << max(cur_log - config.rate_bits, 0)
    c0 = gl64.to_u64(np.asarray(fin_a0[0]), np.asarray(fin_a0[1]))
    c1 = gl64.to_u64(np.asarray(fin_a1[0]), np.asarray(fin_a1[1]))
    assert not c0[n_coeffs:].any() and not c1[n_coeffs:].any(), \
        "codeword is not low-degree"
    final_poly = [(int(c0[i]), int(c1[i])) for i in range(n_coeffs)]
    for c in final_poly:
        challenger.observe_ext(c)

    pow_witness = grind(challenger, config.proof_of_work_bits)
    challenger.observe_element(pow_witness)
    pow_response = challenger.get_challenge()
    assert pow_response < (1 << (64 - config.proof_of_work_bits))

    # query phase
    m0 = 1 << log_m
    query_rounds = []
    query_indices = []
    for _ in range(config.num_query_rounds):
        idx = challenger.get_challenge() % m0
        query_indices.append(idx)
        round_layers = []
        i = idx
        for (cw, tree, lm, _s) in layers:
            h = 1 << (lm - 1)
            j = i % h
            round_layers.append(FriQueryLayer(
                coset=[(int(cw[0][j]), int(cw[1][j])),
                       (int(cw[0][j + h]), int(cw[1][j + h]))],
                merkle_path=tree.prove(j)))
            i = j
        query_rounds.append(round_layers)

    return FriProof(commit_caps=caps, final_poly=final_poly,
                    pow_witness=pow_witness, query_rounds=query_rounds,
                    query_indices=query_indices)


def fri_prove_batch(codewords, log_m: int, shift: int, config: FriConfig,
                    challengers: list) -> list[FriProof]:
    """Batched FRI: B codewords (arrays shaped (B, 2^log_m)) with B
    independent transcripts. Every fold and every layer's Merkle build is
    ONE device call for the whole batch; challenges, grinding and query
    sampling stay per-proof (identical proofs to fri_prove one at a time)."""
    B = len(challengers)
    log_degree = log_m - config.rate_bits
    n_folds = config.num_folds(log_degree)

    layers = []          # (cw_np (B,m) ext pair, BatchedMerkleTree, lm, s)
    cur, cur_log, cur_shift = codewords, log_m, shift % gl64.P
    caps_per_proof = [[] for _ in range(B)]
    for _ in range(n_folds):
        leaves = _ext_codeword_to_leaves(cur)            # (B, h, 4)
        tree = merkle.BatchedMerkleTree(
            leaves, cap_height=min(config.cap_height, cur_log - 1))
        cw_np = (gl64.to_u64(np.asarray(cur[0][0]), np.asarray(cur[0][1])),
                 gl64.to_u64(np.asarray(cur[1][0]), np.asarray(cur[1][1])))
        layers.append((cw_np, tree, cur_log, cur_shift))
        betas = np.empty((B, 2), dtype=np.uint64)
        for b in range(B):
            cap = tree.cap_u64(b)
            caps_per_proof[b].append(cap)
            challengers[b].observe_cap(cap)
            betas[b] = challengers[b].get_extension_challenge()
        beta_dev = (jnp.asarray(betas & np.uint64(0xFFFFFFFF),
                                dtype=jnp.uint32),
                    jnp.asarray(betas >> np.uint64(32), dtype=jnp.uint32))
        cur = _fold_codeword_jit(cur, beta_dev, cur_log, cur_shift)
        cur_shift = (cur_shift * cur_shift) % gl64.P
        cur_log -= 1

    # final polynomials (batched intt), then per-proof transcript tails
    fin_a0 = ntt.coset_intt(cur[0], cur_log, shift=cur_shift)
    fin_a1 = ntt.coset_intt(cur[1], cur_log, shift=cur_shift)
    n_coeffs = 1 << max(cur_log - config.rate_bits, 0)
    c0 = gl64.to_u64(np.asarray(fin_a0[0]), np.asarray(fin_a0[1]))
    c1 = gl64.to_u64(np.asarray(fin_a1[0]), np.asarray(fin_a1[1]))
    assert not c0[:, n_coeffs:].any() and not c1[:, n_coeffs:].any(), \
        "a codeword is not low-degree"

    proofs = []
    m0 = 1 << log_m
    for b in range(B):
        ch = challengers[b]
        final_poly = [(int(c0[b, i]), int(c1[b, i]))
                      for i in range(n_coeffs)]
        for c in final_poly:
            ch.observe_ext(c)
        pow_witness = grind(ch, config.proof_of_work_bits)
        ch.observe_element(pow_witness)
        pow_response = ch.get_challenge()
        assert pow_response < (1 << (64 - config.proof_of_work_bits))

        query_rounds = []
        query_indices = []
        for _ in range(config.num_query_rounds):
            idx = ch.get_challenge() % m0
            query_indices.append(idx)
            round_layers = []
            i = idx
            for (cw, tree, lm, _s) in layers:
                h = 1 << (lm - 1)
                j = i % h
                round_layers.append(FriQueryLayer(
                    coset=[(int(cw[0][b, j]), int(cw[1][b, j])),
                           (int(cw[0][b, j + h]), int(cw[1][b, j + h]))],
                    merkle_path=tree.prove(b, j)))
                i = j
            query_rounds.append(round_layers)
        proofs.append(FriProof(commit_caps=caps_per_proof[b],
                               final_poly=final_poly,
                               pow_witness=pow_witness,
                               query_rounds=query_rounds,
                               query_indices=query_indices))
    return proofs


# ---------------------------------------------------------------------------
# Verifier (host, exact)
# ---------------------------------------------------------------------------

def fri_verify(proof: FriProof, log_m: int, shift: int, config: FriConfig,
               challenger: Challenger,
               initial_eval_fn=None) -> bool:
    """Verify a FriProof. `initial_eval_fn(query_round, index) -> (int, int)`
    returns the claimed codeword value at a queried initial index (e.g.
    recomputed from PLONK witness-tree openings after checking those trees'
    Merkle paths), or None to signal failure. If the fn itself is None,
    layer-0's own opening is trusted (standalone low-degree test)."""
    log_degree = log_m - config.rate_bits
    n_folds = config.num_folds(log_degree)
    if len(proof.commit_caps) != n_folds:
        return False

    betas = []
    for cap in proof.commit_caps:
        challenger.observe_cap(cap)
        betas.append(challenger.get_extension_challenge())
    if len(proof.final_poly) != 1 << max(log_degree - n_folds, 0):
        return False
    for c in proof.final_poly:
        challenger.observe_ext(c)
    challenger.observe_element(proof.pow_witness)
    if challenger.get_challenge() >= (1 << (64 - config.proof_of_work_bits)):
        return False

    m0 = 1 << log_m
    fin_log = log_m - n_folds
    fin_shift = shift
    for _ in range(n_folds):
        fin_shift = (fin_shift * fin_shift) % gl64.P
    w_fin = gl64.h_primitive_root_of_unity(fin_log)

    for qr, round_layers in enumerate(proof.query_rounds):
        idx = challenger.get_challenge() % m0
        if len(round_layers) != n_folds:
            return False
        i = idx
        if initial_eval_fn is not None:
            value = initial_eval_fn(qr, idx)
            if value is None:
                return False
        else:
            value = None
        lm, s = log_m, shift % gl64.P
        for layer, beta, cap in zip(round_layers, betas, proof.commit_caps):
            h = 1 << (lm - 1)
            j = i % h
            vj, vjh = layer.coset
            claimed = vjh if i >= h else vj
            if value is not None and tuple(claimed) != tuple(value):
                return False
            leaf_digest = merkle.h_hash_leaf(
                [vj[0], vj[1], vjh[0], vjh[1]])
            if not merkle.h_verify_merkle_proof(
                    leaf_digest, j, layer.merkle_path, cap):
                return False
            # fold
            w = gl64.h_primitive_root_of_unity(lm)
            x = (s * pow(w, j, gl64.P)) % gl64.P
            inv2x = pow(2 * x, gl64.P - 2, gl64.P)
            sum_ = gl64_ext.h_add(vj, vjh)
            diff = gl64_ext.h_sub(vj, vjh)
            inv2 = pow(2, gl64.P - 2, gl64.P)
            even = ((sum_[0] * inv2) % gl64.P, (sum_[1] * inv2) % gl64.P)
            odd = ((diff[0] * inv2x) % gl64.P, (diff[1] * inv2x) % gl64.P)
            value = gl64_ext.h_add(even, gl64_ext.h_mul(beta, odd))
            i = j
            lm -= 1
            s = (s * s) % gl64.P
        # final check: value == final_poly(x_i) on the final coset
        x = (fin_shift * pow(w_fin, i, gl64.P)) % gl64.P
        acc = (0, 0)
        for c in reversed(proof.final_poly):
            acc = gl64_ext.h_mul(acc, (x, 0))
            acc = gl64_ext.h_add(acc, c)
        if acc != tuple(value):
            return False
    return True
