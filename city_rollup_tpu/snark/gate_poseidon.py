"""PoseidonGate: one full width-12 Poseidon permutation per trace row.

Design (TPU-first, not a plonky2 translation): the permutation's 8 full
rounds each store their 12-element output state in wires, giving degree-7
constraints (one x^7 S-box between stored states). The 22 partial rounds
store only their single S-box *input* wire; the linear (MDS + round
constant) evolution between them is precomputed once as affine maps over
the basis [pre-partial state (12), S-box outputs (22), 1], so the whole
partial section costs 22 + 12 wires and constraints instead of 22 * 12.
Total: 142 wires, 130 constraints, max degree 7.

Reference role: plonky2's PoseidonGate (135 wires) consumed by every hash
and recursive-verifier circuit in city-rollup (SURVEY.md §2.14
`hash::poseidon::PoseidonHash`, builder `hash_n_to_hash_no_pad`).
Row layout:
  [0..12)    permutation input   (routed)
  [12..24)   permutation output  (routed)
  [24..60)   state after initial full rounds 0,1,2        (3 * 12)
  [60..72)   state after initial full round 3 (pre-partial)
  [72..94)   S-box input of each partial round            (22)
  [94..106)  state after all partial rounds
  [106..142) state after final full rounds 4,5,6          (3 * 12)
"""

from __future__ import annotations

import functools

from ..core import gl64
from ..core import poseidon_params as params
from .gates import Gate

P = gl64.P
W12 = params.WIDTH
HF = params.HALF_N_FULL_ROUNDS
NPR = params.N_PARTIAL_ROUNDS

COL_IN = 0
COL_OUT = 12
COL_FULL0 = 24                    # 3 stored states (after rounds 0,1,2)
COL_PRE_PARTIAL = COL_FULL0 + 3 * W12
COL_SBOX = COL_PRE_PARTIAL + W12  # 22 partial-round s-box inputs
COL_POST_PARTIAL = COL_SBOX + NPR
COL_FULL1 = COL_POST_PARTIAL + W12  # 3 stored states (after rounds 4,5,6)
NUM_WIRES = COL_FULL1 + 3 * W12   # 142


def _mds_row(state, rr):
    """Affine MDS over vectors of python ints (runs once at import)."""
    circ, diag = params.MDS_MATRIX_CIRC, params.MDS_MATRIX_DIAG
    acc = [diag[rr] * v for v in state[rr]]
    for i in range(W12):
        src = state[(i + rr) % W12]
        c = circ[i]
        acc = [(a + c * v) for a, v in zip(acc, src)]
    return [a % P for a in acc]


@functools.lru_cache(maxsize=1)
def _partial_affine():
    """Precompute the affine evolution of the 22 partial rounds.

    Basis (dim 35): [s_0..s_11 (pre-partial state), y_0..y_21 (s-box
    outputs), 1]. Returns (sbox_in_vecs: 22 x 35, final: 12 x 35) with
    sbox_in_vecs[k] = coefficients of partial round k's s-box input and
    final[j] = coefficients of post-partial state element j.
    """
    dim = W12 + NPR + 1
    rc = params.ALL_ROUND_CONSTANTS
    state = []
    for i in range(W12):
        v = [0] * dim
        v[i] = 1
        state.append(v)
    sbox_in_vecs = []
    for k in range(NPR):
        r = HF + k
        for i in range(W12):
            state[i] = list(state[i])
            state[i][dim - 1] = (state[i][dim - 1] + rc[r * W12 + i]) % P
        sbox_in_vecs.append(list(state[0]))
        y = [0] * dim
        y[W12 + k] = 1
        state[0] = y
        state = [_mds_row(state, rr) for rr in range(W12)]
    return sbox_in_vecs, state


def _pow7(alg, x):
    x2 = alg.mul(x, x)
    x3 = alg.mul(x2, x)
    x6 = alg.mul(x3, x3)
    return alg.mul(x6, x)


def _mds_alg(alg, state):
    circ, diag = params.MDS_MATRIX_CIRC, params.MDS_MATRIX_DIAG
    out = []
    for rr in range(W12):
        acc = alg.cmul(diag[rr], state[rr])
        for i in range(W12):
            acc = alg.add(acc, alg.cmul(circ[i], state[(i + rr) % W12]))
        out.append(acc)
    return out


def _affine_eval(alg, vec, basis_vals, like):
    acc = alg.const_like(vec[-1], like)
    for c, v in zip(vec[:-1], basis_vals):
        if c:
            acc = alg.add(acc, alg.cmul(c, v))
    return acc


class PoseidonGate(Gate):
    key = "poseidon"
    degree = 7
    num_constraints = 2 * HF * W12 + NPR + W12   # 130

    def eval_alg(self, wires, constants, pi_hash, alg):
        rc = params.ALL_ROUND_CONSTANTS
        cons = []
        # initial full rounds 0..3
        state = [wires[COL_IN + i] for i in range(W12)]
        for fr in range(HF):
            u = [alg.cadd(rc[fr * W12 + i], state[i]) for i in range(W12)]
            s7 = [_pow7(alg, ui) for ui in u]
            nxt = _mds_alg(alg, s7)
            base = (COL_FULL0 + fr * W12 if fr < HF - 1 else COL_PRE_PARTIAL)
            tgt = [wires[base + i] for i in range(W12)]
            cons.extend(alg.sub(tgt[i], nxt[i]) for i in range(W12))
            state = tgt
        # partial rounds: bind each s-box input wire, then the final state
        sbox_vecs, final_vecs = _partial_affine()
        ys = [_pow7(alg, wires[COL_SBOX + k]) for k in range(NPR)]
        basis = state + ys
        like = state[0]
        for k in range(NPR):
            cons.append(alg.sub(wires[COL_SBOX + k],
                                _affine_eval(alg, sbox_vecs[k], basis, like)))
        post = [wires[COL_POST_PARTIAL + i] for i in range(W12)]
        for i in range(W12):
            cons.append(alg.sub(post[i],
                                _affine_eval(alg, final_vecs[i], basis, like)))
        state = post
        # final full rounds 4..7
        r0 = HF + NPR
        for fr in range(HF):
            u = [alg.cadd(rc[(r0 + fr) * W12 + i], state[i])
                 for i in range(W12)]
            s7 = [_pow7(alg, ui) for ui in u]
            nxt = _mds_alg(alg, s7)
            base = (COL_FULL1 + fr * W12 if fr < HF - 1 else COL_OUT)
            tgt = [wires[base + i] for i in range(W12)]
            cons.extend(alg.sub(tgt[i], nxt[i]) for i in range(W12))
            state = tgt
        return cons

    def eval_jnp_vec(self, wires, constants, pi_hash):
        """Device twin of eval_alg with a COMPACT traced graph: the eight
        full rounds evaluate as ONE vectorized pass over a leading round
        axis (their input/target states are all stored wires, so rounds
        are data-independent), the MDS is 12 lane-rolls instead of 144
        scalar terms, and the partial section is a 35-term affine matvec.
        The naive eval_alg under JnpAlg unrolls to a ~600k-op XLA graph
        that takes tens of minutes to compile; this traces ~10k ops.

        wires: list of (lo, hi) pairs, all broadcast to a common (B, M)
        shape. Returns the same 130 constraints in eval_alg order."""
        import jax.numpy as jnp
        import numpy as np
        from ..core import gl64 as g

        def stack(pairs):
            return (jnp.stack([p[0] for p in pairs]),
                    jnp.stack([p[1] for p in pairs]))

        def cpair(vals):
            a = np.array(vals, dtype=np.uint64)
            return (jnp.asarray((a & np.uint64(0xFFFFFFFF))
                                .astype(np.uint32)),
                    jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))

        rc = params.ALL_ROUND_CONSTANTS
        dom = wires[0][0].shape                       # (B, M) or (M,)
        nd = len(dom)

        def bcast(cp, lead):
            """constant pair with leading dims `lead` -> broadcast over dom"""
            shape = cp[0].shape + (1,) * nd
            return (jnp.broadcast_to(cp[0].reshape(shape), cp[0].shape + dom),
                    jnp.broadcast_to(cp[1].reshape(shape), cp[1].shape + dom))

        # ---- full rounds, vectorized over (8 rounds, 12 lanes) ----------
        def wrow(base):
            return [wires[base + i] for i in range(W12)]

        ins = (wrow(COL_IN) + wrow(COL_FULL0) + wrow(COL_FULL0 + W12) +
               wrow(COL_FULL0 + 2 * W12) + wrow(COL_POST_PARTIAL) +
               wrow(COL_FULL1) + wrow(COL_FULL1 + W12) +
               wrow(COL_FULL1 + 2 * W12))
        tgts = (wrow(COL_FULL0) + wrow(COL_FULL0 + W12) +
                wrow(COL_FULL0 + 2 * W12) + wrow(COL_PRE_PARTIAL) +
                wrow(COL_FULL1) + wrow(COL_FULL1 + W12) +
                wrow(COL_FULL1 + 2 * W12) + wrow(COL_OUT))
        sin = stack(ins)                              # (96, B, M)
        sin = (sin[0].reshape((8, W12) + dom), sin[1].reshape((8, W12) + dom))
        stgt = stack(tgts)
        stgt = (stgt[0].reshape((8, W12) + dom),
                stgt[1].reshape((8, W12) + dom))
        r0 = HF + NPR
        rc_rows = [rc[r * W12 + i] for r in list(range(HF)) +
                   [r0 + fr for fr in range(HF)] for i in range(W12)]
        rc_c = cpair(rc_rows)
        rc_b = bcast((rc_c[0].reshape(8, W12), rc_c[1].reshape(8, W12)), 2)
        u = g.add(sin, rc_b)
        s7 = g.exp7(u)                                # (8, 12, B, M)
        circ, diag = params.MDS_MATRIX_CIRC, params.MDS_MATRIX_DIAG
        diag_b = bcast((cpair(diag)[0].reshape(1, W12),
                        cpair(diag)[1].reshape(1, W12)), 2)
        acc = g.mul(s7, (jnp.broadcast_to(diag_b[0], s7[0].shape),
                         jnp.broadcast_to(diag_b[1], s7[1].shape)))
        for i in range(W12):
            # out[rr] += circ[i] * s7[(i + rr) % 12]: roll lanes by -i
            rolled = (jnp.roll(s7[0], -i, axis=1), jnp.roll(s7[1], -i, axis=1))
            ci = cpair([circ[i]])
            term = g.mul(rolled, (jnp.broadcast_to(
                ci[0].reshape((1,) * (2 + nd)), rolled[0].shape),
                jnp.broadcast_to(ci[1].reshape((1,) * (2 + nd)),
                                 rolled[1].shape)))
            acc = g.add(acc, term)
        full_cons = g.sub(stgt, acc)                  # (8, 12, B, M)

        # ---- partial section: 35-term affine matvec ---------------------
        sbox_vecs, final_vecs = _partial_affine()
        ysin = stack([wires[COL_SBOX + k] for k in range(NPR)])
        ys = g.exp7(ysin)                             # (22, B, M)
        basis = (jnp.concatenate(
                     [jnp.stack([wires[COL_PRE_PARTIAL + i][0]
                                 for i in range(W12)]), ys[0]]),
                 jnp.concatenate(
                     [jnp.stack([wires[COL_PRE_PARTIAL + i][1]
                                 for i in range(W12)]), ys[1]]))
        vecs = sbox_vecs + final_vecs                 # 34 rows x 35
        C = np.array([[v[i] for v in vecs] for i in range(W12 + NPR)],
                     dtype=object)                    # (34 basis, 34 out)
        out34 = bcast(cpair([int(v[-1]) for v in vecs]), 1)  # consts
        for i in range(W12 + NPR):
            col = cpair([int(x) for x in C[i]])       # (34,) coeffs
            col_b = bcast(col, 1)
            bi = (jnp.broadcast_to(basis[0][i], out34[0].shape),
                  jnp.broadcast_to(basis[1][i], out34[1].shape))
            out34 = g.add(out34, g.mul(col_b, bi))
        sb_tgt = stack([wires[COL_SBOX + k] for k in range(NPR)] +
                       [wires[COL_POST_PARTIAL + i] for i in range(W12)])
        aff_cons = g.sub(sb_tgt, out34)               # (34, B, M)

        # ---- emit in eval_alg order -------------------------------------
        cons = []
        for fr in range(HF):
            for i in range(W12):
                cons.append((full_cons[0][fr, i], full_cons[1][fr, i]))
        for k in range(NPR + W12):
            cons.append((aff_cons[0][k], aff_cons[1][k]))
        for fr in range(HF, 2 * HF):
            for i in range(W12):
                cons.append((full_cons[0][fr, i], full_cons[1][fr, i]))
        return cons

    def generate(self, row, get, set_wire, constants=None):
        from ..core import poseidon_host
        state = [get(COL_IN + i) for i in range(W12)]
        if any(v is None for v in state):
            return
        rc = params.ALL_ROUND_CONSTANTS
        r = 0
        for fr in range(HF):
            state = [(s + rc[r * W12 + i]) % P for i, s in enumerate(state)]
            state = [poseidon_host._sbox(s) for s in state]
            state = poseidon_host._mds(state)
            base = (COL_FULL0 + fr * W12 if fr < HF - 1 else COL_PRE_PARTIAL)
            for i in range(W12):
                set_wire(base + i, state[i])
            r += 1
        for k in range(NPR):
            state = [(s + rc[r * W12 + i]) % P for i, s in enumerate(state)]
            set_wire(COL_SBOX + k, state[0])
            state[0] = poseidon_host._sbox(state[0])
            state = poseidon_host._mds(state)
            r += 1
        for i in range(W12):
            set_wire(COL_POST_PARTIAL + i, state[i])
        for fr in range(HF):
            state = [(s + rc[r * W12 + i]) % P for i, s in enumerate(state)]
            state = [poseidon_host._sbox(s) for s in state]
            state = poseidon_host._mds(state)
            base = (COL_FULL1 + fr * W12 if fr < HF - 1 else COL_OUT)
            for i in range(W12):
                set_wire(base + i, state[i])
            r += 1

    def sub_generators(self):
        return [([COL_IN + i for i in range(W12)], self.generate)]
