"""Groth16 over BLS12-381: R1CS, trusted setup, prover, verifier.

Reference role: the gnark side of `gnark-plonky2-wrapper`
(SURVEY.md §2.1 row 3) — the reference wraps its final Plonky2 proof into a
Groth16 proof a patched Dogecoin verifies with OP_CHECKGROTH16VERIFY.
This module implements the Groth16 system itself (Groth16 [Gro16], as
standardized by gnark/snarkjs); the wrap *statement* is assembled in
rollup/groth16_wrap.py.

Proof encoding mirrors `CityGroth16ProofData {pi_a, pi_b_a0, pi_b_a1,
pi_c}` (city_rollup_common/src/block_template/data.rs): 48-byte field
elements of A (G1), B (G2, two Fp2 coords), C (G1).
"""

from __future__ import annotations

import dataclasses
import hashlib

from . import bls12_381 as bls
from .bls12_381 import G1, G2, R


@dataclasses.dataclass
class R1CS:
    """Constraints a_i(w) * b_i(w) = c_i(w) over witness vector
    w = [1, public..., private...]; each row is a sparse {idx: coeff}."""
    num_public: int                 # not counting the leading 1
    num_vars: int                   # total incl. 1 + public + private
    a_rows: list
    b_rows: list
    c_rows: list

    def eval_row(self, row: dict, w: list) -> int:
        return sum(c * w[i] for i, c in row.items()) % R

    def is_satisfied(self, w: list) -> bool:
        for a, b, c in zip(self.a_rows, self.b_rows, self.c_rows):
            if (self.eval_row(a, w) * self.eval_row(b, w) -
                    self.eval_row(c, w)) % R != 0:
                return False
        return True


@dataclasses.dataclass
class ProvingKey:
    alpha1: G1
    beta1: G1
    beta2: G2
    delta1: G1
    delta2: G2
    a_query: list                   # [A_i(tau)]1 per variable
    b1_query: list
    b2_query: list                  # [B_i(tau)]2
    k_query: list                   # private-var K terms / delta
    h_query: list                   # powers tau^i Z(tau)/delta
    r1cs: R1CS


@dataclasses.dataclass
class VerifyingKey:
    alpha1: G1
    beta2: G2
    gamma2: G2
    delta2: G2
    ic: list                        # IC_0..IC_pub


@dataclasses.dataclass
class Groth16Proof:
    a: G1
    b: G2
    c: G1

    def to_city_data(self) -> dict:
        """CityGroth16ProofData encoding (48-byte big-endian felts)."""
        enc = lambda v: v.to_bytes(48, "big").hex()
        return {
            "pi_a": [enc(self.a.x), enc(self.a.y)],
            "pi_b_a0": [enc(self.b.x.c0), enc(self.b.y.c0)],
            "pi_b_a1": [enc(self.b.x.c1), enc(self.b.y.c1)],
            "pi_c": [enc(self.c.x), enc(self.c.y)],
        }


def _poly_eval_points(r1cs: R1CS, tau: int):
    """Lagrange-free QAP evaluation: domain = constraint indices with
    interpolation through power basis. We use the standard approach of
    evaluating the variable polynomials u_i/v_i/w_i at tau over the
    vanishing domain {omega^j}: here the domain is the set {1..m} embedded
    via Lagrange basis L_j(tau) computed directly (m is small for the wrap
    statement)."""
    m = len(r1cs.a_rows)
    # domain points: 1..m (distinct mod R)
    xs = list(range(1, m + 1))
    # Lagrange basis at tau
    l_at_tau = []
    z_tau = 1
    for xj in xs:
        z_tau = z_tau * (tau - xj) % R
    for j, xj in enumerate(xs):
        num, den = 1, 1
        for k, xk in enumerate(xs):
            if k != j:
                num = num * (tau - xk) % R
                den = den * (xj - xk) % R
        l_at_tau.append(num * pow(den, -1, R) % R)
    u = [0] * r1cs.num_vars
    v = [0] * r1cs.num_vars
    w = [0] * r1cs.num_vars
    for j in range(m):
        lj = l_at_tau[j]
        for i, coef in r1cs.a_rows[j].items():
            u[i] = (u[i] + coef * lj) % R
        for i, coef in r1cs.b_rows[j].items():
            v[i] = (v[i] + coef * lj) % R
        for i, coef in r1cs.c_rows[j].items():
            w[i] = (w[i] + coef * lj) % R
    return u, v, w, z_tau, xs


def setup(r1cs: R1CS, seed: bytes = b"city-rollup-groth16-ceremony"
          ) -> tuple[ProvingKey, VerifyingKey]:
    """Deterministic toy ceremony (the reference ships a keystore the same
    way — initialize(keystore), root.rs:296-304). NOT a multiparty setup."""
    def felt(tag):
        return int.from_bytes(hashlib.sha512(seed + tag).digest(),
                              "big") % (R - 2) + 1

    tau, alpha, beta, gamma, delta = (felt(b"tau"), felt(b"alpha"),
                                      felt(b"beta"), felt(b"gamma"),
                                      felt(b"delta"))
    u, v, w, z_tau, _xs = _poly_eval_points(r1cs, tau)
    g1, g2 = G1.generator(), G2.generator()
    gamma_inv = pow(gamma, -1, R)
    delta_inv = pow(delta, -1, R)

    a_query = [g1.mul(u[i]) for i in range(r1cs.num_vars)]
    b1_query = [g1.mul(v[i]) for i in range(r1cs.num_vars)]
    b2_query = [g2.mul(v[i]) for i in range(r1cs.num_vars)]
    n_pub = 1 + r1cs.num_public
    ic = [g1.mul((beta * u[i] + alpha * v[i] + w[i]) * gamma_inv % R)
          for i in range(n_pub)]
    k_query = [g1.mul((beta * u[i] + alpha * v[i] + w[i]) * delta_inv % R)
               for i in range(n_pub, r1cs.num_vars)]
    m = len(r1cs.a_rows)
    h_query = [g1.mul(pow(tau, i, R) * z_tau % R * delta_inv % R)
               for i in range(max(m - 1, 1))]
    pk = ProvingKey(alpha1=g1.mul(alpha), beta1=g1.mul(beta),
                    beta2=g2.mul(beta), delta1=g1.mul(delta),
                    delta2=g2.mul(delta), a_query=a_query,
                    b1_query=b1_query, b2_query=b2_query,
                    k_query=k_query, h_query=h_query, r1cs=r1cs)
    vk = VerifyingKey(alpha1=pk.alpha1, beta2=pk.beta2,
                      gamma2=g2.mul(gamma), delta2=pk.delta2, ic=ic)
    return pk, vk


def _h_coeffs(r1cs: R1CS, w_vec: list) -> list:
    """Coefficients of h(x) = (A(x)B(x) - C(x)) / Z(x) over the integer
    domain {1..m}, via evaluation + interpolation on a doubled domain."""
    m = len(r1cs.a_rows)
    xs = list(range(1, m + 1))

    def row_polys():
        # values of A(x), B(x), C(x) at the domain points are just the
        # per-constraint inner products
        av = [r1cs.eval_row(r, w_vec) for r in r1cs.a_rows]
        bv = [r1cs.eval_row(r, w_vec) for r in r1cs.b_rows]
        cv = [r1cs.eval_row(r, w_vec) for r in r1cs.c_rows]
        return av, bv, cv

    av, bv, cv = row_polys()

    # interpolate A, B, C (degree < m) then compute h = (AB - C)/Z exactly
    def interp(vals):
        # Lagrange interpolation -> dense coeffs (m small)
        coeffs = [0] * m
        for j, xj in enumerate(xs):
            # basis poly prod_{k!=j} (x - xk)/(xj - xk)
            basis = [1]
            den = 1
            for k, xk in enumerate(xs):
                if k == j:
                    continue
                basis = _poly_mul(basis, [(-xk) % R, 1])
                den = den * (xj - xk) % R
            scale = vals[j] * pow(den, -1, R) % R
            for d, c in enumerate(basis):
                coeffs[d] = (coeffs[d] + c * scale) % R
        return coeffs

    a_poly, b_poly, c_poly = interp(av), interp(bv), interp(cv)
    ab = _poly_mul(a_poly, b_poly)
    num = [(x - y) % R for x, y in
           zip(ab, c_poly + [0] * (len(ab) - len(c_poly)))]
    # divide by Z(x) = prod (x - xj)
    z = [1]
    for xj in xs:
        z = _poly_mul(z, [(-xj) % R, 1])
    h, rem = _poly_divmod(num, z)
    assert all(x == 0 for x in rem), "witness does not satisfy R1CS"
    return h


def _poly_mul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if x:
            for j, y in enumerate(b):
                out[i + j] = (out[i + j] + x * y) % R
    return out


def _poly_divmod(num, den):
    num = list(num)
    q = [0] * max(1, len(num) - len(den) + 1)
    dlead_inv = pow(den[-1], -1, R)
    for i in range(len(num) - len(den), -1, -1):
        coef = num[i + len(den) - 1] * dlead_inv % R
        q[i] = coef
        if coef:
            for j, d in enumerate(den):
                num[i + j] = (num[i + j] - coef * d) % R
    return q, num


def prove(pk: ProvingKey, witness: list, rand_seed: bytes = b"r"
          ) -> Groth16Proof:
    r1cs = pk.r1cs
    assert len(witness) == r1cs.num_vars
    assert witness[0] == 1
    assert r1cs.is_satisfied(witness)
    r_val = int.from_bytes(hashlib.sha256(rand_seed + b"r").digest(),
                           "big") % R
    s_val = int.from_bytes(hashlib.sha256(rand_seed + b"s").digest(),
                           "big") % R

    def msm1(points, scalars):
        acc = G1.identity()
        for pnt, sc in zip(points, scalars):
            if sc % R:
                acc = acc.add(pnt.mul(sc))
        return acc

    def msm2(points, scalars):
        acc = G2.identity()
        for pnt, sc in zip(points, scalars):
            if sc % R:
                acc = acc.add(pnt.mul(sc))
        return acc

    a = pk.alpha1.add(msm1(pk.a_query, witness)).add(pk.delta1.mul(r_val))
    b2 = pk.beta2.add(msm2(pk.b2_query, witness)).add(pk.delta2.mul(s_val))
    b1 = pk.beta1.add(msm1(pk.b1_query, witness)).add(pk.delta1.mul(s_val))

    h = _h_coeffs(r1cs, witness)
    h_term = msm1(pk.h_query[:len(h)], h)
    n_pub = 1 + r1cs.num_public
    k_term = msm1(pk.k_query, witness[n_pub:])
    c = (k_term.add(h_term).add(a.mul(s_val)).add(b1.mul(r_val))
         .add(pk.delta1.mul((-r_val * s_val) % R)))
    return Groth16Proof(a=a, b=b2, c=c)


def verify(vk: VerifyingKey, public_inputs: list,
           proof: Groth16Proof) -> bool:
    """e(A,B) == e(alpha,beta) e(IC(pub),gamma) e(C,delta)."""
    assert len(public_inputs) == len(vk.ic) - 1
    acc = vk.ic[0]
    for base, x in zip(vk.ic[1:], public_inputs):
        acc = acc.add(base.mul(x))
    return bls.pairing_check([
        (proof.a.neg(), proof.b),
        (vk.alpha1, vk.beta2),
        (acc, vk.gamma2),
        (proof.c, vk.delta2),
    ])
