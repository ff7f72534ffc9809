"""Gate library: per-row polynomial constraints with dual evaluators.

Each gate implements
  * ``eval_host`` — exact python-int extension-field evaluation at one point
    (the verifier's check at zeta, and the spec for the in-circuit verifier);
  * ``eval_vec``  — the same constraints over the whole 8n coset LDE domain,
    written against an ``ops`` backend (numpy-u64 today; the JAX/Pallas pair
    backend plugs into the same interface). This is the TPU replacement for
    plonky2's `eval_unfiltered_base_batch` vectorized gate kernels
    (reference: the 8 custom u32 gates implement that trait, SURVEY.md §2.2).

Wire layout conventions are per-gate, documented on each class.
"""

from __future__ import annotations

import numpy as np

from ..core import gl64, gl64_ext

P = gl64.P


class NpOps:
    """Vector backend over numpy uint64 arrays (exact mod-p)."""
    add = staticmethod(gl64.np_add)
    sub = staticmethod(gl64.np_sub)
    mul = staticmethod(gl64.np_mul)

    @staticmethod
    def const(v: int, like):
        return np.full(np.shape(like), v % P, dtype=np.uint64)


def _h_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


class Gate:
    """Base: a gate occupies one row; constraints reference that row's wires
    and constant columns only."""

    #: unique stable key for selector grouping / serialization
    key: str
    num_constraints: int
    degree: int                     # max constraint degree (in trace polys)

    def num_ops(self) -> int:
        return 1

    def eval_host(self, wires, constants, pi_hash):
        """wires/constants: lists of ext (int,int); pi_hash: 4 base ints.
        Returns list of ext constraint values (len == num_constraints)."""
        raise NotImplementedError

    def eval_vec(self, wires, constants, pi_hash, ops=NpOps):
        """wires/constants: lists of backend arrays over the LDE domain."""
        raise NotImplementedError

    # witness generation: fill this row's derived wires
    def generate(self, row, get, set_wire, constants=None):
        """get(col)->int reads an input wire; set_wire(col, value) writes."""
        pass


class ArithmeticGate(Gate):
    """num_ops independent ops: out = c0 * a * b + c1 * d, with shared
    per-row constants (c0, c1). Wires per op t: [4t]=a, [4t+1]=b, [4t+2]=d,
    [4t+3]=out. (plonky2 ArithmeticGate twin.)"""

    degree = 3

    def __init__(self, num_ops: int):
        self._num_ops = num_ops
        self.key = f"arithmetic<{num_ops}>"
        self.num_constraints = num_ops

    def num_ops(self) -> int:
        return self._num_ops

    def eval_host(self, wires, constants, pi_hash):
        c0, c1 = constants[0], constants[1]
        out = []
        for t in range(self._num_ops):
            a, b, d, o = (wires[4 * t], wires[4 * t + 1],
                          wires[4 * t + 2], wires[4 * t + 3])
            term = gl64_ext.h_add(gl64_ext.h_mul(c0, gl64_ext.h_mul(a, b)),
                                  gl64_ext.h_mul(c1, d))
            out.append(_h_sub(term, o))
        return out

    def eval_vec(self, wires, constants, pi_hash, ops=NpOps):
        c0, c1 = constants[0], constants[1]
        out = []
        for t in range(self._num_ops):
            a, b, d, o = (wires[4 * t], wires[4 * t + 1],
                          wires[4 * t + 2], wires[4 * t + 3])
            term = ops.add(ops.mul(c0, ops.mul(a, b)), ops.mul(c1, d))
            out.append(ops.sub(term, o))
        return out

    def generate(self, row, get, set_wire, constants=None):
        c0, c1 = constants[0], constants[1]
        for t in range(self._num_ops):
            a, b, d = get(4 * t), get(4 * t + 1), get(4 * t + 2)
            if a is None or b is None or d is None:
                continue
            set_wire(4 * t + 3, (c0 * a * b + c1 * d) % P)


class ConstantGate(Gate):
    """wire[t] == constant column t, for t < num_consts (routes circuit
    constants into the copy-constraint graph). plonky2 ConstantGate twin."""

    degree = 1

    def __init__(self, num_consts: int):
        self._n = num_consts
        self.key = f"constant<{num_consts}>"
        self.num_constraints = num_consts

    def num_ops(self) -> int:
        return self._n

    def eval_host(self, wires, constants, pi_hash):
        return [_h_sub(wires[t], constants[t]) for t in range(self._n)]

    def eval_vec(self, wires, constants, pi_hash, ops=NpOps):
        return [ops.sub(wires[t], constants[t]) for t in range(self._n)]

    def generate(self, row, get, set_wire, constants=None):
        for t in range(self._n):
            set_wire(t, constants[t] % P)


class BaseSumGate(Gate):
    """Binary decomposition: wire[0] == sum_i wire[1+i] * 2^i, each wire[1+i]
    binary. The range-check workhorse (plonky2 BaseSumGate<2> twin; the
    reference's u32 RangeCheckGate / ComparisonGate balance checks reduce to
    this — SURVEY.md §2.2 u32 custom gates)."""

    degree = 2

    def __init__(self, num_bits: int):
        self.num_bits = num_bits
        self.key = f"base_sum<{num_bits}>"
        self.num_constraints = 1 + num_bits

    def eval_host(self, wires, constants, pi_hash):
        acc = (0, 0)
        for i in range(self.num_bits):
            b = wires[1 + i]
            acc = gl64_ext.h_add(acc, gl64_ext.h_mul((pow(2, i, P), 0), b))
        out = [_h_sub(acc, wires[0])]
        one = (1, 0)
        for i in range(self.num_bits):
            b = wires[1 + i]
            out.append(gl64_ext.h_mul(b, _h_sub(b, one)))
        return out

    def eval_vec(self, wires, constants, pi_hash, ops=NpOps):
        acc = ops.const(0, wires[0])
        for i in range(self.num_bits):
            acc = ops.add(acc, ops.mul(wires[1 + i],
                                       ops.const(pow(2, i, P), wires[0])))
        out = [ops.sub(acc, wires[0])]
        one = ops.const(1, wires[0])
        for i in range(self.num_bits):
            b = wires[1 + i]
            out.append(ops.mul(b, ops.sub(b, one)))
        return out

    def generate(self, row, get, set_wire, constants=None):
        v = get(0)
        if v is None:
            return
        for i in range(self.num_bits):
            set_wire(1 + i, (v >> i) & 1)


class PublicInputGate(Gate):
    """Wires 0..3 must equal the public-inputs hash vector (the verifier
    recomputes it from the claimed public inputs and substitutes it here).
    plonky2 PublicInputGate twin."""

    key = "public_input"
    degree = 1
    num_constraints = 4

    def eval_host(self, wires, constants, pi_hash):
        return [_h_sub(wires[i], (pi_hash[i], 0)) for i in range(4)]

    def eval_vec(self, wires, constants, pi_hash, ops=NpOps):
        return [ops.sub(wires[i], ops.const(pi_hash[i], wires[i]))
                for i in range(4)]
