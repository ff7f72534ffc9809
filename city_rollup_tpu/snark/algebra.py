"""Evaluation algebras: one gate-constraint definition, three backends.

Every gate expresses its constraints once against this small algebra
interface; the prover evaluates them over the LDE domain (numpy-u64 vectors),
the host verifier at one extension point (python ints), and the recursive
verifier gadget *in-circuit* (extension targets — see snark/gadgets.py
CircuitExtAlg). This mirrors how plonky2 gates implement
`eval_unfiltered / eval_unfiltered_base_batch / eval_unfiltered_circuit`
from one constraint recipe (reference: the 8 custom u32 gates implement all
three, SURVEY.md §2.2), collapsed into a single algebra-generic method.

Interface (elements are backend-specific):
  add(a, b), sub(a, b), mul(a, b)         -- ring ops
  cmul(c, x), cadd(c, x)                  -- literal-int constant * / +
  const_like(c, like)                     -- lift a literal int near `like`
"""

from __future__ import annotations

import numpy as np

from ..core import gl64, gl64_ext

P = gl64.P


class HostExtAlg:
    """Extension-field points as (int, int) tuples — exact host math."""
    add = staticmethod(gl64_ext.h_add)
    sub = staticmethod(gl64_ext.h_sub)
    mul = staticmethod(gl64_ext.h_mul)

    @staticmethod
    def cmul(c, x):
        c = c % P
        return ((c * x[0]) % P, (c * x[1]) % P)

    @staticmethod
    def cadd(c, x):
        return ((x[0] + c) % P, x[1])

    @staticmethod
    def const_like(c, like):
        return (c % P, 0)


class NpAlg:
    """Base-field numpy-u64 vectors over the LDE domain."""
    add = staticmethod(gl64.np_add)
    sub = staticmethod(gl64.np_sub)
    mul = staticmethod(gl64.np_mul)

    @staticmethod
    def cmul(c, x):
        return gl64.np_mul(x, np.uint64(c % P))

    @staticmethod
    def cadd(c, x):
        return gl64.np_add(x, np.full(np.shape(x), c % P, dtype=np.uint64))

    @staticmethod
    def const_like(c, like):
        return np.full(np.shape(like), c % P, dtype=np.uint64)


def lift_host(v: int):
    return (v % P, 0)


def lift_np(v, like):
    """Scalar (or per-batch column array, for batched proving) -> a numpy
    operand broadcastable against `like`-shaped domain arrays."""
    if isinstance(v, np.ndarray):
        return v.astype(np.uint64)
    return np.full(np.shape(like), v % P, dtype=np.uint64)
