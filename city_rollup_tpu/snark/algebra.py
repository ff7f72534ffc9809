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


class JnpAlg:
    """Base-field device ``(lo, hi)`` uint32 limb pairs over the LDE domain
    (arbitrary broadcastable shapes). Backs the jitted on-device
    constraint/quotient pass (snark/device_passes.py) — the same gate
    recipes that run in numpy for the host twin run here as one fused XLA
    graph per circuit shape."""
    add = staticmethod(gl64.add)
    sub = staticmethod(gl64.sub)
    mul = staticmethod(gl64.mul)

    @staticmethod
    def cmul(c, x):
        import jax.numpy as jnp
        c = int(c) % P
        cl = jnp.broadcast_to(jnp.uint32(c & 0xFFFFFFFF), x[0].shape)
        ch = jnp.broadcast_to(jnp.uint32(c >> 32), x[1].shape)
        return gl64.mul(x, (cl, ch))

    @staticmethod
    def cadd(c, x):
        import jax.numpy as jnp
        c = int(c) % P
        cl = jnp.broadcast_to(jnp.uint32(c & 0xFFFFFFFF), x[0].shape)
        ch = jnp.broadcast_to(jnp.uint32(c >> 32), x[1].shape)
        return gl64.add(x, (cl, ch))

    @staticmethod
    def const_like(c, like):
        return gl64.full(like[0].shape, int(c) % P)


def lift_jnp(v, like):
    """Literal int or per-batch (B,) array -> a (lo, hi) pair broadcastable
    against `like`-shaped (lo, hi) domain pairs ((M,) or (B, M))."""
    import jax.numpy as jnp
    if isinstance(v, np.ndarray):
        col = v.astype(np.uint64).reshape(-1, 1)
        return (jnp.asarray((col & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                jnp.asarray((col >> np.uint64(32)).astype(np.uint32)))
    c = int(v) % P
    return (jnp.uint32(c & 0xFFFFFFFF), jnp.uint32(c >> 32))


def lift_host(v: int):
    return (v % P, 0)


def lift_np(v, like):
    """Scalar (or per-batch column array, for batched proving) -> a numpy
    operand broadcastable against `like`-shaped domain arrays."""
    if isinstance(v, np.ndarray):
        return v.astype(np.uint64)
    return np.full(np.shape(like), v % P, dtype=np.uint64)
