"""Device mesh helpers for the proving fleet.

One flat axis ``"x"`` is enough for the prover's two sharded dimensions in
round 1: the LDE/evaluation axis of a single large NTT (model/sequence-like
axis) and the proof batch axis (data-parallel axis) — callers pick which
tensor axis rides the mesh per pjit call.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, (
            f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_last(mesh: Mesh, axis: str = "x"):
    """Sharding that splits the last axis of a rank-2 array across the mesh."""
    return NamedSharding(mesh, P(None, axis))


def shard_first(mesh: Mesh, axis: str = "x"):
    return NamedSharding(mesh, P(axis))
