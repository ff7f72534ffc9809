"""Witness debugging: evaluate every gate constraint row-by-row on a
generated witness, without proving.

Reference role: city_common_circuit's DebugCircuitTracer (SURVEY.md §2.2
"Debug tracer" — resolves witness values to locate unsatisfied constraints).
Used heavily while developing gadgets: a full prove takes minutes, this takes
milliseconds and names the first failing (row, gate, constraint).
"""

from __future__ import annotations

from ..core import gl64
from .circuit import CircuitData

P = gl64.P


def check_witness(data: CircuitData, wires, pi_hash) -> list:
    """wires: (W, n) uint64 matrix from generate_witness; pi_hash: 4 ints.
    Returns a list of violation strings (empty == all constraints hold)."""
    common = data.common
    cfg = common.config
    bad = []
    for r, inst in enumerate(data.prover.rows):
        if inst is None:
            continue
        wrow = [(int(wires[c, r]), 0) for c in range(cfg.num_wires)]
        crow = [(int(v), 0) for v in inst.constants]
        cons = inst.gate.eval_host(wrow, crow, list(pi_hash))
        for k, cv in enumerate(cons):
            if cv != (0, 0):
                bad.append(f"row {r} gate {inst.gate.key} constraint {k}: "
                           f"{cv}")
                if len(bad) > 20:
                    return bad
    # copy constraints: all wires in a class share one value
    builder = getattr(data, "_builder", None)
    if builder is not None:
        from .circuit import Wire
        classes: dict = {}
        for r in range(common.n):
            for c in range(cfg.num_routed_wires):
                w = Wire(r, c)
                classes.setdefault(builder.uf.find(w), []).append(w)
        for root, members in classes.items():
            vals = {int(wires[w.col, w.row]) for w in members}
            if len(vals) > 1:
                bad.append(f"copy class {root}: values {sorted(vals)[:4]} "
                           f"across {len(members)} wires")
                if len(bad) > 20:
                    return bad
    return bad
