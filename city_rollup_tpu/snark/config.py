"""Circuit configuration (CircuitConfig::standard_recursion_config twin —
reference usage BASELINE.md 'Recursion config' row)."""

from __future__ import annotations

import dataclasses

from ..core.fri import FriConfig


@dataclasses.dataclass(frozen=True)
class CircuitConfig:
    num_routed_wires: int = 32          # columns subject to copy constraints
    num_wires: int = 32                 # total trace columns (>= routed)
    num_constants: int = 2              # circuit constant columns
    num_challenges: int = 2             # permutation-argument repetitions
    max_constraint_degree: int = 8      # quotient degree factor
    fri: FriConfig = dataclasses.field(default_factory=FriConfig)

    # permutation-argument chunking: 7 factors/step keeps degree <= 8
    @property
    def perm_chunk_size(self) -> int:
        return self.max_constraint_degree - 1

    @property
    def num_perm_chunks(self) -> int:
        c = self.perm_chunk_size
        return (self.num_routed_wires + c - 1) // c

    @property
    def num_partial_products(self) -> int:
        """Extra witness columns per challenge (the last chunk lands in
        Z(g x) directly)."""
        return self.num_perm_chunks - 1

    @property
    def rate_bits(self) -> int:
        return self.fri.rate_bits

    @property
    def quotient_chunks(self) -> int:
        return self.max_constraint_degree

    @classmethod
    def poseidon_config(cls, **kw) -> "CircuitConfig":
        """Wide-trace config fitting the 142-wire PoseidonGate (the analogue
        of plonky2's 135-wire standard_recursion_config)."""
        kw.setdefault("num_wires", 144)
        return cls(**kw)


# selector sentinel for rows whose gate is in another selector group
UNUSED_SELECTOR = (1 << 32) - 1
