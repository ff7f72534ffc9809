"""The SNARK layer: a Plonky2-class PLONK+FRI proving system, TPU-first.

Architecture: gate-per-row trace with routed-wire copy constraints
(permutation argument with partial products), selector-group gate filters,
coset-LDE rate 8, Poseidon Merkle caps, FRI opening proofs — the same proof
system family as plonky2 (the reference's external prover core, SURVEY.md
§2.1 row 1 / §2.14), re-designed so every hot loop is a batched JAX/XLA
device pass: wire LDEs, constraint evaluation over the 8n coset, quotient
interpolation, Merkle hashing, FRI folds.

Host-side python stays for the irregular parts: circuit building, witness
generation, Fiat-Shamir transcripts, and the (cheap, exact) verifier.
"""

from .config import CircuitConfig
from .circuit import CircuitBuilder
