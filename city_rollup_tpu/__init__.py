"""city_rollup_tpu — a TPU-native (JAX/XLA/Pallas) Plonky2-class zk-rollup proving stack.

Brand-new framework with the capabilities of QEDProtocol/city-rollup (see SURVEY.md):
Goldilocks field arithmetic, Poseidon hashing, NTT/LDE, FRI, recursive aggregation,
versioned Merkle state store, distributed job DAG, and rollup services — designed
TPU-first rather than ported from the Rust reference.
"""

__version__ = "0.1.0"
