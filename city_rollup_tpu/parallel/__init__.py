"""Multi-chip parallelism: device meshes, distributed NTT/LDE, sharded
Merkle commits, and batched proving over `jax.sharding` + `shard_map`.

TPU-native replacement for the reference's parallelism inventory
(SURVEY.md §2.11): Redis task-parallelism becomes data-parallel pjit batches;
rayon intra-proof parallelism becomes sharded NTT butterfly stages exchanged
over ICI via all_to_all.
"""
