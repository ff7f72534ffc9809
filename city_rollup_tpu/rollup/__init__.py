"""Rollup control plane: job addressing, DAG scheduling, versioned state
store, queues, worker/orchestrator actors — host-side Python mirroring the
reference's L1-L5 layers (SURVEY.md §1), driving the TPU prover core.
"""
