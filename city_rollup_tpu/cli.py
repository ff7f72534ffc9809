"""Unified CLI: full-block demo, qbench, dump inspection, circuit info.

Reference role: city_rollup_cli (SURVEY.md §2.1 row 21; clap dispatch
main.rs:23-46) — rpc-server / orchestrator / l2-worker land with the service
layer; the in-memory block pipeline and bench harness are wired here.

Usage: python -m city_rollup_tpu.cli <subcommand> [...]
"""

from __future__ import annotations

import argparse
import json
import sys


def cmd_full_block(args):
    """Prove a demo block end-to-end in memory (full_block.rs twin)."""
    from .rollup import orchestrator as om
    from .rollup.circuits import CircuitToolbox, FAST_TEST_CONFIG
    from .rollup.city_store import CityStore
    from .rollup.proof_store import MemoryProofStore
    from .rollup.queues import QueueHub
    from .rollup.worker import Worker
    from .utils import TraceTimer

    t = TraceTimer("full_block")
    city = CityStore()
    store = MemoryProofStore()
    hub = QueueHub()
    cfg = FAST_TEST_CONFIG if args.fast else None
    toolbox = CircuitToolbox(cfg)
    orch = om.Orchestrator(city, store, hub)
    city.register_user(0, 0, (1, 1, 1, 1))
    city.register_user(0, 1, (2, 2, 2, 2))
    city.increment_user_balance(0, 0, 10_000)
    t.lap("genesis")
    reqs = om.BlockRequests(
        register_users=[om.RegisterUser(2, (3, 3, 3, 3))],
        token_transfers=[om.TokenTransfer(0, 1, v)
                         for v in (250, 100, 50)],
        add_withdrawals=[om.AddWithdrawal(1, 0, (9, 9, 9, 9), 25)],
    )
    planned = orch.plan_block(1, reqs)
    orch.enqueue(planned)
    t.lap(f"planned block ({planned.num_jobs} jobs)")
    worker = Worker(toolbox, store, hub)
    while worker.process_next_job():
        pass
    t.lap("proved all jobs")
    ok = orch.finalize(planned, toolbox)
    t.lap(f"finalized: {ok}")
    if args.dump:
        from .rollup.qbench import dump_block
        with open(args.dump, "w") as f:
            f.write(dump_block(store, planned).to_json())
        t.event(f"dumped proof store to {args.dump}")
    print(json.dumps({"ok": ok, "jobs": planned.num_jobs,
                      "total_s": round(t.total(), 3)}))
    return 0 if ok else 1


def cmd_qbench(args):
    from .rollup.circuits import CircuitToolbox, FAST_TEST_CONFIG
    from .rollup.qbench import BlockProofStoreDump, run_worker_qbench
    with open(args.input) as f:
        dump = BlockProofStoreDump.from_json(f.read())
    toolbox = CircuitToolbox(FAST_TEST_CONFIG if args.fast else None)
    results = run_worker_qbench(dump, toolbox, num_rounds=args.rounds)
    print(json.dumps(results, indent=None))
    return 0


def cmd_inspect_dump(args):
    from .rollup.qbench import BlockProofStoreDump
    with open(args.input) as f:
        dump = BlockProofStoreDump.from_json(f.read())
    print(json.dumps({
        "leaf_jobs": len(dump.leaf_jobs),
        "entries": len(dump.store_dump["data"]),
        "counters": len(dump.store_dump["counters"])}))
    return 0


def cmd_circuit_info(args):
    """print-circuit-info twin (dev_cli subcommand)."""
    from .rollup.circuits import CircuitToolbox, FAST_TEST_CONFIG
    from .rollup.job_id import CircuitType
    toolbox = CircuitToolbox(FAST_TEST_CONFIG if args.fast else None)
    ct = CircuitType[args.circuit]
    built = toolbox._get(ct)
    c = built.data.common
    print(json.dumps({
        "circuit": args.circuit,
        "degree": c.n,
        "log_degree": c.log_n,
        "gates": [g.key for g in c.gates],
        "selector_groups": c.selector_groups,
        "fingerprint": [hex(x) for x in built.data.verifier.circuit_digest],
    }))
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="city_rollup_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    fb = sub.add_parser("full-block", help="prove a demo block in memory")
    fb.add_argument("--fast", action="store_true")
    fb.add_argument("--dump", help="write a qbench-replayable dump here")
    fb.set_defaults(fn=cmd_full_block)

    qb = sub.add_parser("qbench", help="replay a dumped block proof store")
    qb.add_argument("input")
    qb.add_argument("--rounds", type=int, default=1)
    qb.add_argument("--fast", action="store_true")
    qb.set_defaults(fn=cmd_qbench)

    ins = sub.add_parser("inspect-dump")
    ins.add_argument("input")
    ins.set_defaults(fn=cmd_inspect_dump)

    ci = sub.add_parser("print-circuit-info")
    ci.add_argument("circuit", help="e.g. OP_L2_TRANSFER")
    ci.add_argument("--fast", action="store_true")
    ci.set_defaults(fn=cmd_circuit_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
