"""CLI entry point — the `ray job submit` surface.

    python -m crawlerframework_ray crawl --workdir /tmp/run1 --seeds 4096 \
        --epochs 3 --wave 4096 --hosts 256 [--resume] [--num-cpus 32]

Owns its Ray session (guarded init + shutdown); the library itself
never inits Ray. On a cluster, submit exactly this module via
``ray job submit -- python -m crawlerframework_ray crawl ...`` and the
per-epoch checkpoints make a killed job resumable with ``--resume``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crawlerframework_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run (or resume) a crawl")
    c.add_argument("--workdir", required=True)
    c.add_argument("--seeds", type=int, default=1024)
    c.add_argument("--epochs", type=int, default=3)
    c.add_argument("--wave", type=int, default=4096)
    c.add_argument("--hosts", type=int, default=64)
    c.add_argument("--host-budget", type=int, default=64)
    c.add_argument("--max-depth", type=int, default=2)
    c.add_argument("--shards", type=int, default=8)
    c.add_argument("--path-space", type=int, default=1 << 16)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--size-shift", type=int, default=0)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--verify-rows", action="store_true")
    c.add_argument("--num-cpus", type=int, default=None)
    c.add_argument(
        "--spill-max-resident", type=int, default=1 << 20,
        help="frontier rows per bucket actor above which the cold tail "
             "spills to disk (memory policy only — trace/resume identical)",
    )
    c.add_argument("--spill-slack", type=int, default=8)

    g = sub.add_parser("gc", help="reclaim old epoch checkpoints (keeps resume bit-identical)")
    g.add_argument("--workdir", required=True)
    g.add_argument("--keep-last", type=int, default=2)

    q = sub.add_parser("query", help="run a catalog query (or list them)")
    q.add_argument("name", nargs="?", help="query name; omit to list the catalog")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None, help="write result parquet here instead of printing")
    q.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "gc":  # pure filesystem maintenance — no Ray session
        from .state.checkpoint import gc_checkpoints

        print(json.dumps(gc_checkpoints(args.workdir, keep_last=args.keep_last)))
        return 0

    if args.cmd == "query" and args.name is None:
        from .pipelines.queries import ORACLE_SQL, QUERIES

        for name in sorted(QUERIES):
            print(f"{name}\t{'sql-oracle' if name in ORACLE_SQL else 'rows-only'}")
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.cmd == "query":
        from .pipelines.queries import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; run without a name to list", file=sys.stderr)
            ray.shutdown()
            return 2
        res = QUERIES[args.name](args.sf_dir)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if args.out:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), args.out)
            print(json.dumps({"query": args.name, "rows": len(df), "out": args.out}))
        else:
            print(df.to_string(max_rows=50))
        ray.shutdown()
        return 0

    from .config import CrawlConfig
    from .data.synth import SynthWebConfig, seeds_table
    from .pipelines.crawl import CrawlEngine

    cfg = CrawlConfig(
        web=SynthWebConfig(
            seed=args.seed, n_hosts=args.hosts, path_space=args.path_space,
            size_shift=args.size_shift,
        ),
        workdir=args.workdir,
        max_depth=args.max_depth,
        wave_size=args.wave,
        host_budget=args.host_budget,
        n_shards=args.shards,
        max_epochs=args.epochs,
        verify_rows=args.verify_rows,
        spill_max_resident=args.spill_max_resident,
        spill_slack=args.spill_slack,
    )
    engine = CrawlEngine(cfg)
    if args.resume:
        summary = engine.run(resume=True)
    else:
        summary = engine.run(seeds=seeds_table(cfg.web, args.seeds))
    print(
        json.dumps(
            {
                "epochs": summary.epochs,
                "fetched_urls": summary.fetched_urls,
                "raw_outlinks": summary.raw_outlinks,
                "fresh_urls": summary.fresh_urls,
                "final_frontier": summary.final_frontier,
                "seen_total": summary.seen_total,
                "wall_sec": round(summary.wall_sec, 2),
                "spill": summary.spill,
                "workdir": cfg.workdir,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
