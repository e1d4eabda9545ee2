"""CLI entry point — the `ray job submit` surface.

    python -m crawlerframework_ray crawl --config job.json [--resume]
    python -m crawlerframework_ray crawl --workdir /tmp/run1 --seeds 4096 \
        --epochs 3 --wave 4096 --hosts 256 [--resume] [--num-cpus 32]

``--config`` is the job-artifact form the north_rule words: one JSON
file of CrawlConfig fields (web params nested under ``web``, optional
``seeds``), so a cluster submission is exactly
``ray job submit -- python -m crawlerframework_ray crawl --config job.json``
and a killed job resumes bit-identically with ``--resume`` (per-epoch
checkpoints + config fingerprint guard). Explicit CLI flags override
config values. Owns its Ray session (guarded init + shutdown); the
library itself never inits Ray. Gated in tests/test_cli.py.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crawlerframework_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run (or resume) a crawl")
    c.add_argument(
        "--config", default=None,
        help="JSON file of CrawlConfig fields (synthetic-web params "
             "nested under 'web'; optional 'seeds' for the seed count). "
             "The ray-job-submit form: the whole job is one JSON "
             "artifact. Explicit CLI flags override its values.",
    )
    c.add_argument("--workdir", default=None)
    c.add_argument("--seeds", type=int, default=None)
    c.add_argument("--epochs", type=int, default=None)
    c.add_argument("--wave", type=int, default=None)
    c.add_argument("--hosts", type=int, default=None)
    c.add_argument("--host-budget", type=int, default=None)
    c.add_argument("--max-depth", type=int, default=None)
    c.add_argument("--shards", type=int, default=None)
    c.add_argument("--path-space", type=int, default=None)
    c.add_argument("--seed", type=int, default=None)
    c.add_argument("--size-shift", type=int, default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--verify-rows", action="store_true")
    c.add_argument("--num-cpus", type=int, default=None)
    c.add_argument(
        "--spill-max-resident", type=int, default=None,
        help="frontier rows per bucket actor above which the cold tail "
             "spills to disk (memory policy only — trace/resume identical)",
    )
    c.add_argument("--spill-slack", type=int, default=None)

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
    from .data.synth import seeds_table
    from .pipelines.crawl import CrawlEngine

    # layered resolution: JSON config file (the job artifact) first,
    # explicit CLI flags override, hard defaults last
    conf: dict = {}
    if args.config:
        with open(args.config) as f:
            conf = json.load(f)
    n_seeds = conf.pop("seeds", 1024)
    if args.seeds is not None:
        n_seeds = args.seeds
    web = conf.setdefault("web", {})
    for cli_val, d, key, default in [
        (args.seed, web, "seed", 42),
        (args.hosts, web, "n_hosts", 64),
        (args.path_space, web, "path_space", 1 << 16),
        (args.size_shift, web, "size_shift", 0),
        (args.workdir, conf, "workdir", None),
        (args.max_depth, conf, "max_depth", 2),
        (args.wave, conf, "wave_size", 4096),
        (args.host_budget, conf, "host_budget", 64),
        (args.shards, conf, "n_shards", 8),
        (args.epochs, conf, "max_epochs", 3),
        (args.spill_max_resident, conf, "spill_max_resident", 1 << 20),
        (args.spill_slack, conf, "spill_slack", 8),
    ]:
        if cli_val is not None:
            d[key] = cli_val
        elif key not in d and default is not None:
            d[key] = default
    if args.verify_rows:
        conf["verify_rows"] = True
    if not conf.get("workdir"):
        print("a workdir is required (--workdir or 'workdir' in --config)",
              file=sys.stderr)
        ray.shutdown()
        return 2

    cfg = CrawlConfig.from_dict(conf)
    engine = CrawlEngine(cfg)
    if args.resume:
        summary = engine.run(resume=True)
    else:
        summary = engine.run(seeds=seeds_table(cfg.web, n_seeds))
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
