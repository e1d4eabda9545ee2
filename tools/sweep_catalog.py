"""Driver-style full-catalog sweep: run every catalog query AND its
DuckDB oracle at the given sf_dir in ONE process, compare rows +
schema + order-insensitive values (the driver's three gates), print a
per-query verdict line and a final tally.

Usage: python tools/sweep_catalog.py [sf_dir] [num_cpus] [--skip-goldens]

``--skip-goldens`` sweeps only the SQL-oracled entries — needed at
sf0.1, where the 70-odd golden-parquet mirrors don't exist (their
serial generators are quadratic at that scale) but every relational
oracle still gates value-exact.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skip-goldens"]
    skip_goldens = "--skip-goldens" in sys.argv[1:]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    ncpu = int(args[1]) if len(args) > 1 else 8

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")

    from crawlerframework_ray.pipelines import queries as q

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    sf_tag = os.path.basename(sf.rstrip("/"))
    n_pass = n_fail = 0
    failures = []
    t_all = time.monotonic()
    names = sorted(q.QUERIES)
    no_oracle = [n for n in names if n not in q.ORACLE_SQL]
    if no_oracle:
        print(f"skipping {len(no_oracle)} entries with no oracle: {no_oracle}")
        names = [n for n in names if n in q.ORACLE_SQL]
    if skip_goldens:
        # explicit registry flag (register() marks oracles that read
        # golden parquet by absolute path) — not SQL-text substring
        names = [n for n in names if n not in q.GOLDEN_QUERIES]
        print(f"--skip-goldens: sweeping {len(names)} SQL-oracled queries")
    for name in names:
        t0 = time.monotonic()
        try:
            res = q.QUERIES[name](sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            sql = q.ORACLE_SQL[name].replace(
                ".sf0.01.parquet", f".{sf_tag}.parquet")
            a = canon(df)
            b = canon(con.execute(sql).df())
            ok = (list(a.columns) == list(b.columns) and len(a) == len(b))
            if ok:
                for c in a.columns:
                    x, y = a[c], b[c]
                    if x.dtype.kind in "iu" or y.dtype.kind in "iu":
                        ok = x.astype("int64").equals(y.astype("int64"))
                    elif x.dtype.kind == "M" or y.dtype.kind == "M":
                        import pandas as pd

                        ok = pd.to_datetime(x).equals(pd.to_datetime(y))
                    else:
                        ok = x.astype(str).equals(y.astype(str))
                    if not ok:
                        break
            verdict = "PASS" if ok else "FAIL"
        except Exception as e:  # noqa: BLE001 - sweep must not abort
            verdict = f"ERROR {e!r:.120}"
            ok = False
        dt = time.monotonic() - t0
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            failures.append(name)
        print(f"{verdict:5s} {name} ({dt:.1f}s)", flush=True)
    print(
        f"SWEEP {sf_tag}: {n_pass}/{n_pass + n_fail} pass "
        f"in {time.monotonic() - t_all:.0f}s; failures: {failures}",
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
