"""Same-window r3-vs-r4 engine A/B: alternate full bench.py runs from
the round-3 final tree (/tmp/r3tree @ 28a7264) and the round-4 tree
(/root/repo), interleaved r3,r4,r3,r4 so each adjacent pair shares the
host weather.  The RATIO r4/r3 is the deliverable: if <= 1.0 the
round-3 quiet-window marks transfer to the round-4 engine regardless
of what weather the driver's own BENCH_r04 run lands in.

Probes before/after every arm are recorded.  Default bench config
(32 cpus, shift=2, wave 184320) in both trees.
"""
import json, os, subprocess, sys, time

OUT = "/tmp/bench_r04"
LOG = os.path.join(OUT, "ab_r3r4.log")
TREES = {"r3": "/tmp/r3tree", "r4": "/root/repo"}


def log(msg):
    with open(LOG, "a") as f:
        f.write(f"{time.strftime('%H:%M:%S')} {msg}\n")


def probe():
    import numpy as np
    a = np.random.default_rng(0).random((2000, 2000))
    t = time.monotonic()
    for _ in range(2):
        a @ a
    return round(time.monotonic() - t, 3)


def run_arm(name):
    tree = TREES[name]
    p0 = probe()
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, "bench.py"], cwd=tree,
                       capture_output=True, text=True, timeout=3600)
    wall = round(time.monotonic() - t0, 1)
    p1 = probe()
    out = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    try:
        d = json.loads(out)
    except Exception:
        log(f"{name} FAILED rc={r.returncode} wall={wall} stderr_tail={r.stderr[-400:]!r}")
        return None
    d["_arm"] = name
    d["_probe_before"] = p0
    d["_probe_after"] = p1
    d["_arm_wall"] = wall
    log(f"{name}: crawl={d['crawl']['wall_sec']} fetched/s={d['crawl']['fetched_per_sec']} "
        f"queries={ {k: round(v, 2) for k, v in d['queries'].items() if k != 'crawl'} } "
        f"probes={p0}/{p1}")
    return d


def main():
    log(f"ab started, initial probe={probe()}")
    results = []
    for name in ["r3", "r4", "r3", "r4"]:
        d = run_arm(name)
        if d:
            results.append(d)
        with open(os.path.join(OUT, "ab_r3r4.json"), "w") as f:
            json.dump(results, f, indent=1)
    # adjacent-pair ratios
    pairs = []
    for i in range(len(results) - 1):
        a, b = results[i], results[i + 1]
        if {a["_arm"], b["_arm"]} == {"r3", "r4"}:
            r3 = a if a["_arm"] == "r3" else b
            r4 = b if a["_arm"] == "r3" else a
            pairs.append({
                "crawl_ratio_r4_over_r3": round(r4["crawl"]["wall_sec"] / r3["crawl"]["wall_sec"], 3),
                "query_ratios": {k: round(r4["queries"][k] / r3["queries"][k], 3)
                                 for k in r4["queries"] if k in r3["queries"] and k != "crawl"},
            })
    with open(os.path.join(OUT, "ab_r3r4_ratios.json"), "w") as f:
        json.dump(pairs, f, indent=1)
    log(f"ab done: {json.dumps(pairs)}")


if __name__ == "__main__":
    main()
