"""Round-5 spill-reload arm (VERDICT r4 order #6): one politeness-bound
crawl-only bench run (budget ≪ frontier, spill threshold 65536, slack
2, 5.9M wave, 16 cpus) on the round-5 binary, recording n_reloads and
the finalize cost per fetched row so BASELINE.md can state "reloads
fire at bench scale AND finalize stays flat" from one artifact.

Probes before/after characterize the window; a paired spill-OFF arm is
optional (--ab) and reuses the r4 A/B geometry.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe():
    import numpy as np
    a = np.random.default_rng(0).random((2000, 2000))
    t = time.monotonic()
    for _ in range(2):
        a @ a
    return round(time.monotonic() - t, 3)


def run_arm(name, env):
    e = dict(os.environ)
    e.update(env)
    p0 = probe()
    r = subprocess.run([sys.executable, "bench.py"], env=e, capture_output=True,
                       text=True, cwd=REPO, timeout=7200)
    p1 = probe()
    d = json.loads(r.stdout.strip().splitlines()[-1])
    d["_arm"] = name
    d["_probe_before"] = p0
    d["_probe_after"] = p1
    crawl = d["crawl"]
    fin = sum(e["sec_final"] for e in crawl["per_epoch"] if "sec_final" in e)
    d["_finalize_sec_total"] = round(fin, 2)
    d["_finalize_us_per_fetched_row"] = round(1e6 * fin / crawl["fetched_urls"], 2)
    return d


BASE16 = {"RAY_GRAFT_CPUS": "16", "RAY_GRAFT_SHIFT": "1",
          "RAY_GRAFT_CRAWL_ONLY": "1", "RAY_GRAFT_TOPK_MAX": "65536"}

ARMS = [
    ("spill_reload_on", dict(BASE16, RAY_GRAFT_WAVE="5898240",
                             RAY_GRAFT_BUDGET="2000",
                             RAY_GRAFT_SPILL="65536",
                             RAY_GRAFT_SPILL_SLACK="2")),
]
if "--ab" in sys.argv:
    ARMS.append(("spill_off", dict(BASE16, RAY_GRAFT_WAVE="5898240",
                                   RAY_GRAFT_BUDGET="2000",
                                   RAY_GRAFT_SPILL=str(1 << 30))))

out_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/tmp/spill_r05.json"
results = []
for name, env in ARMS:
    d = run_arm(name, env)
    print(name, "wall", d["crawl"]["wall_sec"], "spill", d["crawl"]["spill"],
          "finalize_us/row", d["_finalize_us_per_fetched_row"],
          "probes", d["_probe_before"], d["_probe_after"], flush=True)
    results.append(d)
with open(out_path, "w") as f:
    json.dump(results, f, indent=1)
