"""Same-window paired bench arms: because both arms of each pair run
back-to-back in one session, the pair's RATIO is meaningful even in a
noisy window (both arms share the weather); probes before/between/after
each arm are recorded so the window is characterized honestly.

Pairs:
  octave:  wave 2.95M vs 5.9M, spill forced (131072) — finalize
           sub-linearity one octave past the r3 series (VERDICT #8)
  spillab: spill ON (65536, slack 2) vs OFF (1<<30) at 5.9M wave,
           politeness-bound budget 2000 — spill-active overhead
"""
import json, os, subprocess, sys, time

REPO = "/root/repo"
OUT = "/tmp/bench_r04"
LOG = os.path.join(OUT, "pairs.log")


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


def run_arm(name, env):
    e = dict(os.environ)
    e.update(env)
    p0 = probe()
    t0 = time.monotonic()
    r = subprocess.run([sys.executable, "bench.py"], env=e, capture_output=True,
                       text=True, cwd=REPO, timeout=7200)
    wall = round(time.monotonic() - t0, 1)
    p1 = probe()
    out = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    try:
        d = json.loads(out)
    except Exception:
        log(f"{name}: PARSE FAIL rc={r.returncode} wall={wall} stderr_tail={r.stderr[-300:]}")
        return None
    d["_arm"] = name
    d["_probe_before"] = p0
    d["_probe_after"] = p1
    d["_arm_wall"] = wall
    log(f"{name}: crawl={d.get('crawl', {}).get('wall_sec')} probes={p0}/{p1} "
        f"spill={d.get('crawl', {}).get('spill')}")
    return d


BASE16 = {"RAY_GRAFT_CPUS": "16", "RAY_GRAFT_SHIFT": "1",
          "RAY_GRAFT_CRAWL_ONLY": "1", "RAY_GRAFT_TOPK_MAX": "65536"}

ARMS = [
    ("octave_w2949120", dict(BASE16, RAY_GRAFT_WAVE="2949120", RAY_GRAFT_SPILL="131072")),
    ("octave_w5898240", dict(BASE16, RAY_GRAFT_WAVE="5898240", RAY_GRAFT_SPILL="131072")),
    ("spill_on_w5898240", dict(BASE16, RAY_GRAFT_WAVE="5898240", RAY_GRAFT_BUDGET="2000",
                               RAY_GRAFT_SPILL="65536", RAY_GRAFT_SPILL_SLACK="2")),
    ("spill_off_w5898240", dict(BASE16, RAY_GRAFT_WAVE="5898240", RAY_GRAFT_BUDGET="2000",
                                RAY_GRAFT_SPILL=str(1 << 30))),
]

log(f"pairs started, initial probe={probe()}")
results = [r for name, env in ARMS if (r := run_arm(name, env)) is not None]
with open(os.path.join(OUT, "pairs.json"), "w") as f:
    json.dump(results, f, indent=1)
log("pairs done")
