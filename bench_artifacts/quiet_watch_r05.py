"""Poll the host-weather probe; on a quiet draw (<=1.3 s), immediately
run an interleaved 4/16-cpu scaling pair (best-of-2) and save it."""
import json, os, subprocess, sys, time
REPO = "/root/repo"

def probe():
    import numpy as np
    a = np.random.default_rng(0).random((2000, 2000))
    t = time.monotonic()
    for _ in range(2): a @ a
    return round(time.monotonic() - t, 3)

def run(ncpu):
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), RAY_GRAFT_CRAWL_ONLY="1",
               RAY_GRAFT_WAVE="368640", RAY_GRAFT_SHIFT="1", RAY_GRAFT_TOPK_MAX="65536")
    p0 = probe()
    out = subprocess.run([sys.executable, "bench.py"], env=env, capture_output=True,
                         text=True, check=True, cwd=REPO).stdout
    d = json.loads(out.strip().splitlines()[-1])
    return {"wall": d["crawl"]["wall_sec"], "probe_before": p0,
            "probe_in": d["host_probe_sec"], "fps": d["crawl"]["fetched_per_sec"]}

deadline = time.monotonic() + float(sys.argv[1]) * 60
while time.monotonic() < deadline:
    p = probe()
    print(f"{time.strftime('%H:%M:%S')} probe {p}", flush=True)
    if p <= 1.45:
        print("QUIET WINDOW — firing focused session", flush=True)
        runs = {4: [], 16: []}
        for i in range(2):
            for n in (4, 16):
                r = run(n)
                runs[n].append(r)
                print(n, r, flush=True)
        w4 = min(r["wall"] for r in runs[4]); w16 = min(r["wall"] for r in runs[16])
        res = {"eff_4_16": round((w4 / w16) / 4, 3), "sec_4": w4, "sec_16": w16,
               "all": {str(k): v for k, v in runs.items()}, "trigger_probe": p}
        print(json.dumps(res), flush=True)
        json.dump(res, open(os.path.join(REPO, "bench_artifacts/scaling_r05_quiet145.json"), "w"), indent=1)
        break
    time.sleep(240)
else:
    print("no quiet window within budget", flush=True)
