"""`python -m crawlerframework_ray` — the ray-job-submit surface,
driven end-to-end in subprocesses (each invocation owns its Ray
session, exactly as a submitted job driver would).

Gates (VERDICT r4 order #7): the JSON --config artifact runs a crawl;
a run stopped at 2 epochs resumes with --resume to the full 4 and
lands on the same counters as an uninterrupted 4-epoch run (the CLI
form of tests/test_checkpoint.py's bit-identical-resume gate); config
typos fail loudly; gc and the query catalog listing respond.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WEB = {"seed": 11, "n_hosts": 8, "path_space": 96, "max_outlinks": 5}
_BASE = {
    "web": _WEB,
    "max_depth": 2,
    "wave_size": 48,
    "host_budget": 12,
    "n_shards": 4,
    "shard_capacity": 1 << 14,
    "seeds": 24,
}


def _run_cli(*argv: str, timeout: int = 300) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "crawlerframework_ray", *argv],
        env=env,
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def _crawl_json(proc: subprocess.CompletedProcess) -> dict:
    assert proc.returncode == 0, proc.stderr[-4000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def config_runs(tmp_path_factory):
    """One full 4-epoch run + one 2-epoch-then-resume pair, all via
    --config artifacts."""
    root = tmp_path_factory.mktemp("cli")

    full_cfg = dict(_BASE, workdir=str(root / "full"), max_epochs=4)
    half_cfg = dict(_BASE, workdir=str(root / "half"), max_epochs=2)
    resume_cfg = dict(_BASE, workdir=str(root / "half"), max_epochs=4)
    paths = {}
    for name, cfg in [("full", full_cfg), ("half", half_cfg),
                      ("resume", resume_cfg)]:
        p = root / f"{name}.json"
        p.write_text(json.dumps(cfg))
        paths[name] = str(p)

    full = _crawl_json(_run_cli("crawl", "--config", paths["full"],
                                "--num-cpus", "4"))
    half = _crawl_json(_run_cli("crawl", "--config", paths["half"],
                                "--num-cpus", "4"))
    resumed = _crawl_json(_run_cli("crawl", "--config", paths["resume"],
                                   "--resume", "--num-cpus", "4"))
    return full, half, resumed


def test_config_crawl_runs(config_runs):
    full, half, _ = config_runs
    assert full["fetched_urls"] > 0
    assert full["epochs"] == 4
    assert half["epochs"] == 2
    assert 0 < half["fetched_urls"] < full["fetched_urls"]


def test_resume_reaches_full_counters(config_runs):
    full, _, resumed = config_runs
    # resumed run reports epochs 2..3 on top of the checkpoint; its
    # cumulative counters must equal the uninterrupted run's
    assert resumed["fetched_urls"] == full["fetched_urls"]
    assert resumed["raw_outlinks"] == full["raw_outlinks"]
    assert resumed["fresh_urls"] == full["fresh_urls"]
    assert resumed["final_frontier"] == full["final_frontier"]
    assert resumed["seen_total"] == full["seen_total"]


def test_cli_flag_overrides_config(config_runs, tmp_path):
    # --epochs 1 must beat the config file's max_epochs
    cfg = dict(_BASE, workdir=str(tmp_path / "ovr"), max_epochs=4)
    p = tmp_path / "ovr.json"
    p.write_text(json.dumps(cfg))
    out = _crawl_json(_run_cli("crawl", "--config", str(p),
                               "--epochs", "1", "--num-cpus", "4"))
    assert out["epochs"] == 1


def test_unknown_config_key_fails_loudly(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(dict(_BASE, workdir=str(tmp_path / "x"),
                                 wave_sz=99)))
    proc = _run_cli("crawl", "--config", str(p), "--num-cpus", "4")
    assert proc.returncode != 0
    assert "wave_sz" in (proc.stderr + proc.stdout)


def test_missing_workdir_rejected(tmp_path):
    p = tmp_path / "nw.json"
    p.write_text(json.dumps(_BASE))
    proc = _run_cli("crawl", "--config", str(p), "--num-cpus", "4")
    assert proc.returncode == 2
    assert "workdir" in proc.stderr


def test_gc_and_query_listing(config_runs):
    full, _, _ = config_runs
    gc = _run_cli("gc", "--workdir", full["workdir"], "--keep-last", "1")
    assert gc.returncode == 0
    json.loads(gc.stdout.strip())  # structured report
    lst = _run_cli("query", timeout=120)
    assert lst.returncode == 0
    lines = lst.stdout.strip().splitlines()
    assert len(lines) >= 400
    assert any(l.startswith("crawl_frontier_pipeline") for l in lines)
