"""T3 token-affinity placement: the node-label (custom-resource)
scheduling form next to the named-actor identity guarantee. The test
session advertises token_class_0/1 resources (conftest), standing in
for `ray start --resources` on a real cluster's labeled nodes."""

from __future__ import annotations

import pyarrow as pa


def test_token_resources_detected_and_consumed(ray_session):
    import ray

    from crawlerframework_ray.state.affinity import (
        AffinityRouter,
        make_token_workers,
        token_of,
        token_resources_available,
    )

    assert token_resources_available(2)
    assert not token_resources_available(3)  # only 2 classes advertised

    names, handles = make_token_workers(2, "resalloc-test")  # auto-detects
    try:
        # the workers hold their resource slice: cluster availability
        # drops. available_resources() is heartbeat-sampled and lags
        # actor scheduling by up to a few hundred ms — poll, don't
        # single-sample (observed flaking once in ~20 suite runs)
        import time

        deadline = time.monotonic() + 15
        while time.monotonic() < deadline:
            avail = ray.available_resources()
            if (avail.get("token_class_0", 0) < 4
                    and avail.get("token_class_1", 0) < 4):
                break
            time.sleep(0.2)
        assert avail.get("token_class_0", 0) < 4
        assert avail.get("token_class_1", 0) < 4

        # routing semantics identical to the named-actor form
        keys = [f"k{i}" for i in range(64)]
        batch = pa.table({"key": pa.array(keys, pa.string())})
        out = AffinityRouter(names, "key")(batch)
        toks = out.column("token").to_pylist()
        assert toks == [token_of(k, 2) for k in keys]
        reports = ray.get([h.report.remote() for h in handles])
        for t, counts in reports:
            assert all(token_of(k, 2) == t for k in counts)
        assert sum(len(c) for _, c in reports) == len(set(keys))
    finally:
        for h in handles:
            ray.kill(h)


def test_resource_pinning_off_when_not_advertised(ray_session):
    import ray

    from crawlerframework_ray.state.affinity import make_token_workers

    # 3 classes: token_class_2 is NOT advertised — auto-detect must fall
    # back to plain named actors (use_resources=False) so the spawn
    # doesn't deadlock waiting for an unsatisfiable resource
    names, handles = make_token_workers(3, "resalloc-fallback")
    try:
        assert len(names) == 3
        assert ray.get(handles[2].report.remote())[0] == 2
    finally:
        for h in handles:
            ray.kill(h)
