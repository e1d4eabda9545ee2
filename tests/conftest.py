"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # advertise two token-class custom resources so the T3
        # node-label placement path (state/affinity.py) is testable
        # single-node — on a real cluster these come from `ray start
        # --resources` on the nodes holding each class's sessions
        resources={"token_class_0": 4, "token_class_1": 4},
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()
