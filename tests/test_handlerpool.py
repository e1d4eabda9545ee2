"""T4 handler-pool semantics (apilib.py ObjectPool/BaseObject contract):
quota disable, rotation to the next usable handler, logical-clock
re-enable, NoActiveHandlersAvailable abort."""

from __future__ import annotations

import numpy as np
import pytest

from crawlerframework_ray.state.handlerpool import (
    HandlerPool,
    NoActiveHandlersAvailable,
    run_key_stream,
)


def test_rotation_and_disable():
    # quota 3, reset 12: h0 serves 0-2, disabled at attempt 3; h1 3-5; h2 6-8
    hid, _ = run_key_stream(9, 3, 3, 12)
    assert hid.tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_abort_when_all_disabled_then_reenable():
    # after 9 served all three are down until ticks 15/18/21 -> aborts 9-14,
    # h0 re-enables at tick 15 (disabled at tick 3 + reset 12)
    hid, n_rl = run_key_stream(17, 3, 3, 12)
    assert hid[9:15].tolist() == [-1] * 6
    assert hid[15] == 0 and hid[16] == 0
    assert n_rl == 3  # one rate-limit event per handler


def test_reenabled_handler_window_resets():
    hid, _ = run_key_stream(20, 3, 3, 12)
    # h0's second window serves a fresh quota of 3 (ticks 15-17)
    assert hid[15:18].tolist() == [0, 0, 0]
    # then rotation moves on (h1 re-enabled at 18)
    assert hid[18] == 1


def test_no_active_handlers_raises():
    pool = HandlerPool(n_handlers=2, quota=1, reset_ticks=100)
    assert pool.acquire_and_serve(0) == 0
    assert pool.acquire_and_serve(1) == 1  # h0 rate-limited, rotated
    with pytest.raises(NoActiveHandlersAvailable):
        pool.acquire_and_serve(2)


def test_single_handler_duty_cycle():
    # one handler, quota 2, reset 4: serve 2, dark 4, serve 2, ...
    hid, _ = run_key_stream(12, 1, 2, 4)
    assert hid.tolist() == [0, 0, -1, -1, -1, -1, 0, 0, -1, -1, -1, -1]


def test_matches_independent_golden_sim():
    """Cross-check the pool objects against the array-state simulation
    used for the golden oracle (tools/make_goldens.py api_rotation)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "mg", os.path.join(os.path.dirname(__file__), "..", "tools", "make_goldens.py")
    )
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)

    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 200))
        quota = int(rng.integers(1, 6))
        reset = int(rng.integers(1, 25))
        hid, _ = run_key_stream(n, 3, quota, reset)
        # inline replica of the golden's array-state protocol
        until = np.zeros(3, dtype=np.int64)
        spent = np.zeros(3, dtype=np.int64)
        ref = np.full(n, -1, dtype=np.int64)
        for tick in range(n):
            for h in range(3):
                if until[h] > tick:
                    continue
                if until[h]:
                    spent[h] = 0
                    until[h] = 0
                if spent[h] >= quota:
                    until[h] = tick + reset
                    continue
                spent[h] += 1
                ref[tick] = h
                break
        assert hid.tolist() == ref.tolist(), (n, quota, reset)
