"""T4: per-key rate-limited API handler pool.

The reference keeps one pool of API handlers per site key
(``crawler/utils/authlib/apilib.py:14-96`` ``ObjectPool``): ``get(key)``
returns the first *usable* handler, a rate-limited call disables its
handler and retries on the next one (``BaseObject.fetch``,
apilib.py:137-154), a ``Timer`` re-enables it after the reset window
(``resetStateAfter``, apilib.py:120-131), and when every handler of a
key is disabled ``NoActiveHandlersAvailable`` aborts the request
(apilib.py:66-83).

Ray-Data-first shape: the protocol is inherently SEQUENTIAL per key —
in the reference each site's connector drives its pool serially — so
the distributed form co-locates one key's request stream in one task
(``groupby(key-bucket).map_groups``) and runs the rotation there, while
distinct keys run fully in parallel. Wall-clock timers become a logical
clock (one tick per request of that key): deterministic, testable, and
identical under retry/resume. Partitioning assumption (documented per
the survey's custom-operator rule): one key's stream fits a task; a key
whose stream doesn't fit splits by time-window upstream, each window
carrying its pool state forward.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


class NoActiveHandlersAvailable(Exception):
    """Raised when every handler of a pool key is disabled
    (apilib.py:66-73)."""


class GotRateLimited(Exception):
    """Raised by a handler whose quota for the current window is spent
    (apilib.py:137-150 contract)."""

    def __init__(self, reset_after: int):
        super().__init__(f"rate limited, reset after {reset_after} ticks")
        self.reset_after = reset_after


@dataclass
class _Handler:
    hid: int
    quota: int
    reset_ticks: int
    enabled: bool = True
    reenable_at: int = 0
    served_in_window: int = 0

    def usable(self, tick: int) -> bool:
        if not self.enabled and tick >= self.reenable_at:
            # lazy Timer: the reset window elapsed on the logical clock
            self.enabled = True
            self.served_in_window = 0
        return self.enabled

    def serve(self, tick: int) -> None:
        if self.served_in_window >= self.quota:
            raise GotRateLimited(self.reset_ticks)
        self.served_in_window += 1

    def disable(self, tick: int) -> None:
        self.enabled = False
        self.reenable_at = tick + self.reset_ticks


@dataclass
class HandlerPool:
    """One key's pool. ``acquire_and_serve`` is the reference's
    ``pool.get(key).fetch(...)`` loop: first usable handler serves; a
    rate-limited handler is disabled and the NEXT usable one is tried;
    exhausting the pool raises ``NoActiveHandlersAvailable``."""

    n_handlers: int
    quota: int
    reset_ticks: int
    handlers: list[_Handler] = field(default_factory=list)
    n_rate_limit_events: int = 0

    def __post_init__(self):
        self.handlers = [
            _Handler(h, self.quota, self.reset_ticks) for h in range(self.n_handlers)
        ]

    def acquire_and_serve(self, tick: int) -> int:
        """Serve one request at logical time ``tick``; return the
        handler id that served it."""
        while True:
            usable = [h for h in self.handlers if h.usable(tick)]
            if not usable:
                raise NoActiveHandlersAvailable("No Active Handlers Found")
            h = usable[0]  # apilib.py:68-71 sorted()[0]
            try:
                h.serve(tick)
                return h.hid
            except GotRateLimited as e:
                self.n_rate_limit_events += 1
                h.disable(tick)  # resetStateAfter(e.reset_after)
                # loop = retry on next usable handler (apilib.py:151-154)


def run_key_stream(
    n_requests: int, n_handlers: int, quota: int, reset_ticks: int
) -> tuple[np.ndarray, int]:
    """Run one key's deterministic request stream through a fresh pool.
    Returns (per-request handler id, -1 where aborted; rate-limit event
    count). One tick per request — the synthetic analogue of the
    reference's wall-clock reset windows."""
    pool = HandlerPool(n_handlers, quota, reset_ticks)
    out = np.empty(n_requests, dtype=np.int64)
    for t in range(n_requests):
        try:
            out[t] = pool.acquire_and_serve(t)
        except NoActiveHandlersAvailable:
            out[t] = -1
    return out, pool.n_rate_limit_events
