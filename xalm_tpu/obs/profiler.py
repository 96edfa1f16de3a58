"""Name-keyed aggregate wall-time profiler.

The host-side equivalent of the reference's RAII ``profile(...)`` macro +
``Profiler::report()`` table (reference src/profiler.h:16-74): scopes record
{total_us, calls} into a global map keyed by a format string, and ``report()``
prints the aggregate table. On TPU the *device* time lives in ``jax.profiler``
traces; this profiler times host-visible stages (load, prefill, decode step
round-trips) which is what the end-user throughput accounting needs.
"""

from __future__ import annotations

import contextlib
import threading
import time

from xalm_tpu.obs.table import Table

__all__ = ["profile", "report", "reset", "get"]

_lock = threading.Lock()
_entries: dict[str, list[float]] = {}  # name -> [total_seconds, calls]


@contextlib.contextmanager
def profile(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            e = _entries.setdefault(name, [0.0, 0])
            e[0] += dt
            e[1] += 1


def get(name: str) -> tuple[float, int]:
    with _lock:
        e = _entries.get(name, [0.0, 0])
        return e[0], int(e[1])


def reset() -> None:
    with _lock:
        _entries.clear()


def report() -> str:
    tbl = Table(["scope", "calls", "total ms", "avg us"])
    with _lock:
        for name, (total, calls) in sorted(_entries.items(), key=lambda kv: -kv[1][0]):
            tbl.add(name, calls, f"{total * 1e3:.2f}", f"{total / max(calls, 1) * 1e6:.1f}")
    return tbl.format(title="profiler report")
