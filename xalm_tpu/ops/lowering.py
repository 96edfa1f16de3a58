"""Lowering-target resolution for the Pallas kernels.

The kernels normally pick real-Mosaic vs interpret mode from the process
default backend (CPU pytest mesh -> interpret; real chip -> Mosaic). AOT
compilation against a TPU *topology* (parallel/aot.py) breaks that
heuristic: the process backend may be CPU while the program is being
lowered for real TPUs. ``tpu_lowering()`` overrides the decision for the
duration of a lower()/compile() call.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["interpret_mode", "tpu_lowering", "lowering_for_tpu"]

_FORCE_TPU = False


@contextmanager
def tpu_lowering():
    """Treat the lowering target as real TPU regardless of the process
    default backend (for AOT topology compiles from a CPU-pinned process).
    Not thread-safe; wrap the single lower()/compile() call only."""
    global _FORCE_TPU
    prev = _FORCE_TPU
    _FORCE_TPU = True
    try:
        yield
    finally:
        _FORCE_TPU = prev


def lowering_for_tpu() -> bool:
    """True when the program is being lowered for real TPU hardware."""
    return _FORCE_TPU or jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Pallas interpret mode: only off-TPU, and never under tpu_lowering()."""
    return not lowering_for_tpu()
