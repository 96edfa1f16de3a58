"""Streaming histogram with unicode sparkline (reference src/stats.h:10-95).

Used for weight-distribution inspection during quantization work — per-row
histograms in tensor dumps and scale suggestions for quantization ranges.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Histogram"]

_BLOCKS = " ▁▂▃▄▅▆▇█"


class Histogram:
    def __init__(self, data=None, bins: int = 10):
        self.bins = bins
        self.counts = np.zeros(bins, np.int64)
        self.min = np.inf
        self.max = -np.inf
        self.sum = 0.0
        self.n = 0
        self._pending: list[np.ndarray] = []
        if data is not None:
            self.add(data)

    def add(self, data) -> "Histogram":
        arr = np.asarray(data, np.float64).ravel()
        if arr.size == 0:
            return self
        self.min = min(self.min, float(arr.min()))
        self.max = max(self.max, float(arr.max()))
        self.sum += float(arr.sum())
        self.n += arr.size
        self._pending.append(arr)
        return self

    def _materialize(self):
        if not self._pending:
            return
        lo, hi = self.min, self.max
        if hi <= lo:
            hi = lo + 1e-12
        counts = np.zeros(self.bins, np.int64)
        for arr in self._pending:
            idx = np.clip(((arr - lo) / (hi - lo) * self.bins).astype(int), 0, self.bins - 1)
            counts += np.bincount(idx, minlength=self.bins)
        self.counts = counts
        self._pending_done = True

    @property
    def mean(self) -> float:
        return self.sum / self.n if self.n else 0.0

    def sparkline(self) -> str:
        """Unicode block-char histogram (reference stats.h:38-53)."""
        self._materialize()
        peak = self.counts.max()
        if peak == 0:
            return " " * self.bins
        return "".join(_BLOCKS[int(c / peak * (len(_BLOCKS) - 1))] for c in self.counts)

    def suggest_scale(self, target_max: float = 1.0) -> tuple[float, float]:
        """(offset, scale) mapping the data range onto [-target_max, target_max]
        — the quantization-range helper (reference stats.h)."""
        if self.n == 0:
            return 0.0, 1.0
        offset = (self.max + self.min) / 2
        half = max(self.max - offset, offset - self.min, 1e-12)
        return offset, target_max / half

    def format(self) -> str:
        self._materialize()
        return (
            f"[{self.sparkline()}] min={self.min:+.4g} max={self.max:+.4g} "
            f"mean={self.mean:+.4g} n={self.n}"
        )
