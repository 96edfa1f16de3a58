"""Device mesh construction for data x tensor parallelism.

The reference is single-process/single-device (SURVEY.md §2.4); every
distributed capability here is the target-platform extension mapped in
SURVEY.md §2.4/§5.8: a ("dp", "tp") mesh where tp rides ICI within a slice
and dp spans hosts/DCN for continuous batching.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "AXIS_DP", "AXIS_TP"]

AXIS_DP = "dp"
AXIS_TP = "tp"


def make_mesh(dp: int = 1, tp: int | None = None, devices=None) -> Mesh:
    """A (dp, tp) mesh. tp defaults to all remaining devices.

    tp must divide n_kv_heads so GQA stays chip-local during decode
    (SURVEY.md §7: KV never crosses chips) — validated at sharding time.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if tp is None:
        if n % dp != 0:
            raise ValueError(f"{n} devices not divisible by dp={dp}")
        tp = n // dp
    if dp * tp > n:
        raise ValueError(f"dp*tp = {dp}*{tp} > {n} devices")
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (AXIS_DP, AXIS_TP))
