"""Tensor pretty-printing: per-row histogram/min/max/sum dumps.

The quantization-inspection tool the reference builds into Tensor::format
(reference tensor.cpp:160-203): each leading-dim row gets a sparkline of its
value distribution plus summary stats.
"""

from __future__ import annotations

import numpy as np

from xalm_tpu.obs.stats import Histogram
from xalm_tpu.obs.table import Table

__all__ = ["format_tensor", "save_csv", "uniform", "container_cli"]


def uniform(shape, low: float = -1.0, high: float = 1.0, seed: int = 42) -> np.ndarray:
    """Deterministic uniform test fixture — fixed seed 42 like the
    reference's Tensor::uniform (tensor.cpp:94), the reproducible source of
    bench/test inputs (SURVEY.md §4 item 4)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(low, high, size=shape).astype(np.float32)


def save_csv(arr: np.ndarray, path: str, fmt: str = "%.8g") -> None:
    """Dump a tensor (rank<=2 as-is, higher ranks flattened to 2-D) to CSV
    (reference Tensor::save_to_csv, tensor.cpp:298-330)."""
    a = np.asarray(arr)
    a = a.astype(np.float32) if a.dtype.kind not in "fiu" else a
    if a.ndim == 0:
        a = a.reshape(1, 1)
    elif a.ndim == 1:
        a = a.reshape(1, -1)
    elif a.ndim > 2:
        a = a.reshape(a.shape[0], -1)
    np.savetxt(path, a, fmt=fmt, delimiter=",")


def format_tensor(arr: np.ndarray, name: str = "", max_rows: int = 16) -> str:
    arr = np.asarray(arr)
    f = arr.astype(np.float32) if arr.dtype != np.float32 else arr
    title = f"{name} {arr.dtype} {'x'.join(map(str, arr.shape))}"
    tbl = Table(
        ["row", "histogram", "min", "max", "mean", "sum"],
        formats={c: "+.4g" for c in ("min", "max", "mean", "sum")},
    )
    rows = f.reshape(f.shape[0], -1) if f.ndim > 1 else f.reshape(1, -1)
    n = min(len(rows), max_rows)
    for i in range(n):
        h = Histogram(rows[i])
        tbl.add(i, h, float(h.min), float(h.max), float(h.mean), float(h.sum))
    if len(rows) > n:
        tbl.add("…", f"({len(rows) - n} more rows)", "", "", "", "")
    return tbl.format(title=title)


def container_cli(argv=None) -> int:
    """``python -m xalm_tpu.obs.inspect model.xalm [--dump tensor] [--verify]``
    — the reference's container listing (xalm.h:49-62) + tensor dumps +
    hash verification."""
    import argparse

    from xalm_tpu import quant
    from xalm_tpu.io import XalmFile

    p = argparse.ArgumentParser(prog="xalm-inspect")
    p.add_argument("checkpoint")
    p.add_argument("--dump", help="tensor name to dump with per-row histograms")
    p.add_argument("--hist", action="store_true",
                   help="add per-tensor distribution sparklines + min/max to "
                   "the listing (dequantizes every tensor)")
    p.add_argument("--verify", action="store_true", help="check all content hashes")
    args = p.parse_args(argv)

    with XalmFile(args.checkpoint) as xf:
        if args.dump:
            info = xf.tensors[args.dump]
            raw = xf.load(args.dump)
            scale = None
            sname = args.dump + ".scale"
            if info.dtype.name == "i8" and sname in xf.tensors:
                scale = xf.load(sname)
            vals = quant.dequantize(raw, info.dtype.name, scale)
            print(format_tensor(vals, args.dump))
        else:
            print(xf.format(histograms=args.hist))
            print(f"arch: {xf.arch}")
            for k, v in xf.config.items():
                print(f"  {k} = {v}")
        if args.verify:
            bad = [n for n in xf.tensors if not xf.verify(n)]
            if bad:
                print(f"HASH MISMATCH: {bad}")
                return 1
            print(f"all {len(xf.tensors)} tensor hashes verified")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(container_cli())
