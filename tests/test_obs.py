"""Observability: histogram sparklines, tensor dumps, container CLI, profiler."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.obs.inspect import container_cli, format_tensor
from xalm_tpu.obs.profiler import profile, report, reset
from xalm_tpu.obs.stats import Histogram


def test_histogram():
    h = Histogram(np.linspace(-1, 1, 1000))
    assert h.n == 1000
    assert h.min == -1 and h.max == 1
    assert abs(h.mean) < 1e-9
    line = h.sparkline()
    assert len(line) == 10
    # uniform data -> all bins roughly equal height
    assert len(set(line)) <= 2

    g = Histogram(np.random.default_rng(0).normal(size=5000))
    s = g.sparkline()
    assert s[4] > s[0] and s[5] > s[9]  # bell shape

    off, scale = Histogram(np.array([2.0, 6.0])).suggest_scale()
    assert off == 4.0 and scale == 0.5

    assert "min=" in g.format()


def test_format_tensor():
    arr = np.random.default_rng(1).normal(size=(4, 64)).astype(np.float32)
    out = format_tensor(arr, "w")
    assert "w float32 4x64" in out
    assert out.count("\n") >= 7
    big = format_tensor(np.zeros((40, 8), np.float32), "z", max_rows=4)
    assert "more rows" in big


def test_container_cli(tmp_path, capsys):
    hf = make_tiny_model(str(tmp_path / "hf"))
    out = str(tmp_path / "t.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "i8"]) == 0
    assert container_cli([out, "--verify"]) == 0
    text = capsys.readouterr().out
    assert "embed.weight" in text and "hashes verified" in text
    assert container_cli([out, "--dump", "l.0.attn.q.weight"]) == 0
    text = capsys.readouterr().out
    assert "l.0.attn.q.weight float32" in text
    # --hist: histogram-in-cell listing (reference table.h / stats.h:38-53)
    assert container_cli([out, "--hist"]) == 0
    text = capsys.readouterr().out
    assert "distribution" in text and "min" in text
    assert any(c in text for c in "▁▂▃▄▅▆▇█")


def test_profiler():
    reset()
    with profile("outer"):
        with profile("inner"):
            pass
    with profile("inner"):
        pass
    rep = report()
    assert "outer" in rep and "inner" in rep
    from xalm_tpu.obs.profiler import get

    total, calls = get("inner")
    assert calls == 2 and total >= 0


def test_uniform_fixture_deterministic():
    from xalm_tpu.obs.inspect import uniform

    a = uniform((4, 8))
    b = uniform((4, 8))
    np.testing.assert_array_equal(a, b)  # fixed seed 42 (reference tensor.cpp:94)
    assert a.min() >= -1.0 and a.max() <= 1.0 and a.dtype == np.float32


def test_save_csv_roundtrip(tmp_path):
    from xalm_tpu.obs.inspect import save_csv, uniform

    x = uniform((3, 5))
    p = tmp_path / "t.csv"
    save_csv(x, str(p))
    back = np.loadtxt(p, delimiter=",")
    np.testing.assert_allclose(back, x, rtol=1e-6)

    x3 = uniform((2, 3, 4))
    save_csv(x3, str(p))
    assert np.loadtxt(p, delimiter=",").shape == (2, 12)


def test_human_size():
    from xalm_tpu.obs.table import human_size

    assert human_size(0) == "0 B"
    assert human_size(1023) == "1023 B"
    assert human_size(1024) == "1.00 KiB"
    assert human_size(14_500_000_000) == "13.50 GiB"


def test_histogram_streaming_constant_memory():
    # incremental adds keep O(bins) state, and a range-extending add
    # re-anchors the existing mass instead of retaining raw arrays
    h = Histogram(bins=10)
    rng = np.random.default_rng(1)
    for _ in range(50):
        h.add(rng.normal(size=1000))
    assert h._cells.size == 10 * 64  # no raw arrays retained
    assert h.n == 50_000
    assert h.counts.sum() == 50_000
    total_before = h.counts.sum()
    h.add(np.array([100.0]))  # extend the range: mass is preserved
    assert h.counts.sum() == total_before + 1
    assert h.max == 100.0


def test_histogram_matches_batch_binning():
    # single-batch add equals a one-shot numpy histogram
    data = np.random.default_rng(2).normal(size=4000)
    h = Histogram(data, bins=10)
    want, _ = np.histogram(data, bins=10, range=(data.min(), data.max()))
    # the top edge is inclusive in both
    np.testing.assert_array_equal(h.counts, want)


def test_table_alignment_and_formats():
    """Deduced alignment (numbers right, text left), per-column format
    specs incl. the human-size "h" spec (reference table.h:24-105,
    159-199)."""
    from xalm_tpu.obs.table import Table

    t = Table(["name", "n", "bytes"], formats={"n": ".1f", "bytes": "h"})
    t.add("alpha", 1.25, 2048)
    t.add("b", 10.0, 1023)
    out = t.format()
    lines = out.splitlines()
    # numeric columns right-aligned, text left-aligned
    assert "| alpha | " in lines[3]
    assert "|  1.2 |" in lines[3].replace("1.2", "1.2")  # formatted .1f
    assert " 1.2 |" in lines[3] and " 2.00 KiB |" in lines[3]
    assert " 10.0 |" in lines[4] and " 1023 B |" in lines[4]
    # right alignment: the shorter number is padded on the LEFT
    n_col = [ln.split("|")[2] for ln in lines[3:5]]
    assert n_col[0].rstrip().startswith(" ") and n_col[0].endswith("1.2 ")


def test_table_histogram_cell():
    """A Histogram value renders as its sparkline in-cell (reference
    table.h histogram cells used by the container listing xalm.h:49-62)."""
    from xalm_tpu.obs.stats import Histogram
    from xalm_tpu.obs.table import Table

    h = Histogram(np.linspace(-1, 1, 257))
    t = Table(["row", "dist"])
    t.add(0, h)
    out = t.format()
    assert h.sparkline() in out


def test_table_explicit_align_override():
    from xalm_tpu.obs.table import Table

    t = Table(["x"], align={"x": "r"})
    t.add("ab")
    t.add("wider")
    body = t.format().splitlines()[3]
    assert "|    ab |" in body
