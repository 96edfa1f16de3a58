"""Console / ProgressBar / SystemUsage tests (reference console.h, profiler.h:76-178)."""

import io
import time

import pytest

from xalm_tpu.obs.console import ProgressBar, SystemUsage, error, scoped_usage


def test_system_usage_measures_wall_and_cpu():
    t0, r0 = SystemUsage._now()
    x = 0
    for i in range(200_000):
        x += i * i
    time.sleep(0.02)
    u = SystemUsage.measure(t0, r0)
    assert u.wall_ms >= 20
    assert u.user_ms >= 0
    assert u.max_rss_kb > 0
    out = u.format()
    assert "wall time" in out and "ctx switches" in out
    assert "kB" in out


def test_scoped_usage_yields_usage():
    with scoped_usage("stage", report=False) as s:
        time.sleep(0.01)
    assert s["usage"].wall_ms >= 10


def test_progress_bar_completes_and_reports():
    buf = io.StringIO()  # not a tty: no repaint spam, still a done summary
    with ProgressBar("load", total=5, interval=0.01, stream=buf) as bar:
        for _ in range(5):
            bar.advance()
            time.sleep(0.005)
    out = buf.getvalue()
    assert "load: done" in out
    assert "wall" in out


def test_progress_bar_render_clamps():
    bar = ProgressBar("x", total=4, stream=io.StringIO())
    bar.set(9)
    assert "9/4" in bar._render()
    assert "█" * bar.WIDTH in bar._render()


def test_error_exits():
    with pytest.raises(SystemExit) as e:
        error("boom", code=3)
    assert e.value.code == 3
