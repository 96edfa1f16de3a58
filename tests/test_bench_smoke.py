"""Smoke the headline bench (bench.py) end-to-end on CPU.

bench.py is the driver's perf artifact (reference README.md:7-14 measurement
regime) and until now ran only on hardware. ``--mini`` swaps the 7B shapes
for a tiny config so the full flow — synthetic params, engine build, prefill,
scan-decode warmup, timed runs, JSON line — executes in CI. The second test
pins the megakernel-failure fallback: a lowering fault at warmup must rebuild
onto the per-layer path and still produce the JSON line, never kill the bench.
"""

import json
import runpy
import sys

import pytest


def _run_bench(monkeypatch, capsys, argv):
    monkeypatch.setattr(sys, "argv", ["bench.py"] + argv)
    with pytest.raises(SystemExit) as ex:
        runpy.run_path("bench.py", run_name="__main__")
    assert ex.value.code == 0
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_bench_mini_decode(monkeypatch, capsys):
    # DEFAULT run: the shipped q4 configuration (group auto-clamps to the
    # mini dims), parsed by the driver as the headline metric
    rec = _run_bench(monkeypatch, capsys, ["--mini", "--steps", "4"])
    assert rec["metric"] == "mistral7b_q4_decode_tok_s_per_chip"
    assert rec["unit"] == "tok/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 63.8, rel=1e-3)


def test_bench_long_generation_leg(monkeypatch, capsys):
    """--long N: a true chunked multi-scan generation (reference
    README.md:14's ~4800-token row), averaged over every dispatch."""
    rec = _run_bench(
        monkeypatch, capsys,
        ["--mini", "--steps", "4", "--long", "8", "--dtype", "i8"],
    )
    assert rec["metric"] == "mistral7b_i8_decode_tok_s_long8"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 58.7, rel=1e-3)


def test_bench_megakernel_fallback(monkeypatch, capsys):
    """An exception in the first decode_scan (how a Mosaic lowering failure
    of the fused megakernel surfaces) must fall back to fused_step=False and
    complete the bench."""
    from xalm_tpu.runtime.engine import Engine

    orig = Engine.decode_scan
    state = {"fails": 0}

    def flaky(self, *a, **k):
        if state["fails"] == 0:
            state["fails"] += 1
            raise RuntimeError("injected mosaic lowering failure")
        assert self.fused_step is False, "fallback engine must disable the megakernel"
        return orig(self, *a, **k)

    monkeypatch.setattr(Engine, "decode_scan", flaky)
    # the fallback sets XALM_NO_MEGAKERNEL=1 in-process; registering the var
    # with monkeypatch first guarantees it is scrubbed after this test
    monkeypatch.setenv("XALM_NO_MEGAKERNEL", "")
    rec = _run_bench(monkeypatch, capsys, ["--mini", "--steps", "4"])
    assert state["fails"] == 1
    assert rec["value"] > 0


def test_bench_mini_batch(monkeypatch, capsys):
    rec = _run_bench(monkeypatch, capsys, ["--mini", "--steps", "4", "--batch", "2"])
    assert rec["metric"].endswith("_b2")
    assert rec["value"] > 0


def test_bench_spec_verify(monkeypatch, capsys):
    rec = _run_bench(monkeypatch, capsys, ["--mini", "--spec-verify", "7", "--steps", "4"])
    assert rec["metric"] == "spec_verify_cost_ratio_k7"
    assert rec["value"] > 0
