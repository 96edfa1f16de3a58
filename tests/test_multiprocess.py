"""True multi-process execution: 2 jax.distributed CPU processes, (dp=2,
tp=2) mesh with dp spanning processes, must reproduce the single-process
engine's logits/generations exactly (SURVEY.md §2.4 multi-host extension;
BASELINE 2-host scaling target — numerics leg)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_matches_single(tmp_path):
    hf = make_tiny_model(str(tmp_path / "hf"))
    model = str(tmp_path / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", model, "--type", "f32"]) == 0

    # single-process reference (this process: 8-device CPU mesh via conftest)
    from xalm_tpu.runtime.engine import Engine

    eng = Engine.from_xalm(model)
    rng = np.random.default_rng(0)
    prompts = rng.integers(3, 350, size=(2, 8)).astype(np.int32)
    cache = eng.new_cache(2)
    logits, cache = eng.step(prompts, np.zeros(2, np.int32), cache, logits_mode="last")
    tok0 = np.asarray(logits).argmax(-1).astype(np.int32)
    toks, _ = eng.decode_scan(tok0, np.full(2, 8, np.int32), cache, 6)
    want = np.asarray(toks)

    port = _free_port()
    out_path = str(tmp_path / "mp_out.json")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(REPO / "tests" / "multiproc_worker.py"),
                f"127.0.0.1:{port}",
                "2",
                str(pid),
                model,
                out_path,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-3000:]}"

    got = json.load(open(out_path))
    np.testing.assert_array_equal(np.asarray(got["tok0"]), tok0)
    np.testing.assert_array_equal(np.asarray(got["generated"]), want)
