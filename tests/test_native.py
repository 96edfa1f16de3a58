"""Native C++ tokenizer: build, bind, and match the Python implementation."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.io import XalmFile
from xalm_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    with XalmFile(out) as xf:
        return Tokenizer.from_xalm(xf)


def test_native_builds(tok):
    # the baked toolchain must be present in this environment; if this fails
    # the build or binding broke (fallback would silently hide it)
    assert tok._native is not None, "native tokenizer failed to build/load"


def test_native_matches_python(tok):
    native = tok._native
    assert native is not None
    texts = [
        "hello world",
        "the quick brown fox jumps over the lazy dog",
        "héllo ☃ unicode ßtring",
        "",
        " " * 50,
        "a" * 1000,
        "What is the pass key? The pass key is 42381.",
    ]
    for text in texts:
        data = text.encode("utf-8")
        got = native.encode(data, True)
        # force the python path
        tok._native = None
        try:
            expect = tok.encode(text)
        finally:
            tok._native = native
        assert got == expect, text[:40]


def test_native_encode_speedup(tok):
    """Native encode should beat Python on long prompts (sanity, not a
    strict perf gate — CI machines vary)."""
    import time

    text = ("The grass is green. The sky is blue. " * 3000).encode()
    native = tok._native
    t_native = min(
        _timed(lambda: native.encode(text, True))[0] for _ in range(3)
    )
    n_out = native.encode(text, True)
    tok._native = None
    try:
        t_python = min(_timed(lambda: tok.encode(text))[0] for _ in range(3))
        p_out = tok.encode(text)
    finally:
        tok._native = native
    assert n_out == p_out
    # generous margin: shared CI machines jitter; native is ~10x in practice
    assert t_native < t_python * 1.5, (t_native, t_python)


def _timed(f):
    import time

    t0 = time.perf_counter()
    r = f()
    return time.perf_counter() - t0, r
