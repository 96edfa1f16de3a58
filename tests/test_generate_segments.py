"""Segmented device-scan generation must equal per-token generation."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    return Engine.from_xalm(out)


def test_segmented_equals_stepwise(engine):
    prompt = [1, 259, 260, 10, 20]
    ref, _ = engine.generate(prompt, 13, stop_on_eos=False, segment=1)
    for seg in (4, 5, 32):
        got, stats = engine.generate(prompt, 13, stop_on_eos=False, segment=seg)
        assert got == ref, f"segment={seg}"
        assert stats.generated_tokens == 13


def test_segmented_eos_stop(engine):
    """EOS inside a segment stops emission at the same point as stepwise."""
    prompt = [1, 259, 260]
    ref, _ = engine.generate(prompt, 40, stop_on_eos=True, segment=1)
    got, _ = engine.generate(prompt, 40, stop_on_eos=True, segment=8)
    assert got == ref
