"""CLI harness smoke tests (completion / perplexity / passkey surfaces)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.harness import main as harness


@pytest.fixture(scope="module")
def tiny_xalm(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    return out


def test_completion_mode(tiny_xalm, capsys):
    rc = harness.main([tiny_xalm, "-m", "c", "-i", "hello world", "-n", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Generation stats" in out
    assert "tok/s" in out
    assert "hello world" in out


def test_completion_spec_mode(tiny_xalm, capsys):
    """--spec K: same surface, plus the draft-acceptance stats line, and the
    emitted text matches the plain greedy run."""
    rc = harness.main([tiny_xalm, "-m", "c", "-i", "ab ab ab ab", "-n", "12"])
    assert rc == 0
    ref = capsys.readouterr().out
    rc = harness.main([tiny_xalm, "-m", "c", "-i", "ab ab ab ab", "-n", "12", "--spec", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Generation stats" in out
    assert "speculation:" in out and "drafts accepted" in out
    # emitted text (first line, before the stats blocks) is greedy-identical
    assert out.split("Generation stats")[0].split("Encoding stats")[-1].splitlines()[1:] \
        == ref.split("Generation stats")[0].split("Encoding stats")[-1].splitlines()[1:]


def test_completion_spec_draft_model(tiny_xalm, capsys):
    """--spec K --draft model: two-model speculation from the CLI (here the
    model drafts for itself — near-oracle acceptance, greedy-equal text)."""
    rc = harness.main([tiny_xalm, "-m", "c", "-i", "hello world", "-n", "8"])
    assert rc == 0
    ref = capsys.readouterr().out
    rc = harness.main([tiny_xalm, "-m", "c", "-i", "hello world", "-n", "8",
                       "--spec", "4", "--draft", tiny_xalm])
    assert rc == 0
    out = capsys.readouterr().out
    assert "speculation:" in out and "drafts accepted" in out
    assert out.split("Generation stats")[0].split("Encoding stats")[-1].splitlines()[1:] \
        == ref.split("Generation stats")[0].split("Encoding stats")[-1].splitlines()[1:]


def test_perplexity_mode(tiny_xalm, capsys):
    rc = harness.main([tiny_xalm, "-m", "perplexity", "-i", "the quick brown fox is here"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "perplexity:" in out and "±" in out


def test_passkey_mode_wraps_ring(tiny_xalm, capsys):
    # 939-token prompt against a 64-slot window: ring wraps many times;
    # retrieval itself can't succeed with random weights — rc may be 1.
    rc = harness.main([tiny_xalm, "-m", "passkey", "-n", "12", "-l", "3", "-T", "64", "--seed", "7"])
    out = capsys.readouterr().out
    assert "Passkey test" in out
    assert "retrieval:" in out
    assert rc in (0, 1)


def test_passkey_prompt_structure():
    p = harness.build_passkey_prompt(5, 2, 1234)
    assert p.startswith(harness.PASSKEY_PREFIX)
    assert p.endswith(harness.PASSKEY_SUFFIX)
    assert "The pass key is 1234" in p
    assert p.count("The grass is green") == 5
    # passkey sentence inserted before junk line index 2
    assert p.index("1234") < p.index(harness.PASSKEY_SUFFIX)


def test_prompt_file_and_errors(tiny_xalm, tmp_path, capsys):
    f = tmp_path / "prompt.txt"
    f.write_text("hello from a file")
    rc = harness.main([tiny_xalm, "-m", "c", "-f", str(f), "-n", "2"])
    assert rc == 0
    with pytest.raises(SystemExit):
        harness.main([tiny_xalm, "-m", "c"])  # no prompt
    rc = harness.main(["/does/not/exist.xalm", "-m", "c", "-i", "x"])
    assert rc == 1


def test_pp_flag(tmp_path_factory, capsys):
    """--pp 2 routes through the PipelinedEngine and still completes."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    rc = harness.main([out, "-m", "c", "-i", "hello", "-n", "4", "--pp", "2"])
    assert rc == 0
    assert "pp=2" in capsys.readouterr().out
