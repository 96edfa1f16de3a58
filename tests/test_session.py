"""v2 block store + KV-cache session resume tests.

Covers the container design the reference sketched but never shipped
(XalmFile.h) and the session capability SURVEY.md §5.4 flags as absent.
"""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.io.blockstore import BlockStore, write_blocks
from xalm_tpu.runtime.engine import Engine
from xalm_tpu.runtime.session import load_session, save_session


def test_blockstore_roundtrip(tmp_path):
    p = str(tmp_path / "x.xbk")
    rng = np.random.default_rng(42)
    blocks = {
        "a": rng.standard_normal((4, 8)).astype(np.float32),
        "b/nested": np.arange(37, dtype=np.int32),
        "c": rng.integers(0, 255, size=(3, 5, 7), dtype=np.uint8),
    }
    write_blocks(p, blocks, meta={"kind": "test", "note": "hi"})
    with BlockStore(p) as bs:
        assert bs.meta["note"] == "hi"
        assert set(bs.keys()) == set(blocks)
        for k, want in blocks.items():
            got = bs.get(k)
            assert got.dtype == want.dtype and got.shape == want.shape
            np.testing.assert_array_equal(got, want)
            assert bs.verify(k)
            assert bs.blocks[k].offset % 32 == 0
        # hash-keyed lazy lookup (XalmFile.h's access path)
        np.testing.assert_array_equal(bs.get(bs.blocks["a"].khash), blocks["a"])


def test_blockstore_rejects_garbage(tmp_path):
    p = tmp_path / "bad.xbk"
    p.write_bytes(b"not a store at all")
    with pytest.raises(ValueError):
        BlockStore(str(p))


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    return Engine.from_xalm(out, progress=False)


def test_session_resume_matches_uninterrupted(engine, tmp_path):
    prompt = engine.tokenizer.encode("the quick brown fox")
    # one uninterrupted 12-token generation
    full, _ = engine.generate(prompt, 12, stop_on_eos=False, segment=1)

    # same thing split across a save/load boundary after 5 tokens
    first, _, sess = engine.generate(
        prompt, 5, stop_on_eos=False, segment=1, return_session=True
    )
    p = str(tmp_path / "sess.xbk")
    save_session(p, engine.cfg, sess)
    sess2 = load_session(p, engine.cfg)
    assert sess2.tokens == sess.tokens
    rest, _, sess3 = engine.generate(
        [], 7, stop_on_eos=False, segment=1, resume=sess2, return_session=True
    )
    assert first + rest == full
    assert sess3.tokens[0] == prompt + full


def test_session_config_mismatch(engine, tmp_path):
    import dataclasses

    prompt = engine.tokenizer.encode("hello")
    _, _, sess = engine.generate(prompt, 2, stop_on_eos=False, return_session=True)
    p = str(tmp_path / "sess.xbk")
    save_session(p, engine.cfg, sess)
    other = dataclasses.replace(engine.cfg, n_layers=engine.cfg.n_layers + 1)
    with pytest.raises(ValueError, match="mismatch"):
        load_session(p, other)


def test_session_resume_after_wrap_with_segments(tmp_path):
    """Saving mid-generation after the ring wrapped, with segment>1, must
    not leave scan-overshoot junk inside the live window (regression)."""
    hf = make_tiny_model(str(tmp_path / "hf"))
    out = str(tmp_path / "t.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    eng = Engine.from_xalm(out, context=16, progress=False)
    prompt = eng.tokenizer.encode("a b c d e f")

    full, _ = eng.generate(prompt, 30, stop_on_eos=False, segment=1)

    # stop at 20 (well past the 16-slot window) with coarse segments
    first, _, sess = eng.generate(
        prompt, 20, stop_on_eos=False, segment=8, return_session=True
    )
    p = str(tmp_path / "s.xbk")
    save_session(p, eng.cfg, sess)
    rest, _ = eng.generate([], 10, stop_on_eos=False, segment=1, resume=load_session(p, eng.cfg))
    assert first + rest == full
