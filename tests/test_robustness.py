"""Robustness: config variants end-to-end, parser fuzzing, tokenizer edges.

The reference fails fast on malformed containers (xalm.h:102-175); the
contract here is the same — any corruption raises a clean ValueError (or
json/unicode error), never a crash, hang, or silent garbage."""

import json

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.io import XalmFile
from xalm_tpu.io.blockstore import BlockStore, write_blocks
from xalm_tpu.runtime.engine import Engine
from xalm_tpu.tokenizer import Tokenizer


def _build(tmp_path, overrides=None, dtype="f16"):
    hf = make_tiny_model(str(tmp_path / "hf"), config_overrides=overrides)
    out = str(tmp_path / "m.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", dtype]) == 0
    return out


# ---------------------------------------------------------------------------
# config variants (reference Config paths: model.h:44-91)
# ---------------------------------------------------------------------------


def test_tied_embeddings_end_to_end(tmp_path):
    out = _build(tmp_path, {"tie_word_embeddings": True})
    with XalmFile(out) as xf:
        assert "output.weight" not in xf.tensors  # wcls aliases embed
        assert xf.config["tie_word_embeddings"] == "True"
    eng = Engine.from_xalm(out, progress=False)
    assert eng.params.wcls is eng.params.embed
    toks, _ = eng.generate(eng.tokenizer.encode("hi"), 4, stop_on_eos=False)
    assert len(toks) == 4


def test_gelu_act_end_to_end(tmp_path):
    out = _build(tmp_path, {"hidden_act": "gelu"})
    eng = Engine.from_xalm(out, progress=False)
    assert eng.cfg.act == "gelu"
    toks, _ = eng.generate(eng.tokenizer.encode("hi"), 4, stop_on_eos=False)
    assert len(toks) == 4


def test_partial_rotary(tmp_path):
    out = _build(tmp_path, {"partial_rotary_factor": 0.5})
    eng = Engine.from_xalm(out, progress=False)
    assert eng.cfg.rotary_dim == eng.cfg.head_dim // 2
    from xalm_tpu.models.llama import rope_freqs

    freqs = rope_freqs(eng.cfg)
    assert (freqs[eng.cfg.rotary_dim // 2 :] == 0).all()  # unrotated tail
    toks, _ = eng.generate(eng.tokenizer.encode("hi"), 4, stop_on_eos=False)
    assert len(toks) == 4


def test_unknown_arch_rejected(tmp_path):
    hf = make_tiny_model(str(tmp_path / "hf"), {"architectures": ["GPTNeoXForCausalLM"]})
    with pytest.raises((ValueError, SystemExit)):
        rc = cvt.main(["--input", hf, "--output", str(tmp_path / "x.xalm"), "--type", "f16"])
        assert rc != 0
        raise SystemExit(rc)


# ---------------------------------------------------------------------------
# parser fuzzing
# ---------------------------------------------------------------------------

ACCEPTABLE = (ValueError, json.JSONDecodeError, UnicodeDecodeError, KeyError, EOFError)


def _mutations(blob: bytes, rng) -> list[bytes]:
    muts = []
    for _ in range(24):
        b = bytearray(blob)
        op = rng.integers(0, 3)
        if op == 0:  # flip random bytes in the header region
            for _ in range(rng.integers(1, 8)):
                i = int(rng.integers(0, min(len(b), 4096)))
                b[i] ^= int(rng.integers(1, 256))
        elif op == 1:  # truncate
            b = b[: int(rng.integers(0, len(b)))]
        else:  # grow with junk
            b += bytes(rng.integers(0, 256, size=int(rng.integers(1, 64)), dtype=np.uint8))
        muts.append(bytes(b))
    muts.append(b"")
    muts.append(b"\x00" * 64)
    return muts


def test_container_fuzz(tmp_path):
    out = _build(tmp_path)
    blob = open(out, "rb").read()
    rng = np.random.default_rng(0)
    crashes = []
    for i, mut in enumerate(_mutations(blob, rng)):
        p = tmp_path / f"fuzz_{i}.xalm"
        p.write_bytes(mut)
        try:
            with XalmFile(str(p)) as xf:
                # parsing may legitimately survive a payload-only mutation;
                # loads must still be bounded
                for name in list(xf.tensors)[:3]:
                    xf.load(name)
                    xf.verify(name)
        except ACCEPTABLE:
            pass
        except Exception as e:  # noqa: BLE001 — the point of the fuzz
            crashes.append((i, type(e).__name__, str(e)[:80]))
    assert not crashes, crashes


def test_blockstore_fuzz(tmp_path):
    p = str(tmp_path / "b.xbk")
    write_blocks(p, {"a": np.arange(64, dtype=np.float32)}, meta={"kind": "t"})
    blob = open(p, "rb").read()
    rng = np.random.default_rng(1)
    crashes = []
    for i, mut in enumerate(_mutations(blob, rng)):
        q = tmp_path / f"f_{i}.xbk"
        q.write_bytes(mut)
        try:
            with BlockStore(str(q)) as bs:
                for k in list(bs.keys())[:2]:
                    bs.get(k)
                    bs.verify(k)
        except ACCEPTABLE:
            pass
        except Exception as e:  # noqa: BLE001
            crashes.append((i, type(e).__name__, str(e)[:80]))
    assert not crashes, crashes


# ---------------------------------------------------------------------------
# tokenizer edges
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    out = _build(tmp_path_factory.mktemp("t"))
    with XalmFile(out) as xf:
        return Tokenizer.from_xalm(xf)


def test_tokenizer_empty_and_unicode(tok):
    assert tok.encode("", bos=False) == []
    ids = tok.encode("", bos=True)
    assert ids == [tok.bos_id]
    for s in ("héllo wörld", "日本語テスト", "a\x00b", "🎉" * 5, " \n\t "):
        ids = tok.encode(s, bos=False)
        assert all(0 <= t < tok.vocab_size for t in ids)
        # byte fallback round-trips everything exactly, NUL included (the
        # NUL -> 0x07 substitution applies to vocab *strings*, not input)
        assert tok.decode(ids) == s


def test_tokenizer_long_input(tok):
    s = "the quick brown fox " * 500
    ids = tok.encode(s)
    assert tok.decode(ids[1:]) == s
