"""GGUF container I/O: raw read/write roundtrip + full model
export->import->engine equivalence (convert/gguf_container.py)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.convert.gguf_container import (
    export_xalm_to_gguf,
    import_gguf,
    read_gguf,
    write_gguf,
)
from xalm_tpu.runtime.engine import Engine

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262]


def test_raw_container_roundtrip(tmp_path):
    md = {
        "general.architecture": "llama",
        "general.alignment": 32,
        "llama.block_count": 2,
        "llama.rope.freq_base": 10000.0,
        "flag": True,
        "name": "tiny",
        "tokenizer.ggml.tokens": ["<unk>", "▁hello", "<0x41>"],
        "scores": [1.0, 2.0, 3.0],
        "ids": [3, 1, 2],
    }
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 64)).astype(np.float32)
    b = rng.normal(size=(128,)).astype(np.float32)
    from xalm_tpu import gguf as codecs

    tensors = {
        "a.weight": ("f32", a.shape, codecs.quantize(a, "f32")),
        "b.weight": ("q8_0", b.shape, codecs.quantize(b, "q8_0")),
    }
    p = str(tmp_path / "t.gguf")
    write_gguf(p, md, tensors)
    md2, t2 = read_gguf(p)
    assert md2["general.architecture"] == "llama"
    assert md2["flag"] is True
    assert md2["tokenizer.ggml.tokens"] == md["tokenizer.ggml.tokens"]
    assert md2["ids"] == [3, 1, 2]
    np.testing.assert_allclose(md2["scores"], [1.0, 2.0, 3.0])
    cname, shape, raw = t2["a.weight"]
    assert (cname, shape) == ("f32", (8, 64))
    np.testing.assert_array_equal(
        np.frombuffer(bytes(raw), np.float32).reshape(8, 64), a
    )
    cname, shape, raw = t2["b.weight"]
    got = codecs.dequantize(np.asarray(raw), "q8_0", shape)
    np.testing.assert_allclose(got, b, atol=0.02)


@pytest.fixture(scope="module")
def tiny_xalm(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    return out


def test_export_import_roundtrip_engine(tiny_xalm, tmp_path):
    """xalm -> gguf(q8_0 body) -> xalm: the re-imported engine's logits
    stay close to the original (q8_0 quantization noise only), and the
    tokenizer survives the ▁ round trip."""
    gg = str(tmp_path / "tiny.gguf")
    export_xalm_to_gguf(tiny_xalm, gg, "q8_0")
    back = str(tmp_path / "back.xalm")
    assert cvt.main(["--input", gg, "--output", back, "--type", "f16"]) == 0

    a = Engine.from_xalm(tiny_xalm, progress=False)
    b = Engine.from_xalm(back, progress=False)
    assert b.cfg.dim == a.cfg.dim and b.cfg.n_layers == a.cfg.n_layers
    assert b.cfg.rope_theta == a.cfg.rope_theta
    la, _, _ = a.prefill(TOKENS, a.new_cache(1), logits_mode="all")
    lb, _, _ = b.prefill(TOKENS, b.new_cache(1), logits_mode="all")
    assert np.abs(np.asarray(la) - np.asarray(lb)).max() < 0.35
    # tokenizer text roundtrip
    s = "hello world pass"
    assert b.tokenizer.encode(s) == a.tokenizer.encode(s)


def test_import_metadata_mapping(tiny_xalm, tmp_path):
    gg = str(tmp_path / "t.gguf")
    export_xalm_to_gguf(tiny_xalm, gg, "f16")
    arch, ac, weights, toks = import_gguf(gg)
    assert arch == "MistralForCausalLM"
    assert ac["rope_interleaved"] == "True"
    assert ac["dim"] == "64" and ac["n_layers"] == "2"
    assert "l.0.attn.q.weight" in weights and "embed.weight" in weights
    assert toks is not None and len(toks) == int(ac["vocab_size"])


def test_f16_body_roundtrip_exact(tiny_xalm, tmp_path):
    """f16 gguf body: the roundtrip through gguf must be bit-exact vs the
    original f16 container weights (no requantization noise)."""
    gg = str(tmp_path / "t16.gguf")
    export_xalm_to_gguf(tiny_xalm, gg, "f16")
    back = str(tmp_path / "b16.xalm")
    assert cvt.main(["--input", gg, "--output", back, "--type", "f16"]) == 0
    a = Engine.from_xalm(tiny_xalm, progress=False)
    b = Engine.from_xalm(back, progress=False)
    la, _, _ = a.prefill(TOKENS, a.new_cache(1), logits_mode="all")
    lb, _, _ = b.prefill(TOKENS, b.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-3, atol=2e-3)


def test_malformed_gguf_fails_cleanly(tmp_path):
    """Truncation/corruption anywhere must raise ValueError with context,
    never a cryptic struct.error or silent garbage (fail-fast contract,
    tests/test_robustness.py style)."""
    import struct

    from xalm_tpu import gguf as codecs

    good = str(tmp_path / "g.gguf")
    a = np.ones((4, 64), np.float32)
    write_gguf(good, {"general.architecture": "llama"},
               {"a.weight": ("f32", a.shape, codecs.quantize(a, "f32"))})
    blob = open(good, "rb").read()

    def expect_fail(data, tag):
        p = str(tmp_path / f"bad_{tag}.gguf")
        open(p, "wb").write(data)
        with pytest.raises(ValueError):
            read_gguf(p)

    expect_fail(b"NOPE" + blob[4:], "magic")
    expect_fail(blob[:4] + struct.pack("<I", 99) + blob[8:], "version")
    expect_fail(blob[:24], "truncated_header")
    expect_fail(blob[: len(blob) // 2], "truncated_data")
    # tensor-count says 2 but only 1 directory entry follows
    expect_fail(blob[:8] + struct.pack("<Q", 2) + blob[16:], "tensor_count")
