"""Container round-trip + quantization scheme tests."""

import numpy as np
import pytest

from xalm_tpu import dtypes as xdt
from xalm_tpu import quant
from xalm_tpu.io import XalmFile, write_xalm


def _config():
    return {
        "dim": "16",
        "hidden_dim": "32",
        "head_dim": "8",
        "n_layers": "1",
        "n_heads": "2",
        "n_kv_heads": "1",
        "vocab_size": "64",
        "max_seq_len": "128",
        "bos_token_id": "1",
        "eos_token_id": "2",
        "rope_theta": "10000.0",
        "rotary_dim": "8",
        "norm_eps": "1e-5",
        "norm_type": "rmsnorm",
        "act_type": "silu",
        "tie_word_embeddings": "True",
    }


def test_container_roundtrip(tmp_path):
    rng = np.random.default_rng(42)
    tensors = {
        "embed.weight": rng.normal(size=(64, 16)).astype(np.float16),
        "l.0.attn.norm.weight": rng.normal(size=(16,)).astype(np.float32),
        "tokenizer.tokens": np.frombuffer(b"a\0b\0<s>\0", dtype=np.uint8).copy(),
    }
    path = tmp_path / "tiny.xalm"
    write_xalm(path, "MistralForCausalLM", _config(), tensors)

    with XalmFile(path) as xf:
        assert xf.arch == "MistralForCausalLM"
        assert xf.config["dim"] == "16"
        assert set(xf.tensors) == set(tensors)
        for name, ref in tensors.items():
            got = xf.load(name)
            assert got.dtype == ref.dtype
            np.testing.assert_array_equal(got, ref)
            assert xf.verify(name)
        # data blob is 4096-aligned, tensors 32-aligned
        for info in xf.tensors.values():
            assert info.offset % 32 == 0
        assert min(i.offset for i in xf.tensors.values()) % 4096 == 0


def test_container_i8_scale_tagging(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    q = quant.quantize(w, "i8")
    tensors = {
        "l.0.attn.q.weight": q.values,
        "l.0.attn.q.weight.scale": q.scale,
        "l.0.mlp.fixed": quant.quantize(w, "q8").values,  # no scale -> tagged q8
    }
    path = tmp_path / "q.xalm"
    write_xalm(path, "LlamaForCausalLM", _config(), tensors)
    with XalmFile(path) as xf:
        assert xf.tensors["l.0.attn.q.weight"].dtype.name == "i8"
        assert xf.tensors["l.0.mlp.fixed"].dtype.name == "q8"
        back = quant.dequantize(
            xf.load("l.0.attn.q.weight"), "i8", xf.load("l.0.attn.q.weight.scale")
        )
        assert np.abs(back - w).max() < np.abs(w).max() / 64


def test_bad_container_rejected(tmp_path):
    p = tmp_path / "bad.xalm"
    p.write_bytes(b"\x00" * 4)
    with pytest.raises(ValueError):
        XalmFile(p)
    import json
    import struct

    payload = json.dumps({"xalm": {"version": 2}}).encode()
    p.write_bytes(struct.pack("<Q", 8 + len(payload)) + payload)
    with pytest.raises(ValueError, match="version"):
        XalmFile(p)


@pytest.mark.parametrize("tname", ["f32", "f16", "bf16", "f8_e4m3", "f8_e5m2", "q8", "i8"])
def test_quant_roundtrip_error_bounded(tname):
    rng = np.random.default_rng(7)
    w = (rng.normal(size=(32, 64)) * 0.05).astype(np.float32)
    q = quant.quantize(w, tname)
    back = quant.dequantize(q, tname)
    assert back.shape == w.shape
    rel = np.abs(back - w).max() / np.abs(w).max()
    bounds = {
        "f32": 0.0,
        "f16": 1e-3,
        "bf16": 1e-2,
        "f8_e4m3": 0.08,
        "f8_e5m2": 0.2,
        "q8": 0.15,  # fixed 1/100 scale: absolute error 0.005
        "i8": 0.01,
    }
    assert rel <= bounds[tname], f"{tname}: rel err {rel}"


def test_i8_beats_q8_on_scaled_weights():
    """Per-row scaling must dominate the reference's fixed 1/100 scale."""
    rng = np.random.default_rng(3)
    w = (rng.normal(size=(16, 128)) * 2.0).astype(np.float32)  # range beyond q8's [-1.27, 1.27]
    e_q8 = np.mean((quant.dequantize(quant.quantize(w, "q8"), "q8") - w) ** 2)
    e_i8 = np.mean((quant.dequantize(quant.quantize(w, "i8"), "i8") - w) ** 2)
    assert e_i8 < e_q8 / 100


def test_analyze_metrics():
    rng = np.random.default_rng(11)
    w = (rng.normal(size=(64, 64)) * 0.02).astype(np.float32)
    m = quant.analyze(w, "f8_e4m3")
    assert m["cosine"] > 0.99
    assert m["snr_db"] > 20
    assert m["bytes"] == 64 * 64
    m32 = quant.analyze(w, "f32")
    assert m32["exact_%"] == 100.0


def test_dtype_registry():
    assert xdt.parse("bf16").bits == 16
    assert xdt.parse("q8").fixed_scale == 0.01
    assert xdt.parse("i8").scaled
    with pytest.raises(ValueError):
        xdt.parse("f4_e2m1")
    assert xdt.scale_name("w") == "w.scale"
    assert xdt.is_scale_name("w.scale")
