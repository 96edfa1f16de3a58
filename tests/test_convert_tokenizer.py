"""Converter + tokenizer end-to-end tests on the tiny fixture model."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.io import XalmFile
from xalm_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tiny_hf(tmp_path_factory):
    return make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))


@pytest.fixture(scope="module")
def tiny_xalm(tiny_hf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("xalm") / "tiny.xalm")
    rc = cvt.main(["--input", tiny_hf, "--output", out, "--type", "f16"])
    assert rc == 0
    return out


def test_convert_produces_valid_container(tiny_xalm):
    with XalmFile(tiny_xalm) as xf:
        assert xf.arch == "MistralForCausalLM"
        cfg = xf.config
        assert cfg["dim"] == "64"
        assert cfg["n_kv_heads"] == "2"
        assert cfg["act_type"] == "silu"
        # canonical tensor set
        assert "embed.weight" in xf.tensors
        assert "l.1.mlp.up.weight" in xf.tensors
        assert "output.weight" in xf.tensors  # not tied
        assert "tokenizer.tokens" in xf.tensors
        assert xf.tensors["embed.weight"].dtype.name == "f16"
        assert xf.tensors["l.0.attn.norm.weight"].dtype.name == "f32"
        assert all(xf.verify(n) for n in xf.tensors)


def test_convert_i8_boosts_embeddings(tiny_hf, tmp_path):
    out = str(tmp_path / "tiny_i8.xalm")
    assert cvt.main(["--input", tiny_hf, "--output", out, "--type", "i8"]) == 0
    with XalmFile(out) as xf:
        assert xf.tensors["l.0.attn.q.weight"].dtype.name == "i8"
        assert "l.0.attn.q.weight.scale" in xf.tensors
        # embed/output boosted to >=16-bit (reference convert.py:729-744)
        assert xf.tensors["embed.weight"].dtype.name == "f16"
        assert xf.tensors["output.weight"].dtype.name == "f16"


def test_permute_reverse_roundtrips_interleave():
    """permute_reverse must re-interleave HF's two-half rope layout."""
    heads, hd, rotary, dim = 2, 8, 8, 4
    # build a weight where row value encodes (head, row-in-head)
    w = np.arange(heads * hd * dim, dtype=np.float32).reshape(heads * hd, dim)
    out = cvt.permute_reverse(w, heads, rotary)
    # HF half layout: [r0 r1 r2 r3 | i0 i1 i2 i3] -> interleaved [r0 i0 r1 i1 ...]
    got = out.reshape(heads, hd, dim)[0, :, 0] / dim
    expect = np.array([0, 4, 1, 5, 2, 6, 3, 7], dtype=np.float32)
    np.testing.assert_array_equal(got, expect)
    # partial rotary: tail rows stay in place
    out2 = cvt.permute_reverse(w, heads, 4)
    got2 = out2.reshape(heads, hd, dim)[0, :, 0] / dim
    np.testing.assert_array_equal(got2, np.array([0, 2, 1, 3, 4, 5, 6, 7], np.float32))


def test_tokenizer_roundtrip(tiny_xalm):
    with XalmFile(tiny_xalm) as xf:
        tok = Tokenizer.from_xalm(xf)
    assert tok.bos_id == 1 and tok.eos_id == 2
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "hello world"
    # greedy longest match picks the multi-char piece "▁hello" -> " hello"
    body = tok.encode(" hello", bos=False)
    assert len(body) == 1

    # byte fallback: chars not in vocab become <0xNN> tokens and still decode
    ids = tok.encode("héllo ☃")
    assert tok.decode(ids) == "héllo ☃"
    assert any(
        tok.byte_fallback_start <= t < tok.byte_fallback_start + 256 for t in ids
    )

    dbg = tok.encoding_to_debug_string(tok.encode("the"))
    assert dbg.startswith("[<s>:1]")


def test_tokenizer_gpt2_byte_mode(tmp_path):
    """Vocab without byte_fallback goes through the GPT-2 unicode-byte reversal."""
    import json

    tokenizer = {
        "model": {
            "type": "BPE",
            # "Ġ" is the gpt2-encoded space; "Ã©" encodes é's utf-8 bytes
            "vocab": {"<unk>": 0, "Ġhello": 1, "Ã©": 2},
            "byte_fallback": False,
        },
        "added_tokens": [],
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(tokenizer))
    toks = cvt.load_tokens(str(p), 3)
    assert toks[1] == b" hello"
    assert toks[2] == "é".encode()


def test_analyze_mode_runs(tiny_hf, tmp_path, capsys):
    out = str(tmp_path / "a.xalm")
    assert cvt.main(["--input", tiny_hf, "--output", out, "--type", "f8_e4m3", "--analyze"]) == 0
    captured = capsys.readouterr().out
    assert "quantization error analysis" in captured
    assert "f8_e4m3" in captured


def test_download_model_mocked(tmp_path, monkeypatch):
    """--download end-to-end against a fake HF endpoint (zero-egress env):
    sharded index layout, skip-existing, streamed chunks."""
    import json as _json

    from xalm_tpu.convert.convert import download_model

    hf = make_tiny_model(str(tmp_path / "src"))
    blobs = {
        "config.json": open(f"{hf}/config.json", "rb").read(),
        "tokenizer.json": open(f"{hf}/tokenizer.json", "rb").read(),
        "model-00001-of-00002.safetensors": b"A" * (3 << 20),
        "model-00002-of-00002.safetensors": b"B" * 100,
    }
    index = {"weight_map": {"w1": "model-00001-of-00002.safetensors",
                            "w2": "model-00002-of-00002.safetensors"}}

    class FakeResponse:
        def __init__(self, content, ok=True):
            self._c, self.ok = content, ok

        def json(self):
            return _json.loads(self._c)

        def raise_for_status(self):
            if not self.ok:
                raise RuntimeError("404")

        def iter_content(self, n):
            for i in range(0, len(self._c), n):
                yield self._c[i : i + n]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_get(url, **kw):
        name = url.rsplit("/", 1)[1]
        if name == "model.safetensors.index.json":
            return FakeResponse(_json.dumps(index).encode())
        if name in blobs:
            return FakeResponse(blobs[name])
        return FakeResponse(b"", ok=False)

    import requests

    monkeypatch.setattr(requests, "get", fake_get)
    dest = str(tmp_path / "dl")
    out = download_model("fake/repo", dest)
    assert out == dest
    for name, want in blobs.items():
        assert open(f"{dest}/{name}", "rb").read() == want
    # second call skips existing files (no exception from the dead fake)
    monkeypatch.setattr(requests, "get", lambda *a, **k: FakeResponse(_json.dumps(index).encode()))
    download_model("fake/repo", dest)


class _FakeHub:
    """Fake requests module face: a dict of filename -> bytes, 404 otherwise.

    Used to exercise download_model's three layout resolutions offline
    (reference convert.py:996-1055 downloads; 916-954 the enumerated-shard
    fallbacks this generalizes)."""

    def __init__(self, blobs):
        self.blobs = blobs
        self.head_calls = []

    class _Resp:
        def __init__(self, content, ok):
            self._c, self.ok = content, ok

        def json(self):
            import json as _json

            return _json.loads(self._c)

        def raise_for_status(self):
            if not self.ok:
                raise RuntimeError("404")

        def iter_content(self, n):
            for i in range(0, len(self._c), n):
                yield self._c[i : i + n]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def get(self, url, **kw):
        name = url.rsplit("/", 1)[1]
        return self._Resp(self.blobs.get(name, b""), name in self.blobs)

    def head(self, url, **kw):
        name = url.rsplit("/", 1)[1]
        self.head_calls.append(name)
        return self._Resp(b"", name in self.blobs)


def _patch_hub(monkeypatch, blobs):
    import requests

    hub = _FakeHub(blobs)
    monkeypatch.setattr(requests, "get", hub.get)
    monkeypatch.setattr(requests, "head", hub.head)
    return hub


def test_download_single_file_layout(tmp_path, monkeypatch):
    """No index.json -> falls back to model.safetensors (one HEAD probe)."""
    from xalm_tpu.convert.convert import download_model

    blobs = {
        "config.json": b"{}",
        "tokenizer.json": b"{}",
        "model.safetensors": b"S" * 4096,
    }
    hub = _patch_hub(monkeypatch, blobs)
    dest = str(tmp_path / "dl")
    download_model("fake/repo", dest)
    for name, want in blobs.items():
        assert open(f"{dest}/{name}", "rb").read() == want
    assert hub.head_calls == ["model.safetensors"]


@pytest.mark.parametrize("n_shards", [3, 4, 10, 7])
def test_download_enumerated_shards(tmp_path, monkeypatch, n_shards):
    """Indexless enumerated layouts: the reference hardcodes 3/4/10-shard
    fallbacks (reference convert.py:916-954); the probe covers any N."""
    from xalm_tpu.convert.convert import download_model

    shard_names = [
        f"model-{i:05d}-of-{n_shards:05d}.safetensors"
        for i in range(1, n_shards + 1)
    ]
    blobs = {"config.json": b"{}", "tokenizer.json": b"{}"}
    blobs.update({s: s.encode() * 7 for s in shard_names})
    _patch_hub(monkeypatch, blobs)
    dest = str(tmp_path / "dl")
    download_model("fake/repo", dest)
    for name in shard_names:
        assert open(f"{dest}/{name}", "rb").read() == name.encode() * 7


def test_download_no_layout_found(tmp_path, monkeypatch):
    from xalm_tpu.convert.convert import download_model

    _patch_hub(monkeypatch, {"config.json": b"{}", "tokenizer.json": b"{}"})
    with pytest.raises(FileNotFoundError, match="no model.safetensors"):
        download_model("fake/repo", str(tmp_path / "dl"))


def test_boost_type_bf16_subbyte_is_e5m2():
    # reference convert.py:729-744: bf16-origin sub-byte boosts to f8_e5m2,
    # f16/f32-origin to f8_e4m3
    import ml_dtypes
    import numpy as np

    from xalm_tpu.convert.convert import boost_type

    assert boost_type(np.dtype(ml_dtypes.bfloat16), "qi4") == "f8_e5m2"
    assert boost_type(np.dtype(np.float16), "qi4") == "f8_e4m3"
    assert boost_type(np.dtype(ml_dtypes.bfloat16), "i8") == "bf16"
    assert boost_type(np.dtype(np.float32), "i8") == "f16"


def test_analyze_scale_sweep():
    import numpy as np

    from xalm_tpu import quant

    x = np.random.default_rng(3).normal(size=(32, 16)).astype(np.float32)
    scales = quant.analyze_scales(x, "f8_e4m3")
    assert "range" in scales and 1.0 in scales and 8.0 in scales and 16.0 in scales
    assert quant.analyze_scales(x, "f16") == [1.0]
    rows = [quant.analyze(x, "f8_e4m3", s) for s in scales]
    labels = {r["scale"] for r in rows}
    assert "range" in labels and "8" in labels
    for r in rows:
        assert np.isfinite(r["mse"])
