"""Gemma model family: converter + forward vs HF transformers golden.

Beyond-parity family (the reference supports Llama/Mistral only,
reference xalm.h:141). Gemma's three deltas from that family are all
absorbed outside the runtime hot path: the (1 + w) RMSNorm offset is
folded into the stored norm weights at conversion (exact — norm weights
stay f32), the sqrt(dim) residual normalizer ships as the container's
``embed_scale`` config field, and gelu_pytorch_tanh maps onto the
runtime's (tanh-approximate) gelu. RoPE reuses the same permute_reverse
identity as Llama (HF rotate_half == interleaved on permuted rows)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

GEMMA_OVERRIDES = {
    "architectures": ["GemmaForCausalLM"],
    "model_type": "gemma",
    "hidden_act": "gelu_pytorch_tanh",
    "hidden_activation": "gelu_pytorch_tanh",
    "tie_word_embeddings": True,
    # exercise head_dim * n_heads != hidden_size (Gemma's signature shape)
    "head_dim": 24,
}

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_gemma(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf") / "tiny_gemma")
    return make_tiny_model(d, config_overrides=GEMMA_OVERRIDES)


@pytest.fixture(scope="module")
def hf_logits(tiny_gemma):
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_gemma, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor([TOKENS])).logits
    return out[0].numpy()


@pytest.fixture(scope="module")
def gemma_xalm(tiny_gemma, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x") / "tiny_gemma.xalm")
    assert cvt.main(["--input", tiny_gemma, "--output", out, "--type", "f32"]) == 0
    return out


def test_config_roundtrip(gemma_xalm):
    import jax.numpy as jnp

    eng = Engine.from_xalm(gemma_xalm, kv_dtype=jnp.float32)
    cfg = eng.cfg
    assert cfg.act == "gelu"
    assert cfg.tie_word_embeddings
    assert cfg.embed_scale == pytest.approx(8.0)  # sqrt(64)
    assert cfg.q_dim == 4 * 24 != cfg.dim


def test_gemma_logits_match_hf(gemma_xalm, hf_logits):
    import jax.numpy as jnp

    eng = Engine.from_xalm(gemma_xalm, kv_dtype=jnp.float32)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    assert logits.shape == hf_logits.shape
    np.testing.assert_allclose(logits, hf_logits, rtol=1e-4, atol=1e-4)


def test_gemma_decode_matches_prefill(gemma_xalm):
    import jax.numpy as jnp

    eng = Engine.from_xalm(gemma_xalm, kv_dtype=jnp.float32)
    cache = eng.new_cache(1)
    outs = []
    for i, tok in enumerate(TOKENS):
        logits, cache = eng.decode(np.array([tok]), np.array([i]), cache)
        outs.append(np.asarray(logits)[0])
    got = np.stack(outs)
    prefill, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, prefill, rtol=1e-4, atol=1e-5)


def test_gemma_generate_greedy_matches_hf(gemma_xalm, tiny_gemma):
    import torch
    import transformers

    eng = Engine.from_xalm(gemma_xalm)
    out, _ = eng.generate(TOKENS[:6], 12, stop_on_eos=False, segment=1)

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_gemma, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([TOKENS[:6]]), max_new_tokens=12, do_sample=False
        )[0][6:].tolist()
    assert out == hf


def test_gemma_i8_close(tiny_gemma, tmp_path, hf_logits):
    out = str(tmp_path / "tiny_gemma_i8.xalm")
    assert cvt.main(["--input", tiny_gemma, "--output", out, "--type", "i8"]) == 0
    eng = Engine.from_xalm(out)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    err = np.abs(logits - hf_logits).max()
    assert err < 0.3, f"i8 max logit err {err}"
