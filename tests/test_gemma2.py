"""Gemma-2 model family: four-norm layers, logit softcapping, folded query
scale — vs HF transformers eager golden.

Beyond-parity family. Supported in the context <= sliding_window regime,
where Gemma-2's alternating local/global attention collapses to one
behavior (the converter clamps the stored max_seq_len accordingly; the
runtime's 4k clamp matches Gemma-2's 4k window on real checkpoints).
Deltas absorbed: (1+w) norm fold + sqrt(dim) embed scale (like Gemma),
query_pre_attn_scalar folded into the q weights at conversion (exact),
post-attention/post-feedforward norms as optional LayerParams fields, and
tanh softcapping on attention scores + final logits (fused attention
kernels and the megakernel gate themselves off)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

GEMMA2_OVERRIDES = {
    "architectures": ["Gemma2ForCausalLM"],
    "model_type": "gemma2",
    "hidden_act": "gelu_pytorch_tanh",
    "hidden_activation": "gelu_pytorch_tanh",
    "tie_word_embeddings": True,
    "query_pre_attn_scalar": 64,  # != head_dim (16): exercises the q fold
    "attn_logit_softcapping": 50.0,
    "final_logit_softcapping": 30.0,
    "attn_implementation": "eager",  # HF only softcaps in eager attention
}

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_g2(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf") / "tiny_gemma2")
    return make_tiny_model(d, config_overrides=GEMMA2_OVERRIDES)


@pytest.fixture(scope="module")
def g2_xalm(tiny_g2, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x") / "tiny_g2.xalm")
    assert cvt.main(["--input", tiny_g2, "--output", out, "--type", "f32"]) == 0
    return out


@pytest.fixture(scope="module")
def hf_logits(tiny_g2):
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_g2, torch_dtype=torch.float32, attn_implementation="eager"
    )
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor([TOKENS])).logits
    return out[0].numpy()


def test_config_roundtrip(g2_xalm):
    eng = Engine.from_xalm(g2_xalm, progress=False)
    cfg = eng.cfg
    assert cfg.attn_softcap == 50.0 and cfg.logit_softcap == 30.0
    assert cfg.post_norms and cfg.embed_scale == pytest.approx(8.0)
    lp = eng.params.layers
    assert lp.post_attn_norm is not None and lp.post_mlp_norm is not None


def test_gemma2_logits_match_hf(g2_xalm, hf_logits):
    import jax.numpy as jnp

    eng = Engine.from_xalm(g2_xalm, kv_dtype=jnp.float32, progress=False)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    assert logits.shape == hf_logits.shape
    np.testing.assert_allclose(logits, hf_logits, rtol=1e-4, atol=1e-4)


def test_gemma2_decode_matches_prefill(g2_xalm):
    import jax.numpy as jnp

    eng = Engine.from_xalm(g2_xalm, kv_dtype=jnp.float32, progress=False)
    cache = eng.new_cache(1)
    outs = []
    for i, tok in enumerate(TOKENS):
        logits, cache = eng.decode(np.array([tok]), np.array([i]), cache)
        outs.append(np.asarray(logits)[0])
    got = np.stack(outs)
    prefill, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, prefill, rtol=1e-4, atol=1e-5)


def test_gemma2_generate_greedy_matches_hf(g2_xalm, tiny_g2):
    import torch
    import transformers

    eng = Engine.from_xalm(g2_xalm, progress=False)
    out, _ = eng.generate(TOKENS[:6], 12, stop_on_eos=False, segment=1)
    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_g2, torch_dtype=torch.float32, attn_implementation="eager"
    )
    model.eval()
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([TOKENS[:6]]), max_new_tokens=12, do_sample=False
        )[0][6:].tolist()
    assert out == hf


def test_gemma2_megakernel_matches_perlayer(tiny_g2, tmp_path):
    """Post-attn/post-ffn norms + both softcaps folded into the megakernel:
    i8 decode through a ring wrap must match the per-layer path exactly
    (same bf16 MXU compute on both sides)."""
    import jax.numpy as jnp

    from xalm_tpu.ops.fused_decode import fused_step_supported

    out = str(tmp_path / "g2_i8.xalm")
    assert cvt.main(["--input", tiny_g2, "--output", out, "--type", "i8"]) == 0
    fused = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False,
    )
    ref = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False, fused_step=False,
    )
    cache = fused.new_cache(1)
    assert fused_step_supported(fused.cfg, fused.params, cache.k, 1, 1)
    rng = np.random.default_rng(4)
    toks = rng.integers(3, 350, size=24)  # crosses the 16-token window
    cf, cr = cache, ref.new_cache(1)
    for i, t in enumerate(toks):
        lf, cf = fused.decode(np.array([t]), np.array([i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=3e-4, atol=3e-4,
        )
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )
