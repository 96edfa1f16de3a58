"""Llama-3-style rope scaling: converter passthrough + frequency formula
vs HF transformers golden (no reference counterpart — the reference clamps
context to 4k instead of supporting scaled-rope checkpoints)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

LLAMA3_OVERRIDES = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "rope_scaling": {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 64,
    },
    "max_position_embeddings": 256,
}

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_l3(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf") / "tiny_llama3")
    return make_tiny_model(d, config_overrides=LLAMA3_OVERRIDES)


@pytest.fixture(scope="module")
def l3_xalm(tiny_l3, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x") / "tiny_l3.xalm")
    assert cvt.main(["--input", tiny_l3, "--output", out, "--type", "f32"]) == 0
    return out


def test_config_roundtrip(l3_xalm):
    eng = Engine.from_xalm(l3_xalm)
    cfg = eng.cfg
    assert cfg.rope_scaling == "llama3"
    assert cfg.rope_factor == 8.0
    assert cfg.rope_original_max_pos == 64


def test_llama3_scaled_logits_match_hf(l3_xalm, tiny_l3):
    import jax.numpy as jnp
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_l3, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        want = model(torch.tensor([TOKENS])).logits[0].numpy()

    eng = Engine.from_xalm(l3_xalm, kv_dtype=jnp.float32)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_linear_scaling_formula():
    """linear: every frequency divided by factor."""
    from xalm_tpu.models.config import ModelConfig
    from xalm_tpu.models.llama import rope_freqs

    kw = dict(
        dim=64, hidden_dim=128, head_dim=16, n_layers=1, n_heads=4,
        n_kv_heads=2, vocab_size=384, max_seq_len=256, rope_theta=1e4,
        rotary_dim=16,
    )
    f0 = rope_freqs(ModelConfig(**kw))
    f2 = rope_freqs(ModelConfig(**kw, rope_scaling="linear", rope_factor=2.0))
    np.testing.assert_allclose(f2, f0 / 2.0, rtol=1e-6)


def test_llama3_scaling_bands():
    """llama3: high-freq pairs untouched, lowest-freq pairs divided by
    factor, the band in between strictly between the two."""
    from xalm_tpu.models.config import ModelConfig
    from xalm_tpu.models.llama import rope_freqs

    kw = dict(
        dim=64, hidden_dim=128, head_dim=64, n_layers=1, n_heads=1,
        n_kv_heads=1, vocab_size=384, max_seq_len=2048, rope_theta=5e5,
        rotary_dim=64,
    )
    f0 = rope_freqs(ModelConfig(**kw))
    f3 = rope_freqs(
        ModelConfig(
            **kw, rope_scaling="llama3", rope_factor=8.0,
            rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
            rope_original_max_pos=512,
        )
    )
    wavelen = 2 * np.pi / f0
    hi = wavelen < 512 / 4.0
    lo = wavelen > 512 / 1.0
    mid = ~hi & ~lo
    assert hi.any() and lo.any() and mid.any()
    np.testing.assert_allclose(f3[hi], f0[hi], rtol=1e-6)
    np.testing.assert_allclose(f3[lo], f0[lo] / 8.0, rtol=1e-6)
    assert (f3[mid] < f0[mid]).all() and (f3[mid] > f0[mid] / 8.0).all()
