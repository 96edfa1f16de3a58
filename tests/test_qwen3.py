"""Qwen3 model family: per-head q/k RMS norms before rope, vs HF golden.

Beyond-parity family. The (head_dim,) qk-norm weights carry the same
in-head rope permutation as the projection rows they scale (the RMS
reduction itself is permutation-invariant), so the runtime applies a
plain per-head rmsnorm on the permuted layout and matches HF exactly.
The megakernel gates itself off (qk-norm is not folded)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

QWEN3_OVERRIDES = {
    "architectures": ["Qwen3ForCausalLM"],
    "model_type": "qwen3",
    "hidden_act": "silu",
    "rope_theta": 1000000.0,
    "tie_word_embeddings": False,
}

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_q3(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf") / "tiny_qwen3")
    return make_tiny_model(d, config_overrides=QWEN3_OVERRIDES)


@pytest.fixture(scope="module")
def q3_xalm(tiny_q3, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x") / "tiny_q3.xalm")
    assert cvt.main(["--input", tiny_q3, "--output", out, "--type", "f32"]) == 0
    return out


def test_config_roundtrip(q3_xalm):
    eng = Engine.from_xalm(q3_xalm, progress=False)
    assert eng.cfg.qk_norm
    lp = eng.params.layers
    assert lp.q_norm is not None and lp.q_norm.shape == (2, 16)
    assert lp.k_norm is not None


def test_qwen3_logits_match_hf(q3_xalm, tiny_q3):
    import jax.numpy as jnp
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_q3, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        want = model(torch.tensor([TOKENS])).logits[0].numpy()
    eng = Engine.from_xalm(q3_xalm, kv_dtype=jnp.float32, progress=False)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qwen3_generate_greedy_matches_hf(q3_xalm, tiny_q3):
    import torch
    import transformers

    eng = Engine.from_xalm(q3_xalm, progress=False)
    out, _ = eng.generate(TOKENS[:6], 12, stop_on_eos=False, segment=1)
    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_q3, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([TOKENS[:6]]), max_new_tokens=12, do_sample=False
        )[0][6:].tolist()
    assert out == hf


def test_qwen3_decode_matches_prefill(q3_xalm):
    import jax.numpy as jnp

    eng = Engine.from_xalm(q3_xalm, kv_dtype=jnp.float32, progress=False)
    cache = eng.new_cache(1)
    outs = []
    for i, tok in enumerate(TOKENS):
        logits, cache = eng.decode(np.array([tok]), np.array([i]), cache)
        outs.append(np.asarray(logits)[0])
    got = np.stack(outs)
    prefill, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, prefill, rtol=1e-4, atol=1e-5)


def test_qwen3_megakernel_matches_perlayer(tiny_q3, tmp_path):
    """Per-head q/k RMS norms folded into the megakernel (pre-rope, after
    clip — llama.body order): i8 decode through a ring wrap must match the
    per-layer path exactly."""
    import jax.numpy as jnp

    from xalm_tpu.ops.fused_decode import fused_step_supported

    out = str(tmp_path / "qwen3_i8.xalm")
    assert cvt.main(["--input", tiny_q3, "--output", out, "--type", "i8"]) == 0
    fused = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False,
    )
    ref = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False, fused_step=False,
    )
    cache = fused.new_cache(1)
    assert fused.params.layers.q_norm is not None
    assert fused_step_supported(fused.cfg, fused.params, cache.k, 1, 1)
    rng = np.random.default_rng(8)
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
