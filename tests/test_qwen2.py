"""Qwen2 model family: converter + forward vs HF transformers golden.

Beyond-parity family (reference loads Llama/Mistral only, xalm.h:141).
Qwen2's single delta from the Mistral family is the q/k/v projection bias
(HF modeling_qwen2): the converter emits the bias vectors (1-D tensors
stay high-precision, and q/k biases get the same permute_reverse rope
re-interleave as their weights), params fuses them into wqkv's
kv-head-grouped row order, and the forward adds them after the qkv matmul
— outside the kernels, so every matmul impl serves the family. The fused
whole-step megakernel gates itself off when a bias is present."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

QWEN2_OVERRIDES = {
    "architectures": ["Qwen2ForCausalLM"],
    "model_type": "qwen2",
    "hidden_act": "silu",
    "rope_theta": 1000000.0,
    "tie_word_embeddings": False,
}

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_qwen(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf") / "tiny_qwen2")
    return make_tiny_model(d, config_overrides=QWEN2_OVERRIDES)


@pytest.fixture(scope="module")
def hf_logits(tiny_qwen):
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_qwen, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor([TOKENS])).logits
    return out[0].numpy()


@pytest.fixture(scope="module")
def qwen_xalm(tiny_qwen, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x") / "tiny_qwen2.xalm")
    assert cvt.main(["--input", tiny_qwen, "--output", out, "--type", "f32"]) == 0
    return out


def test_bias_loaded(qwen_xalm):
    import jax.numpy as jnp

    eng = Engine.from_xalm(qwen_xalm, kv_dtype=jnp.float32)
    lp = eng.params.layers
    assert lp.bqkv is not None
    assert lp.bqkv.shape == (eng.cfg.n_layers, lp.wqkv.values.shape[1])


def test_qwen2_logits_match_hf(qwen_xalm, hf_logits):
    import jax.numpy as jnp

    eng = Engine.from_xalm(qwen_xalm, kv_dtype=jnp.float32)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    assert logits.shape == hf_logits.shape
    np.testing.assert_allclose(logits, hf_logits, rtol=1e-4, atol=1e-4)


def test_qwen2_decode_matches_prefill(qwen_xalm):
    import jax.numpy as jnp

    eng = Engine.from_xalm(qwen_xalm, kv_dtype=jnp.float32)
    cache = eng.new_cache(1)
    outs = []
    for i, tok in enumerate(TOKENS):
        logits, cache = eng.decode(np.array([tok]), np.array([i]), cache)
        outs.append(np.asarray(logits)[0])
    got = np.stack(outs)
    prefill, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, prefill, rtol=1e-4, atol=1e-5)


def test_qwen2_generate_greedy_matches_hf(qwen_xalm, tiny_qwen):
    import torch
    import transformers

    eng = Engine.from_xalm(qwen_xalm)
    out, _ = eng.generate(TOKENS[:6], 12, stop_on_eos=False, segment=1)

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_qwen, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([TOKENS[:6]]), max_new_tokens=12, do_sample=False
        )[0][6:].tolist()
    assert out == hf


def test_qwen2_i8_close(tiny_qwen, tmp_path, hf_logits):
    out = str(tmp_path / "tiny_qwen2_i8.xalm")
    assert cvt.main(["--input", tiny_qwen, "--output", out, "--type", "i8"]) == 0
    eng = Engine.from_xalm(out)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    err = np.abs(logits - hf_logits).max()
    assert err < 0.3, f"i8 max logit err {err}"


def test_qwen2_sharded_matches_single(qwen_xalm):
    """Bias must ride the tp column shards: tp=2 logits == single-device."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine

    ref = Engine.from_xalm(qwen_xalm, kv_dtype=jnp.float32)
    want, _, _ = ref.prefill(TOKENS, ref.new_cache(1), logits_mode="all")

    mesh = make_mesh(dp=1, tp=2)
    eng = ShardedEngine.from_xalm(qwen_xalm, mesh, kv_dtype=jnp.float32)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_qwen2_megakernel_matches_perlayer(tiny_qwen, tmp_path):
    """The fused qkv bias rides the megakernel's phase-1 epilogue: i8
    decode through a ring wrap must match the per-layer path exactly."""
    import jax.numpy as jnp

    from xalm_tpu.ops.fused_decode import fused_step_supported

    out = str(tmp_path / "qwen2_i8.xalm")
    assert cvt.main(["--input", tiny_qwen, "--output", out, "--type", "i8"]) == 0
    fused = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False,
    )
    ref = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False, fused_step=False,
    )
    cache = fused.new_cache(1)
    assert fused.params.layers.bqkv is not None
    assert fused_step_supported(fused.cfg, fused.params, cache.k, 1, 1)
    rng = np.random.default_rng(6)
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
