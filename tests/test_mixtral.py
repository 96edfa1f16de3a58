"""Mixtral (sparse MoE) family: converter + forward vs HF golden.

Beyond-parity family (reference loads dense Llama/Mistral only,
xalm.h:141). The MoE block follows HF modeling_mixtral exactly: f32
router softmax -> top-k of the probabilities -> renormalize; the expert
FFNs are computed densely over the stacked (E, ...) expert weights with
non-selected experts masked to weight zero (semantically exact)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

MIXTRAL_OVERRIDES = {
    "architectures": ["MixtralForCausalLM"],
    "model_type": "mixtral",
    "hidden_act": "silu",
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
    "rope_theta": 1000000.0,
}

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_mx(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf") / "tiny_mixtral")
    return make_tiny_model(d, config_overrides=MIXTRAL_OVERRIDES)


@pytest.fixture(scope="module")
def hf_logits(tiny_mx):
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_mx, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor([TOKENS])).logits
    return out[0].numpy()


@pytest.fixture(scope="module")
def mx_xalm(tiny_mx, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("x") / "tiny_mx.xalm")
    assert cvt.main(["--input", tiny_mx, "--output", out, "--type", "f32"]) == 0
    return out


def test_config_roundtrip(mx_xalm):
    eng = Engine.from_xalm(mx_xalm, progress=False)
    assert eng.cfg.n_experts == 4 and eng.cfg.n_experts_active == 2
    lp = eng.params.layers
    assert lp.w13 is None and lp.w2 is None
    assert lp.w13e.values.shape == (2, 4, 256, 64)  # (L, E, 2h, d)
    assert lp.w2e.values.shape == (2, 4, 64, 128)
    assert lp.wgate.shape == (2, 4, 64)


def test_mixtral_logits_match_hf(mx_xalm, hf_logits):
    import jax.numpy as jnp

    eng = Engine.from_xalm(mx_xalm, kv_dtype=jnp.float32, progress=False)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    assert logits.shape == hf_logits.shape
    np.testing.assert_allclose(logits, hf_logits, rtol=1e-4, atol=1e-4)


def test_mixtral_decode_matches_prefill(mx_xalm):
    import jax.numpy as jnp

    eng = Engine.from_xalm(mx_xalm, kv_dtype=jnp.float32, progress=False)
    cache = eng.new_cache(1)
    outs = []
    for i, tok in enumerate(TOKENS):
        logits, cache = eng.decode(np.array([tok]), np.array([i]), cache)
        outs.append(np.asarray(logits)[0])
    got = np.stack(outs)
    prefill, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, prefill, rtol=1e-4, atol=1e-5)


def test_mixtral_generate_greedy_matches_hf(mx_xalm, tiny_mx):
    import torch
    import transformers

    eng = Engine.from_xalm(mx_xalm, progress=False)
    out, _ = eng.generate(TOKENS[:6], 12, stop_on_eos=False, segment=1)

    model = transformers.AutoModelForCausalLM.from_pretrained(
        tiny_mx, torch_dtype=torch.float32
    )
    model.eval()
    with torch.no_grad():
        hf = model.generate(
            torch.tensor([TOKENS[:6]]), max_new_tokens=12, do_sample=False
        )[0][6:].tolist()
    assert out == hf


def test_mixtral_i8_close(tiny_mx, tmp_path, hf_logits):
    out = str(tmp_path / "tiny_mx_i8.xalm")
    assert cvt.main(["--input", tiny_mx, "--output", out, "--type", "i8"]) == 0
    eng = Engine.from_xalm(out, progress=False)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    err = np.abs(logits - hf_logits).max()
    assert err < 0.4, f"i8 max logit err {err}"


def test_mixtral_pipeline_parallel(mx_xalm):
    """pp shards the expert stacks by layer like everything else."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from xalm_tpu.parallel.pipeline import PipelinedEngine, make_pp_mesh

    ref = Engine.from_xalm(mx_xalm, kv_dtype=jnp.float32, progress=False)
    want, _, _ = ref.prefill(TOKENS, ref.new_cache(1), logits_mode="all")
    eng = PipelinedEngine.from_xalm(mx_xalm, make_pp_mesh(2), kv_dtype=jnp.float32)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_mixtral_expert_parallel_matches_single(mx_xalm):
    """Expert parallelism over tp: each device computes only its local
    experts (the router slice is zero elsewhere) and the down psum sums
    contributions exactly."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine

    ref = Engine.from_xalm(mx_xalm, kv_dtype=jnp.float32, progress=False)
    want, _, _ = ref.prefill(TOKENS, ref.new_cache(1), logits_mode="all")
    eng = ShardedEngine.from_xalm(mx_xalm, make_mesh(dp=1, tp=2), kv_dtype=jnp.float32)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    a, _ = ref.generate(TOKENS[:5], 10, stop_on_eos=False, segment=1)
    b, _ = eng.generate(TOKENS[:5], 10, stop_on_eos=False, segment=5)
    assert a == b


def test_mixtral_sparse_decode_matches_dense(tiny_mx, tmp_path):
    """Gathered sparse expert decode (pallas, b=1 t=1: stream only the
    top-k experts via the (L*E, ...) scalar-prefetch index) must match the
    dense-masked XLA path token for token and in logits."""
    import jax.numpy as jnp

    # f32 container: the pallas kernels then compute in f32 too, so the
    # sparse gather must match the dense-masked einsums tightly (an i8
    # container compares bf16-MXU vs f32-XLA compute — tolerance, not
    # equivalence)
    out = str(tmp_path / "mx_f32.xalm")
    assert cvt.main(["--input", tiny_mx, "--output", out, "--type", "f32"]) == 0
    sparse = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, progress=False
    )
    dense = Engine.from_xalm(
        out, matmul_impl="xla", kv_dtype=jnp.float32, progress=False
    )
    rng = np.random.default_rng(31)
    toks = rng.integers(3, 350, size=10)
    cs, cd = sparse.new_cache(1), dense.new_cache(1)
    for i, t in enumerate(toks):
        ls, cs = sparse.decode(np.array([t]), np.array([i]), cs)
        ld, cd = dense.decode(np.array([t]), np.array([i]), cd)
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(ld), rtol=2e-4, atol=2e-4,
        )
    prompt = rng.integers(3, 350, size=6).tolist()
    want, _ = dense.generate(prompt, 8, stop_on_eos=False)
    got, _ = sparse.generate(prompt, 8, stop_on_eos=False)
    assert got == want
