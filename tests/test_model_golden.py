"""Golden tests: xalm_tpu forward vs HF transformers on the tiny fixture.

This is the framework's core correctness gate (SURVEY.md §7 build order
step 2): the converted model's logits must match the original HF
implementation — validating the name mapping, permute_reverse + interleaved
RoPE equivalence, GQA attention, RMS norms, and the GLU FFN all at once.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262, 263, 264, 8, 9, 1, 2, 33]


@pytest.fixture(scope="module")
def tiny_hf(tmp_path_factory):
    return make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))


@pytest.fixture(scope="module")
def hf_logits(tiny_hf):
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(tiny_hf, torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor([TOKENS])).logits
    return out[0].numpy()  # (T, vocab)


@pytest.fixture(scope="module")
def xalm_f32(tiny_hf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("xalm") / "tiny_f32.xalm")
    assert cvt.main(["--input", tiny_hf, "--output", out, "--type", "f32"]) == 0
    return out


@pytest.fixture(scope="module")
def engine_f32(xalm_f32):
    return Engine.from_xalm(xalm_f32)


def test_prefill_logits_match_hf_exact(xalm_f32, hf_logits):
    """With an f32 KV cache the forward must match HF to f32 noise — the
    strictest semantic check (RoPE/permute/GQA/norm/FFN all exact)."""
    import jax.numpy as jnp

    eng = Engine.from_xalm(xalm_f32, kv_dtype=jnp.float32)
    logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    assert logits.shape == hf_logits.shape
    np.testing.assert_allclose(logits, hf_logits, rtol=1e-4, atol=1e-5)


def test_prefill_logits_match_hf(engine_f32, hf_logits):
    """Default engine keeps the reference's fp16 KV cache (model.h:222-223);
    HF keeps f32 KV, so tolerance covers the fp16 rounding."""
    cache = engine_f32.new_cache(1)
    logits, cache, pos = engine_f32.prefill(TOKENS, cache, logits_mode="all")
    assert logits.shape == hf_logits.shape
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-2, atol=2e-3)


def test_decode_matches_prefill(engine_f32, hf_logits):
    """Feeding tokens one at a time (decode path: ring write + T=1 attention)
    must produce the same logits as the chunked prefill path."""
    eng = engine_f32
    cache = eng.new_cache(1)
    outs = []
    for i, tok in enumerate(TOKENS):
        logits, cache = eng.decode(np.array([tok]), np.array([i]), cache)
        outs.append(np.asarray(logits)[0])
    got = np.stack(outs)
    prefill, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(got, prefill, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got, hf_logits, rtol=2e-2, atol=2e-3)


def test_chunk_boundaries_consistent(engine_f32):
    """Different chunkings must agree (bucketing + padding correctness)."""
    eng = engine_f32
    full, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")

    cache = eng.new_cache(1)
    l1, cache, p = eng.prefill(TOKENS[:7], cache, logits_mode="all")
    # continue mid-stream: remaining tokens with pos offset
    rest = TOKENS[7:]
    outs = [l1]
    logits, cache = eng.step(
        np.array([rest], np.int32), np.array([7], np.int32), cache, logits_mode="all"
    )
    outs.append(np.asarray(logits)[0])
    got = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(got, full, rtol=1e-4, atol=1e-4)


def test_quantized_engines_close(tiny_hf, tmp_path, hf_logits):
    """f16/f8/i8 engines should stay close to the f32 golden logits —
    the quantization-quality analog of the reference's ppl-within-stderr
    check (SURVEY.md §4 item 5)."""
    tols = {"f16": 6e-3, "f8_e4m3": 0.3, "i8": 0.05}
    for tname, tol in tols.items():
        out = str(tmp_path / f"tiny_{tname}.xalm")
        assert cvt.main(["--input", str(tiny_hf), "--output", out, "--type", tname]) == 0
        eng = Engine.from_xalm(out)
        logits, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
        err = np.abs(logits - hf_logits).max()
        assert err < tol, f"{tname}: max logit err {err} > {tol}"


def test_generate_greedy_matches_hf(engine_f32, tiny_hf):
    import torch
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(tiny_hf, torch_dtype=torch.float32)
    model.eval()
    prompt = TOKENS[:6]
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0][len(prompt):].tolist()
    ours, stats = engine_f32.generate(prompt, 8, stop_on_eos=False)
    assert ours == hf_out
    assert stats.generated_tokens == 8
    assert stats.tok_per_s > 0


def test_perplexity_runs_and_is_sane(engine_f32):
    ppl, err, n = engine_f32.perplexity(TOKENS)
    assert n == len(TOKENS) - 1
    assert 1.0 < ppl < engine_f32.cfg.vocab_size * 2
    assert err >= 0


def test_fp8_recode_matches_fp8_logits(tiny_hf, tmp_path, hf_logits):
    """fp8 container loaded with load-time int8 recoding (the TPU fast path —
    v5e has no fp8 MXU) must match the true-fp8 engine's logits closely:
    recode error per value is <= row_absmax/254, finer than the fp8 grid at
    the row max. Also sanity-check both against the f32 goldens."""
    out = str(tmp_path / "tiny_f8.xalm")
    assert cvt.main(["--input", str(tiny_hf), "--output", out, "--type", "f8_e4m3"]) == 0
    eng_keep = Engine.from_xalm(out, fp8_mode="keep")
    eng_rec = Engine.from_xalm(out, fp8_mode="recode")
    # the recoded weights really are int8 + per-row scales
    assert eng_rec.params.layers.w2.values.dtype == jnp.int8
    assert eng_rec.params.layers.w2.scale is not None
    assert eng_keep.params.layers.w2.values.dtype != jnp.int8
    lk, _, _ = eng_keep.prefill(TOKENS, eng_keep.new_cache(1), logits_mode="all")
    lr, _, _ = eng_rec.prefill(TOKENS, eng_rec.new_cache(1), logits_mode="all")
    assert np.abs(lk - lr).max() < 0.05
    assert np.abs(lr - hf_logits).max() < 0.3


def test_wrapped_perplexity_matches_per_token(tiny_hf, tmp_path):
    """The scanned wrapped-tail ppl must equal per-token stepping."""
    out = str(tmp_path / "tiny_ppl.xalm")
    assert cvt.main(["--input", str(tiny_hf), "--output", out, "--type", "f32"]) == 0
    eng = Engine.from_xalm(out, context=16, progress=False)
    rng = np.random.default_rng(11)
    ids = rng.integers(3, 350, size=40).tolist()  # wraps the 16-token window
    ppl, err, n = eng.perplexity(ids)
    assert n == len(ids) - 1

    # manual per-token reference over the same wrapped tail
    import math

    from xalm_tpu.sampler import token_logprobs

    cache = eng.new_cache(1)
    logits_all, cache, pos = eng.prefill(ids[:16], cache, logits_mode="all")
    lps = list(
        np.asarray(
            token_logprobs(jnp.asarray(logits_all[:16]), jnp.asarray(ids[1:17]))
        )
    )
    while pos < len(ids) - 1:
        lg, cache = eng.decode(np.array([ids[pos]]), np.array([pos]), cache)
        lps.append(float(np.asarray(token_logprobs(lg, jnp.asarray([ids[pos + 1]])))[0]))
        pos += 1
    want = math.exp(-np.mean(lps))
    np.testing.assert_allclose(ppl, want, rtol=1e-4)
