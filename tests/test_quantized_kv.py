"""Quantized (int8 + per-row scale) KV cache vs float KV.

The BASELINE north star's "FP16/quantized KV cache": int8 halves KV bytes;
greedy decode must track the f32-cache engine closely, including through
ring wraps with sink re-rotation (which re-quantizes the rotated rows).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    return out


def test_i8_kv_cache_shapes(model_path):
    eng = Engine.from_xalm(model_path, kv_dtype=jnp.int8, progress=False)
    cache = eng.new_cache(1)
    assert cache.quantized
    assert cache.k.dtype == jnp.int8
    assert cache.k_scale.shape == cache.k.shape[:-1]
    # half the bytes of an f16 cache (+ 1/hd of scale overhead)
    f16 = Engine.from_xalm(model_path, kv_dtype=jnp.float16, progress=False).new_cache(1)
    assert cache.nbytes() < f16.nbytes() * 0.75  # hd=16 here; at hd=128 the ratio is ~0.52


def test_i8_kv_matches_f32_kv_through_wraps(model_path):
    window = 16
    ref = Engine.from_xalm(model_path, context=window, kv_dtype=jnp.float32, progress=False)
    q = Engine.from_xalm(model_path, context=window, kv_dtype=jnp.int8, progress=False)

    rng = np.random.default_rng(0)
    toks = rng.integers(3, 350, size=2 * window + 8).tolist()
    cr, cq = ref.new_cache(1), q.new_cache(1)
    agree = 0
    for i, t in enumerate(toks):
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        lq, cq = q.decode(np.array([t]), np.array([i]), cq)
        lr, lq = np.asarray(lr), np.asarray(lq)
        # int8 rounding perturbs logits slightly; distribution must stay close
        np.testing.assert_allclose(lq, lr, rtol=0.15, atol=0.15, err_msg=f"pos {i}")
        agree += int(np.argmax(lq) == np.argmax(lr))
    assert agree >= len(toks) - 2  # near-perfect greedy agreement


def test_i8_kv_generate_and_session(model_path, tmp_path):
    from xalm_tpu.runtime.session import load_session, save_session

    eng = Engine.from_xalm(model_path, kv_dtype=jnp.int8, progress=False)
    prompt = eng.tokenizer.encode("the quick brown")
    first, _, sess = eng.generate(prompt, 5, stop_on_eos=False, segment=1, return_session=True)
    p = str(tmp_path / "q.xbk")
    save_session(p, eng.cfg, sess)
    sess2 = load_session(p, eng.cfg)
    assert sess2.cache.quantized
    rest, _ = eng.generate([], 4, stop_on_eos=False, segment=1, resume=sess2)
    full, _ = eng.generate(prompt, 9, stop_on_eos=False, segment=1)
    assert first + rest == full


def test_sharded_i8_kv_matches_single(model_path):
    """Quantized KV on a (dp, tp) mesh: scale planes shard with the kv heads;
    generation must match the single-device quantized engine."""
    import jax

    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine

    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    eng = ShardedEngine.from_xalm(model_path, mesh, kv_dtype=jnp.int8)
    ref = Engine.from_xalm(model_path, kv_dtype=jnp.int8, progress=False)
    prompt = ref.tokenizer.encode("a b c")
    want, _ = ref.generate(prompt, 6, stop_on_eos=False)
    got, _ = eng.generate(prompt, 6, stop_on_eos=False)
    assert got == want


def test_i8_kv_fused_pallas_matches_xla(model_path):
    """The quantized fused kernel set (interpret mode) vs the XLA quantized
    path, decoding through ring wraps with sink re-rotation."""
    window = 16
    xla = Engine.from_xalm(model_path, context=window, kv_dtype=jnp.int8,
                           matmul_impl="xla", progress=False)
    pls = Engine.from_xalm(model_path, context=window, kv_dtype=jnp.int8,
                           matmul_impl="pallas", progress=False)
    rng = np.random.default_rng(2)
    toks = rng.integers(3, 350, size=2 * window + 4).tolist()
    cx, cp = xla.new_cache(1), pls.new_cache(1)
    for i, t in enumerate(toks):
        lx, cx = xla.decode(np.array([t]), np.array([i]), cx)
        lp, cp = pls.decode(np.array([t]), np.array([i]), cp)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lx), rtol=3e-2, atol=3e-2, err_msg=f"pos {i}"
        )
        assert np.argmax(np.asarray(lp)) == np.argmax(np.asarray(lx)), f"pos {i}"
    # codes may differ by one count on rounding ties: the kernel's roll-based
    # pair rotation and apply_rope's reshape-based one differ in the last ulp
    dk = np.abs(np.asarray(cp.k, np.int32) - np.asarray(cx.k, np.int32))
    assert dk.max() <= 1 and (dk > 0).mean() < 0.02
    np.testing.assert_allclose(
        np.asarray(cp.k_scale), np.asarray(cx.k_scale), rtol=2e-3, atol=1e-7
    )


def test_i8_kv_decode_scan_matches_per_token(model_path):
    """Regression: Engine.decode_scan must carry the scale planes through the
    scan (dropping them silently decoded garbage on the segment path, which
    is the TPU default)."""
    eng = Engine.from_xalm(model_path, kv_dtype=jnp.int8, progress=False)
    prompt = eng.tokenizer.encode("one two three")

    per_tok, _ = eng.generate(prompt, 10, stop_on_eos=False, segment=1)
    seg, _ = eng.generate(prompt, 10, stop_on_eos=False, segment=4)
    assert seg == per_tok

    # the cache coming out of a scan stays quantized
    cache = eng.new_cache(1)
    logits, cache, pos = eng.prefill(prompt, cache, logits_mode="last")
    tok0 = np.argmax(np.asarray(logits), -1).astype(np.int32)
    out, cache = eng.decode_scan(tok0, np.array([pos], np.int32), cache, 4)
    assert cache.quantized


def test_i8_kv_session_segments_after_wrap(model_path, tmp_path):
    """Sessions + segments + wrap on the quantized cache (composition of the
    two prior silent-corruption bugs)."""
    from xalm_tpu.runtime.session import load_session, save_session

    eng = Engine.from_xalm(model_path, context=16, kv_dtype=jnp.int8, progress=False)
    prompt = eng.tokenizer.encode("a b c")
    full, _ = eng.generate(prompt, 28, stop_on_eos=False, segment=1)
    first, _, sess = eng.generate(prompt, 20, stop_on_eos=False, segment=8, return_session=True)
    p = str(tmp_path / "s.xbk")
    save_session(p, eng.cfg, sess)
    rest, _ = eng.generate([], 8, stop_on_eos=False, segment=1, resume=load_session(p, eng.cfg))
    assert first + rest == full
