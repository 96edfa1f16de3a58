"""Megakernel decode (ops/fused_decode.py) vs the reference XLA path.

The whole-layer-stack fused kernel must be numerically interchangeable with
the per-op forward: same logits, same cache contents, through ring wrap and
sink re-rotation (the gate SURVEY.md §4 sets for every kernel: jit-vs-
interpret equivalence on the same inputs).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine


@pytest.fixture(scope="module")
def tiny_i8(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny_i8.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "i8"]) == 0
    return out


def _engines(tiny_i8, context=0):
    """(fused megakernel, per-layer pallas) — identical bf16 MXU compute, so
    equivalence is tight; the XLA engine differs by activation dtype."""
    fused = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, context=context,
        progress=False,
    )
    ref = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, context=context,
        progress=False, fused_step=False,
    )
    return fused, ref


def test_fused_gate_is_active(tiny_i8):
    from xalm_tpu.ops.fused_decode import fused_step_supported

    eng, _ = _engines(tiny_i8)
    cache = eng.new_cache(1)
    assert fused_step_supported(eng.cfg, eng.params, cache.k, 1, 1)


def test_fused_decode_matches_xla(tiny_i8):
    """Per-token decode from scratch: logits AND cache must match."""
    fused, ref = _engines(tiny_i8)
    rng = np.random.default_rng(0)
    toks = rng.integers(3, 350, size=12)
    cf, cr = fused.new_cache(1), ref.new_cache(1)
    for i, t in enumerate(toks):
        lf, cf = fused.decode(np.array([t]), np.array([i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=2e-4, atol=2e-4,
        )
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cf.v), np.asarray(cr.v), rtol=1e-5, atol=1e-5
    )


def test_fused_decode_wrap_and_sinks(tiny_i8):
    """Decode through >2 ring wraps at a tiny window: the in-kernel ring
    insert, sink re-rotation, and patched attention reads must track the
    XLA path exactly."""
    fused, ref = _engines(tiny_i8, context=16)
    rng = np.random.default_rng(1)
    toks = rng.integers(3, 350, size=40)
    cf, cr = fused.new_cache(1), ref.new_cache(1)
    for i, t in enumerate(toks):
        lf, cf = fused.decode(np.array([t]), np.array([i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=3e-4, atol=3e-4,
        )
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )


def test_fused_generate_matches_xla(tiny_i8):
    """End-to-end greedy generation (scan path) agrees token-for-token."""
    fused, ref = _engines(tiny_i8)
    prompt = np.random.default_rng(2).integers(3, 350, size=6).tolist()
    want, _ = ref.generate(prompt, 8, stop_on_eos=False)
    got, _ = fused.generate(prompt, 8, stop_on_eos=False)
    assert got == want


def test_fused_close_to_xla_engine(tiny_i8):
    """Against the f32 XLA engine the fused path differs only by the bf16
    MXU activation cast (same bound the per-layer pallas tests use)."""
    fused = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, progress=False
    )
    xla = Engine.from_xalm(
        tiny_i8, matmul_impl="xla", kv_dtype=jnp.float32, progress=False
    )
    lf, cf = fused.decode(np.array([7]), np.array([0]), fused.new_cache(1))
    lx, cx = xla.decode(np.array([7]), np.array([0]), xla.new_cache(1))
    lf, lx = np.asarray(lf), np.asarray(lx)
    assert np.abs(lf - lx).max() < 2e-2
    assert lf.argmax() == lx.argmax()


def test_fused_respects_kill_switch(tiny_i8, monkeypatch):
    monkeypatch.setenv("XALM_NO_MEGAKERNEL", "1")
    from xalm_tpu.ops.fused_decode import fused_step_supported

    eng, _ = _engines(tiny_i8)
    cache = eng.new_cache(1)
    assert not fused_step_supported(eng.cfg, eng.params, cache.k, 1, 1)


def test_fused_with_wcls_i8(tiny_i8):
    """Megakernel + i8-recoded classifier head: the logits projection after
    the fused layer stack runs the i8 qmatmul and greedy decisions hold."""
    base = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, progress=False
    )
    q = Engine(
        base.cfg, base.params, base.tokenizer, matmul_impl="pallas",
        kv_dtype=jnp.float32, wcls_i8=True,
    )
    assert q.params.wcls.values.dtype == jnp.int8
    from xalm_tpu.ops.fused_decode import wcls_fold_supported

    # the in-kernel classifier stream (phase 5) must be what's under test
    assert wcls_fold_supported(q.cfg, q.params)
    prompt = np.random.default_rng(5).integers(3, 350, size=6).tolist()
    want, _ = base.generate(prompt, 8, stop_on_eos=False)
    got, _ = q.generate(prompt, 8, stop_on_eos=False)
    # greedy path may diverge after a near-tie; require agreement on the
    # first tokens and full-vocab logit closeness at step 0
    assert got[:4] == want[:4]
    lb, _ = base.decode(np.array([7]), np.array([0]), base.new_cache(1))
    lq, _ = q.decode(np.array([7]), np.array([0]), q.new_cache(1))
    lb, lq = np.asarray(lb, np.float32), np.asarray(lq, np.float32)
    assert np.abs(lb - lq).max() < 0.05 * max(1.0, np.abs(lb).max())


def test_fused_decode_scan_crosses_wrap(tiny_i8):
    """decode_scan whose steps cross the window boundary mid-scan (the
    bench --wrap regime): the in-scan rotate flag must flip exactly where
    the per-layer path's does, and caches must agree after the scan."""
    fused, ref = _engines(tiny_i8, context=16)
    rng = np.random.default_rng(3)
    warm = rng.integers(3, 350, size=10)
    cf, cr = fused.new_cache(1), ref.new_cache(1)
    for i, t in enumerate(warm):  # pos 0..9, window 16: scan will wrap
        _, cf = fused.decode(np.array([t]), np.array([i]), cf)
        _, cr = ref.decode(np.array([t]), np.array([i]), cr)
    tf, cf = fused.decode_scan(np.array([5]), np.array([10]), cf, 14)
    tr, cr = ref.decode_scan(np.array([5]), np.array([10]), cr, 14)
    np.testing.assert_array_equal(np.asarray(tf), np.asarray(tr))
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )


def test_fused_all_folds_combined(tiny_i8):
    """The full headline TPU decode config — embed fold (in-kernel row
    gather + rope trig) AND wcls fold (phase-5 i8 head stream + in-kernel
    argmax) in the SAME kernel — vs the per-layer path on identical params.
    Prompt includes 16-row-window boundary token ids (15, 368, 383: last
    row of an embed DMA window / last vocab row) and the scan crosses a
    ring wrap."""
    import dataclasses

    from xalm_tpu.models.params import QWeight
    from xalm_tpu.ops.fused_decode import (
        embed_fold_supported,
        wcls_fold_supported,
    )

    base = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False,
    )
    p16 = dataclasses.replace(
        base.params, embed=QWeight(base.params.embed.values.astype(jnp.bfloat16))
    )
    fold = Engine(base.cfg, p16, base.tokenizer, matmul_impl="pallas",
                  kv_dtype=jnp.float32, wcls_i8=True)
    assert embed_fold_supported(fold.cfg, fold.params)
    assert wcls_fold_supported(fold.cfg, fold.params)
    ref = Engine(base.cfg, fold.params, base.tokenizer, matmul_impl="pallas",
                 kv_dtype=jnp.float32, fused_step=False)

    toks = [15, 368, 383, 7, 200, 31]  # boundary rows + ordinary ids
    cf, cr = fold.new_cache(1), ref.new_cache(1)
    for i, t in enumerate(toks):
        lf, cf = fold.decode(np.array([t]), np.array([i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=3e-4, atol=3e-4,
        )
    # greedy scan through the wrap: in-kernel argmax must track XLA argmax
    tf, cf = fold.decode_scan(np.array([5]), np.array([len(toks)]), cf, 16)
    tr, cr = ref.decode_scan(np.array([5]), np.array([len(toks)]), cr, 16)
    np.testing.assert_array_equal(np.asarray(tf), np.asarray(tr))
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )


def test_fused_batched_decode_matches(tiny_i8):
    """B=4 megakernel decode (per-row kv_pos/rotate, a valid-masked row)
    vs the per-layer batched kernels. Rows sit at DIFFERENT positions —
    the serving-slot shape — and one crosses the ring wrap mid-test while
    another is inactive padding that must not write or rotate."""
    fused, ref = _engines(tiny_i8, context=16)
    rng = np.random.default_rng(11)
    b = 4
    # stagger rows: row0 starts deep (will wrap), row3 is fresh
    base_pos = np.array([12, 6, 2, 0], np.int32)
    cf, cr = fused.new_cache(b), ref.new_cache(b)
    # hydrate rows to their staggered depths with batched steps (valid
    # masks rows not yet started)
    for i in range(int(base_pos.max())):
        toks = rng.integers(3, 350, size=(b, 1)).astype(np.int32)
        valid = jnp.asarray(i < base_pos)[:, None]
        pos = np.minimum(np.full(b, i, np.int32), base_pos)
        _, cf = fused.step(toks, pos, cf, valid=valid, logits_mode="none")
        _, cr = ref.step(toks, pos, cr, valid=valid, logits_mode="none")
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )
    # per-row-position decode: 10 steps takes row0 past the window (wrap +
    # sink re-rotation) while row3 is still filling
    pos = base_pos.copy()
    for i in range(10):
        toks = rng.integers(3, 350, size=b).astype(np.int32)
        lf, cf = fused.decode(toks, pos, cf)
        lr, cr = ref.decode(toks, pos, cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=3e-4, atol=3e-4,
        )
        pos += 1
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cf.v), np.asarray(cr.v), rtol=1e-4, atol=1e-5
    )
    # batched greedy scan with an inactive row (serving decode shape)
    valid = jnp.asarray([True, True, True, False])
    t0 = rng.integers(3, 350, size=b).astype(np.int32)
    tf, cf = fused.decode_scan(t0, pos, cf, 6, valid=valid)
    tr, cr = ref.decode_scan(t0, pos, cr, 6, valid=valid)
    np.testing.assert_array_equal(
        np.asarray(tf)[:3], np.asarray(tr)[:3]
    )
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )


def test_fused_batched_wcls_fold(tiny_i8):
    """B=4 + i8 head: the per-row in-kernel argmax must match XLA argmax
    row for row."""
    base = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, progress=False
    )
    q = Engine(base.cfg, base.params, base.tokenizer, matmul_impl="pallas",
               kv_dtype=jnp.float32, wcls_i8=True)
    ref = Engine(base.cfg, q.params, base.tokenizer, matmul_impl="pallas",
                 kv_dtype=jnp.float32, wcls_i8=True, fused_step=False)
    rng = np.random.default_rng(13)
    b = 4
    prompt = rng.integers(3, 350, size=(b, 5)).astype(np.int32)
    cq, cr = q.new_cache(b), ref.new_cache(b)
    lq, cq = q.step(prompt, np.zeros(b, np.int32), cq)
    lr, cr = ref.step(prompt, np.zeros(b, np.int32), cr)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lr), rtol=3e-4, atol=3e-4)
    t0 = np.argmax(np.asarray(lq), -1).astype(np.int32)
    pos = np.full(b, 5, np.int32)
    tq, cq = q.decode_scan(t0, pos, cq, 8)
    tr2, cr = ref.decode_scan(t0, pos, cr, 8)
    np.testing.assert_array_equal(np.asarray(tq), np.asarray(tr2))


def _engines_q(tiny_i8, context=0):
    """(fused megakernel, per-layer) with the quantized int8 KV cache."""
    fused = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.int8, context=context,
        progress=False,
    )
    ref = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.int8, context=context,
        progress=False, fused_step=False,
    )
    return fused, ref


def test_fused_i8kv_gate_is_active(tiny_i8):
    from xalm_tpu.ops.fused_decode import fused_step_supported

    eng, _ = _engines_q(tiny_i8)
    cache = eng.new_cache(1)
    assert cache.k_scale is not None
    assert fused_step_supported(eng.cfg, eng.params, cache.k, 1, 1, cache.k_scale)


def test_fused_i8kv_decode_matches(tiny_i8):
    """i8-KV megakernel vs the per-layer _q kernels: logits, codes AND
    scale planes must match through ring wrap + sink re-rotation (the
    in-kernel quantize/requant mirrors _insert_q/_sink_q exactly)."""
    fused, ref = _engines_q(tiny_i8)
    rng = np.random.default_rng(7)
    cf, cr = fused.new_cache(1), ref.new_cache(1)
    prompt = rng.integers(3, 350, size=(1, 4)).astype(np.int32)
    lf, cf = fused.step(prompt, np.zeros(1, np.int32), cf)
    lr, cr = ref.step(prompt, np.zeros(1, np.int32), cr)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr), rtol=3e-4, atol=3e-4)
    pos = np.full(1, 4, np.int32)
    # logical window is 16: 30 steps cross the wrap and re-rotate sinks
    for _ in range(30):
        t = rng.integers(3, 350, size=1).astype(np.int32)
        of, cf = fused.decode(t, pos, cf)
        orr, cr = ref.decode(t, pos, cr)
        np.testing.assert_allclose(
            np.asarray(of), np.asarray(orr), rtol=3e-4, atol=3e-4
        )
        pos += 1
    np.testing.assert_array_equal(np.asarray(cf.k), np.asarray(cr.k))
    np.testing.assert_array_equal(np.asarray(cf.v), np.asarray(cr.v))
    np.testing.assert_array_equal(np.asarray(cf.k_scale), np.asarray(cr.k_scale))
    np.testing.assert_array_equal(np.asarray(cf.v_scale), np.asarray(cr.v_scale))


def test_fused_i8kv_batched_scan(tiny_i8):
    """B=4 i8-KV megakernel decode_scan with staggered rows + an inactive
    valid-masked row: greedy tokens and both scale planes must match the
    per-layer path."""
    fused, ref = _engines_q(tiny_i8, context=16)
    rng = np.random.default_rng(17)
    b = 4
    base_pos = np.array([10, 6, 2, 0], np.int32)
    cf, cr = fused.new_cache(b), ref.new_cache(b)
    for i in range(int(base_pos.max())):
        toks = rng.integers(3, 350, size=(b, 1)).astype(np.int32)
        valid = jnp.asarray(i < base_pos)[:, None]
        pos = np.minimum(np.full(b, i, np.int32), base_pos)
        _, cf = fused.step(toks, pos, cf, valid=valid, logits_mode="none")
        _, cr = ref.step(toks, pos, cr, valid=valid, logits_mode="none")
    valid = jnp.asarray([True, True, True, False])
    t0 = rng.integers(3, 350, size=b).astype(np.int32)
    # 12 steps take row0 past the 16-token window (wrap + requant rotation)
    tf, cf = fused.decode_scan(t0, base_pos, cf, 12, valid=valid)
    tr, cr = ref.decode_scan(t0, base_pos, cr, 12, valid=valid)
    np.testing.assert_array_equal(np.asarray(tf)[:3], np.asarray(tr)[:3])
    np.testing.assert_array_equal(np.asarray(cf.k), np.asarray(cr.k))
    # codes are bit-exact; requant scales may differ by one f32 ulp (the
    # batched rotation's fma/op ordering differs from the per-layer kernel)
    np.testing.assert_allclose(
        np.asarray(cf.k_scale), np.asarray(cr.k_scale), rtol=1e-6, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(cf.v_scale), np.asarray(cr.v_scale), rtol=1e-6, atol=0
    )


def test_fused_i8kv_wcls_fold(tiny_i8):
    """i8 KV + i8 head: in-kernel argmax tokens must match the per-layer
    path with the same quantized head."""
    base = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.int8, progress=False,
        wcls_i8=True,
    )
    ref = Engine(base.cfg, base.params, base.tokenizer, matmul_impl="pallas",
                 kv_dtype=jnp.int8, wcls_i8=True, fused_step=False)
    rng = np.random.default_rng(23)
    prompt = rng.integers(3, 350, size=(1, 5)).astype(np.int32)
    cq, cr = base.new_cache(1), ref.new_cache(1)
    lq, cq = base.step(prompt, np.zeros(1, np.int32), cq)
    lr, cr = ref.step(prompt, np.zeros(1, np.int32), cr)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lr), rtol=3e-4, atol=3e-4)
    t0 = np.argmax(np.asarray(lq), -1).astype(np.int32)
    pos = np.full(1, 5, np.int32)
    tq, cq = base.decode_scan(t0, pos, cq, 8)
    tr2, cr = ref.decode_scan(t0, pos, cr, 8)
    np.testing.assert_array_equal(np.asarray(tq), np.asarray(tr2))


def test_fused_embed_fold_matches(tiny_i8, monkeypatch):
    """In-kernel embed row gather + rope trig (fold_embed) vs the XLA
    gather path. CPU containers keep f16 embeds (fold inactive), so cast
    to bf16 — the dtype the TPU loader produces — to engage the fold."""
    import dataclasses

    from xalm_tpu.models.params import QWeight
    from xalm_tpu.ops.fused_decode import embed_fold_supported

    base = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False,
    )
    p16 = dataclasses.replace(
        base.params, embed=QWeight(base.params.embed.values.astype(jnp.bfloat16))
    )
    fold = Engine(base.cfg, p16, base.tokenizer, matmul_impl="pallas",
                  kv_dtype=jnp.float32)
    assert embed_fold_supported(fold.cfg, fold.params)
    monkeypatch.setenv("XALM_NO_MK_EMBED", "1")
    ref = Engine(base.cfg, p16, base.tokenizer, matmul_impl="pallas",
                 kv_dtype=jnp.float32)
    assert not embed_fold_supported(ref.cfg, ref.params)
    monkeypatch.delenv("XALM_NO_MK_EMBED")
    rng = np.random.default_rng(9)
    toks = rng.integers(3, 350, size=24)  # through a wrap at window 16
    cf, cr = fold.new_cache(1), ref.new_cache(1)
    for i, t in enumerate(toks):
        lf, cf = fold.decode(np.array([t]), np.array([i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=3e-4, atol=3e-4,
        )
    np.testing.assert_allclose(
        np.asarray(cf.k), np.asarray(cr.k), rtol=1e-4, atol=1e-5
    )


def test_decode_path_is_surfaced(tiny_i8, monkeypatch):
    """Engine.decode_path reports which decode implementation a config
    actually runs (fallbacks must be visible, not silent)."""
    import jax.numpy as jnp

    fused, ref = _engines(tiny_i8)
    assert fused.decode_path(1) == "megakernel"
    assert ref.decode_path(1) == "perlayer"
    # batch beyond the kernel's unroll cap falls back — and says so
    assert fused.decode_path(64) == "perlayer"
    xla = Engine.from_xalm(tiny_i8, matmul_impl="xla",
                           kv_dtype=jnp.float32, progress=False)
    assert xla.decode_path(1) == "xla"
    monkeypatch.setenv("XALM_NO_MEGAKERNEL", "1")
    assert fused.decode_path(1) == "perlayer"


def test_fused_mixed_lane_width(tmp_path):
    """q_dim != dim (Gemma-2-style geometry): pool A carries two lane
    widths (wqkv/w13/wcls contract dim, wo contracts q_dim) — tiles DMA
    into a lane-prefix slice of the max-width pool. Decode through a wrap
    must match the per-layer path."""
    from tests.make_tiny_model import make_tiny_model
    from xalm_tpu.ops.fused_decode import fused_step_supported

    hf = make_tiny_model(
        str(tmp_path / "hf"),
        config_overrides={"head_dim": 32},  # q_dim 4*32=128 != dim 64
    )
    out = str(tmp_path / "t.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "i8"]) == 0
    fused = Engine.from_xalm(
        out, matmul_impl="pallas", kv_dtype=jnp.float32, context=16,
        progress=False, wcls_i8=True,
    )
    ref = Engine(fused.cfg, fused.params, fused.tokenizer,
                 matmul_impl="pallas", kv_dtype=jnp.float32, fused_step=False)
    assert fused.params.layers.wo.values.shape[2] != fused.cfg.dim
    cache = fused.new_cache(1)
    assert fused_step_supported(fused.cfg, fused.params, cache.k, 1, 1)
    rng = np.random.default_rng(21)
    toks = rng.integers(3, 350, size=24)
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


def test_fused_a8_decode_close(tiny_i8):
    """W8A8 decode (per-row int8 activations through every megakernel dot):
    logits stay within activation-quantization noise of the bf16-activation
    kernel and greedy decisions hold on the first steps."""
    base = Engine.from_xalm(
        tiny_i8, matmul_impl="pallas", kv_dtype=jnp.float32, progress=False,
        wcls_i8=True,
    )
    a8 = Engine(base.cfg, base.params, base.tokenizer, matmul_impl="pallas",
                kv_dtype=jnp.float32, wcls_i8=True, a8_decode=True)
    lb, _ = base.decode(np.array([7]), np.array([0]), base.new_cache(1))
    la, _ = a8.decode(np.array([7]), np.array([0]), a8.new_cache(1))
    lb, la = np.asarray(lb, np.float32), np.asarray(la, np.float32)
    assert np.abs(lb - la).max() < 0.08 * max(1.0, np.abs(lb).max())
    assert lb.argmax() == la.argmax()
    prompt = np.random.default_rng(41).integers(3, 350, size=6).tolist()
    want, _ = base.generate(prompt, 6, stop_on_eos=False)
    got, _ = a8.generate(prompt, 6, stop_on_eos=False)
    assert got[:3] == want[:3]


def test_auto_routing_measured_table(tiny_i8):
    """fused_step='auto' (the default) routes by the silicon-measured table
    (ops/fused_decode.measured_fused_preferred, docs/PERF.md variant
    matrix): megakernel everywhere EXCEPT batch >= 8 with an int8 cache,
    and decode_path reports the same resolution the forward uses."""
    auto = Engine.from_xalm(tiny_i8, matmul_impl="pallas", kv_dtype=jnp.int8,
                            progress=False)
    assert auto.fused_step == "auto"
    assert auto.decode_path(1) == "megakernel"
    assert auto.decode_path(8) == "perlayer"
    # float cache: megakernel at every batch the kernel supports
    autof = Engine.from_xalm(tiny_i8, matmul_impl="pallas",
                             kv_dtype=jnp.float32, progress=False)
    assert autof.decode_path(8) == "megakernel"

    # numeric equivalence across the switch: auto(b=8, i8 kv) must match the
    # forced-megakernel engine on the same tokens
    forced = Engine.from_xalm(tiny_i8, matmul_impl="pallas", kv_dtype=jnp.int8,
                              progress=False, fused_step=True)
    b, steps = 8, 6
    tok0 = np.arange(3, 3 + b, dtype=np.int32)
    pos0 = np.zeros((b,), np.int32)
    out_a, _ = auto.decode_scan(tok0, pos0, auto.new_cache(b), steps)
    out_f, _ = forced.decode_scan(tok0, pos0, forced.new_cache(b), steps)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_f))
