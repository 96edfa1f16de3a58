"""Fused decode-attention kernel (interpret mode) vs the jnp reference path.

Covers the in-place ring write, kv_len masking, sink re-rotation through
multiple cache wraps, and the inactive-slot sentinel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

WINDOW = 16


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    fused = Engine.from_xalm(out, context=WINDOW, matmul_impl="pallas", kv_dtype=jnp.float32)
    ref = Engine.from_xalm(out, context=WINDOW, matmul_impl="xla", kv_dtype=jnp.float32)
    return fused, ref


def test_fused_decode_matches_reference_through_wraps(engines):
    fused, ref = engines
    rng = np.random.default_rng(0)
    toks = rng.integers(3, 350, size=3 * WINDOW).tolist()
    cf, cr = fused.new_cache(1), ref.new_cache(1)
    for i, t in enumerate(toks):
        lf, cf = fused.decode(np.array([t]), np.array([i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=2e-2, atol=2e-3,
            err_msg=f"pos {i}",
        )
        assert np.argmax(np.asarray(lf)) == np.argmax(np.asarray(lr)), f"pos {i}"
    # cache contents identical too (ring layout + rotated sinks)
    np.testing.assert_allclose(
        np.asarray(cf.k, np.float32), np.asarray(cr.k, np.float32), rtol=2e-2, atol=2e-3
    )


def test_fused_batch_with_inactive_slot(engines):
    fused, ref = engines
    rng = np.random.default_rng(1)
    toks = rng.integers(3, 350, size=6).tolist()
    # batch of 2: slot 1 inactive (valid=False) the whole time
    cache = fused.new_cache(2)
    for i, t in enumerate(toks):
        valid = jnp.asarray(np.array([[True], [False]]))
        logits, cache = fused.step(
            np.array([[t], [0]], np.int32), np.array([i, 0], np.int32), cache,
            valid, logits_mode="last",
        )
    # slot 1's *logical* rows must remain zeros: the dropped-write sentinel
    # (kv_pos == logical window) lands in a physical padding row beyond the
    # window, which no attention ever reads
    assert float(jnp.abs(cache.k[:, 1, :, :WINDOW]).max()) == 0.0
    # slot 0 equals a solo run
    c2 = fused.new_cache(1)
    for i, t in enumerate(toks):
        l2, c2 = fused.decode(np.array([t]), np.array([i]), c2)
    np.testing.assert_allclose(
        np.asarray(logits)[0], np.asarray(l2)[0], rtol=1e-4, atol=1e-5
    )


def test_flash_multiblock_matches_oracle():
    """nsb > 1: running-softmax accumulation across sequence blocks, with
    kv_len landing inside / at / across block boundaries (s=1024, sb=512)."""
    from xalm_tpu.ops.pallas_attention import fused_decode_attention, rope_cos_sin_plus1

    s, hd, kh, g, b = 1024, 128, 2, 2, 2
    h = kh * g
    rng = np.random.default_rng(3)
    ck = jnp.asarray(rng.standard_normal((1, b, kh, s, hd)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((1, b, kh, s, hd)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
    knew = jnp.asarray(rng.standard_normal((b, kh, hd)), jnp.float32)
    vnew = jnp.asarray(rng.standard_normal((b, kh, hd)), jnp.float32)
    freqs = np.zeros(hd // 2, np.float32)
    cexp, sexp = rope_cos_sin_plus1(freqs)
    layer = jnp.int32(0)
    rot = jnp.zeros((b,), jnp.int32)

    for kvl_a, kvl_b in [(3, 100), (512, 513), (700, 1024), (511, 1)]:
        kv_pos = jnp.asarray([kvl_a - 1, kvl_b - 1], jnp.int32)
        kv_len = jnp.asarray([kvl_a, kvl_b], jnp.int32)
        out, ck2, cv2 = fused_decode_attention(
            q, knew, vnew, ck, cv, layer, kv_pos, kv_len, rot,
            jnp.asarray(cexp), jnp.asarray(sexp),
        )
        out = np.asarray(out).reshape(b, kh, g, hd)
        k2 = np.asarray(ck2[0])
        v2 = np.asarray(cv2[0])
        for bi, kvl in enumerate([kvl_a, kvl_b]):
            # oracle over the post-insert cache
            for j in range(kh):
                for gi in range(g):
                    qv = np.asarray(q)[bi, j * g + gi] / np.sqrt(hd)
                    sc = k2[bi, j, :kvl] @ qv
                    w = np.exp(sc - sc.max())
                    w /= w.sum()
                    want = w @ v2[bi, j, :kvl]
                    np.testing.assert_allclose(
                        out[bi, j, gi], want, rtol=1e-4, atol=1e-4,
                        err_msg=f"kvl={kvl} head={j} g={gi}",
                    )
            # the insert landed
            np.testing.assert_allclose(
                k2[bi, :, kvl - 1], np.asarray(knew)[bi], rtol=1e-6
            )


def test_fused_with_non_multiple_of_8_window(tmp_path):
    """-T 20: the physical cache pads to 32 rows; logits must match the XLA
    path even once kv_len enters the final partial block (regression for the
    flash kernel silently dropping the last s % 8 rows)."""
    hf = make_tiny_model(str(tmp_path / "hf"))
    out = str(tmp_path / "t.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    fused = Engine.from_xalm(out, context=20, matmul_impl="pallas", kv_dtype=jnp.float32, progress=False)
    ref = Engine.from_xalm(out, context=20, matmul_impl="xla", kv_dtype=jnp.float32, progress=False)
    rng = np.random.default_rng(5)
    toks = rng.integers(3, 350, size=30).tolist()  # through the wrap
    cf, cr = fused.new_cache(1), ref.new_cache(1)
    assert cf.k.shape[3] == 32  # padded physical window (32-row int8 tile)
    for i, t in enumerate(toks):
        lf, cf = fused.decode(np.array([t]), np.array([i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=2e-2, atol=2e-3, err_msg=f"pos {i}"
        )


def test_fused_prefill_matches_reference(engines):
    """Chunked (T>1) prefill through the flash prefill kernel + DUS writes
    must match the XLA einsum path: logits AND the cache contents."""
    fused, ref = engines
    rng = np.random.default_rng(7)
    toks = rng.integers(3, 350, size=WINDOW).tolist()
    lf, cf, pf = fused.prefill(toks, fused.new_cache(1), logits_mode="last")
    lr, cr, pr = ref.prefill(toks, ref.new_cache(1), logits_mode="last")
    assert pf == pr
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cf.k), np.asarray(cr.k), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cf.v), np.asarray(cr.v), rtol=2e-2, atol=2e-3)


def test_fused_prefill_then_decode(engines):
    """Prefill via the fused chunk path, then decode on top of that cache."""
    fused, ref = engines
    rng = np.random.default_rng(8)
    toks = rng.integers(3, 350, size=WINDOW - 4).tolist()
    _, cf, pos = fused.prefill(toks, fused.new_cache(1), logits_mode="none")
    _, cr, _ = ref.prefill(toks, ref.new_cache(1), logits_mode="none")
    for i in range(6):  # crosses the ring boundary at pos 16
        t = 5 + i
        lf, cf = fused.decode(np.array([t]), np.array([pos + i]), cf)
        lr, cr = ref.decode(np.array([t]), np.array([pos + i]), cr)
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lr), rtol=2e-2, atol=2e-3, err_msg=f"step {i}"
        )


def test_fused_prefill_masked_batch(engines):
    """A batch where one row prefills a chunk while another row is inactive
    (valid=False): the inactive row's cache must be untouched, even when its
    position sits near the ring boundary."""
    fused, ref = engines
    rng = np.random.default_rng(9)
    b, t = 2, 8
    cf = fused.new_cache(b)
    cr = ref.new_cache(b)
    # row 1: pretend it's deep into decode (wrapped position)
    marker = np.asarray(cf.k).copy()
    toks = np.tile(rng.integers(3, 350, size=(1, t)), (b, 1)).astype(np.int32)
    valid = np.zeros((b, t), bool)
    valid[0] = True
    pos = np.array([0, WINDOW + 3], np.int32)  # row 1 wrapped
    lf, cf = fused.step(toks, pos, cf, jnp.asarray(valid), logits_mode="last")
    lr, cr = ref.step(toks, pos, cr, jnp.asarray(valid), logits_mode="last")
    np.testing.assert_allclose(
        np.asarray(lf)[0], np.asarray(lr)[0], rtol=2e-2, atol=2e-3
    )
    # inactive row's cache stripes identical to before
    np.testing.assert_array_equal(np.asarray(cf.k)[:, 1], marker[:, 1])
