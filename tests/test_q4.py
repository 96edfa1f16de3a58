"""Packed-4-bit body (q4): packing, dequant, gates, and the megakernel path.

The reference ships home-grown 4-bit interchange formats (qi3/qi4,
reference convert.py:368-651) that its runtime can't execute; here q4 is a
first-class runtime format: packed nibbles stream through the decode
megakernel (in-VMEM unpack + s8xs8 group dots, ops/fused_decode.py) and
dequantize through XLA everywhere else."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xalm_tpu.models.params import (
    QWeight,
    _pack_q4_codes,
    recode_params_q4,
    recode_qweight_q4,
    unpack_q4,
)
from xalm_tpu.runtime.engine import Engine
from xalm_tpu.utils.synthetic import synthetic_params


def test_pack_unpack_roundtrip_exact():
    rng = np.random.default_rng(0)
    codes = rng.integers(-8, 8, size=(6, 512)).astype(np.int32)
    packed = _pack_q4_codes(jnp.asarray(codes))
    assert packed.shape == (6, 256) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpack_q4(packed)), codes)


def test_recode_error_bound_and_dequant():
    """Each dequantized value sits within scale/2 of the source (symmetric
    absmax/7 per (row, group) grid)."""
    rng = np.random.default_rng(1)
    w = rng.standard_normal((2, 128, 512)).astype(np.float32)
    qw = recode_qweight_q4(QWeight(jnp.asarray(w)), group=128)
    assert qw.q4group == 128
    assert qw.values.shape == (2, 128, 256)
    assert qw.scale.shape == (2, 128, 4)
    deq = np.asarray(qw.astype_dequant(jnp.float32))
    bound = np.repeat(np.asarray(qw.scale), 128, axis=-1) * 0.5 + 1e-7
    assert (np.abs(deq - w) <= bound).all()


def test_recode_group_validation():
    w = QWeight(jnp.zeros((4, 512), jnp.float32))
    with pytest.raises(ValueError):
        recode_qweight_q4(w, group=512)  # does not divide K/2
    with pytest.raises(ValueError):
        recode_qweight_q4(w, group=64)  # not a 128-multiple


def _tiny_cfg():
    import dataclasses

    from xalm_tpu.utils.synthetic import MISTRAL_7B

    # smallest dims whose halves stay 128-aligned for group=128
    return dataclasses.replace(
        MISTRAL_7B, dim=256, hidden_dim=512, head_dim=64, rotary_dim=64,
        n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=2048, max_seq_len=256,
    )


@pytest.fixture(scope="module")
def q4_engines():
    cfg = _tiny_cfg()
    params = synthetic_params(cfg, weight_dtype=jnp.int8)
    pq4 = recode_params_q4(params, group=128)
    mk = Engine(cfg, pq4, None, matmul_impl="pallas", kv_dtype=jnp.float32,
                wcls_i8=True, a8_decode=True)
    xla = Engine(cfg, pq4, None, matmul_impl="pallas", kv_dtype=jnp.float32,
                 wcls_i8=True, a8_decode=True, fused_step=False)
    return mk, xla


def test_q4_gate_requires_a8(q4_engines):
    from xalm_tpu.ops.fused_decode import fused_step_supported

    mk, _ = q4_engines
    cache = mk.new_cache(1)
    assert fused_step_supported(mk.cfg, mk.params, cache.k, 1, 1, a8=True)
    assert not fused_step_supported(mk.cfg, mk.params, cache.k, 1, 1, a8=False)
    assert mk.decode_path(1) == "megakernel"
    no_a8 = Engine(mk.cfg, mk.params, None, matmul_impl="pallas",
                   kv_dtype=jnp.float32, wcls_i8=True)
    assert no_a8.decode_path(1) == "xla"


def test_q4_megakernel_matches_xla(q4_engines):
    """q4 megakernel (s8 activations) vs the XLA dequant path (f32
    activations) on IDENTICAL q4 params: the weight grid cancels, leaving
    only activation-quantization noise — logits close, greedy decisions
    identical from cache-empty through several steps."""
    mk, xla = q4_engines
    cm, cx = mk.new_cache(1), xla.new_cache(1)
    rng = np.random.default_rng(2)
    for i, t in enumerate(rng.integers(3, 2000, size=6)):
        lm, cm = mk.decode(np.array([t]), np.array([i]), cm)
        lx, cx = xla.decode(np.array([t]), np.array([i]), cx)
        lm, lx = np.asarray(lm, np.float32), np.asarray(lx, np.float32)
        assert np.isfinite(lm).all()
        assert np.abs(lm - lx).max() < 0.08 * max(1.0, np.abs(lx).max())
        assert lm.argmax() == lx.argmax()


def test_q4_generate_matches_xla(q4_engines):
    mk, xla = q4_engines
    prompt = np.random.default_rng(5).integers(3, 2000, size=8).tolist()
    gm, _ = mk.generate(prompt, 8, stop_on_eos=False)
    gx, _ = xla.generate(prompt, 8, stop_on_eos=False)
    assert gm[:4] == gx[:4]


def test_q4_batch_rows(q4_engines):
    """b>1 q4 decode: each row matches its own b=1 run (megakernel rows
    carry independent kv state)."""
    mk, _ = q4_engines
    toks = np.array([7, 11, 13, 17])
    cb = mk.new_cache(4)
    lb, cb = mk.decode(toks, np.zeros(4, np.int32), cb)
    lb = np.asarray(lb, np.float32)
    for bi in range(4):
        l1, _ = mk.decode(toks[bi : bi + 1], np.array([0]), mk.new_cache(1))
        np.testing.assert_allclose(lb[bi], np.asarray(l1)[0], rtol=2e-4, atol=2e-4)


def test_q4_from_xalm_load_time_recode(tmp_path):
    """`Engine.from_xalm(..., q4_group=...)` — the user-pipeline entry
    (harness --q4): HF dir -> converter -> container -> load-time recode;
    implies a8 and greedy-matches the i8 load of the SAME container."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from make_tiny_model import make_tiny_model

    from xalm_tpu.convert import convert as cvt

    # default fixture dims (64) can't hold a 128-group: widen to 256
    hf = make_tiny_model(
        str(tmp_path / "hf"),
        config_overrides={
            "hidden_size": 256, "intermediate_size": 512,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 64,
        },
    )
    out = str(tmp_path / "m.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "i8"]) == 0
    q4 = Engine.from_xalm(out, matmul_impl="pallas", kv_dtype=jnp.float32,
                          wcls_i8=True, q4_group=128, progress=False)
    assert q4.params.layers.wqkv.q4group == 128
    assert q4.a8_decode  # implied
    assert q4.decode_path(1) == "megakernel"
    # identical to an explicit in-memory recode of the same container
    i8 = Engine.from_xalm(out, matmul_impl="pallas", kv_dtype=jnp.float32,
                          wcls_i8=True, progress=False)
    manual = Engine(i8.cfg, recode_params_q4(i8.params, 128), i8.tokenizer,
                    matmul_impl="pallas", kv_dtype=jnp.float32, wcls_i8=True,
                    a8_decode=True)
    prompt = np.random.default_rng(9).integers(3, 300, size=6).tolist()
    gq, _ = q4.generate(prompt, 6, stop_on_eos=False)
    gm, _ = manual.generate(prompt, 6, stop_on_eos=False)
    assert gq == gm


def test_q4_native_container_roundtrip(tmp_path):
    """--type q4 container: converter packs, loader reconstructs the
    grouped QWeight, the megakernel consumes it, and the quantized values
    round-trip exactly through the container."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from make_tiny_model import make_tiny_model

    from xalm_tpu import quant
    from xalm_tpu.convert import convert as cvt
    from xalm_tpu.io.container import XalmFile

    hf = make_tiny_model(
        str(tmp_path / "hf"),
        config_overrides={
            "hidden_size": 256, "intermediate_size": 512,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 64,
        },
    )
    out = str(tmp_path / "m.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "q4",
                     "--q4-group", "128"]) == 0
    xf = XalmFile(out)
    # body tensor packed at K/2 with a .scale4 partner; head boosted
    assert tuple(xf.tensors["l.0.attn.q.weight"].shape) == (256, 128)
    assert "l.0.attn.q.weight.scale4" in xf.tensors
    assert xf.tensors["output.weight"].dtype.name in ("f16", "bf16")
    # exact roundtrip of one packed tensor through quantize/dequantize
    packed = xf.load("l.0.attn.q.weight")
    sc = xf.load("l.0.attn.q.weight.scale4")
    deq = quant.dequantize_q4_rows(packed, sc)
    repacked, sc2 = quant.quantize_q4_rows(deq, 128)
    np.testing.assert_array_equal(repacked, packed)
    xf.close()

    eng = Engine.from_xalm(out, matmul_impl="pallas", kv_dtype=jnp.float32,
                           wcls_i8=True, a8_decode=True, progress=False)
    assert eng.params.layers.wqkv.q4group == 128
    assert eng.decode_path(1) == "megakernel"
    logits, _ = eng.decode(np.array([7]), np.array([0]), eng.new_cache(1))
    assert np.isfinite(np.asarray(logits)).all()


def test_q4_stacked_kernel_matches_dequant():
    """The per-layer stacked kernel's q4 path (interpret mode on CPU):
    in-VMEM unpack + grouped s8 dots vs an explicit quantize-activations /
    dequantize-weights reference — near-exact (same arithmetic, different
    summation order)."""
    from xalm_tpu.ops.pallas_matmul import pallas_qmatmul_stacked

    rng = np.random.default_rng(3)
    L, D, K, G = 3, 256, 512, 128
    w = rng.standard_normal((L, D, K)).astype(np.float32) * 0.05
    qw = recode_qweight_q4(QWeight(jnp.asarray(w)), group=G)
    x = rng.standard_normal((1, K)).astype(np.float32)
    for layer in (0, 2):
        y = np.asarray(
            pallas_qmatmul_stacked(
                jnp.asarray(x), qw.values, jnp.int32(layer),
                scale=qw.scale, q4_group=G,
            )
        )
        # reference: quantize x exactly like the wrapper, dequantized dot
        sx = np.abs(x).max(-1, keepdims=True) / 127.0
        xq = np.clip(np.round(x / sx), -127, 127)
        deq = np.asarray(qw.astype_dequant(jnp.float32))[layer]
        want = (xq @ deq.T) * sx
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-4)


def test_q4_perlayer_decode_matches_megakernel(q4_engines):
    """q4 off the megakernel now streams packed tiles through the
    per-layer kernel (same s8 x s8 grouped dots) — logits match the
    megakernel tightly and the path is surfaced."""
    mk, _ = q4_engines
    pl_eng = Engine(mk.cfg, mk.params, None, matmul_impl="pallas",
                    kv_dtype=jnp.float32, wcls_i8=True, a8_decode=True,
                    fused_step=False)
    assert pl_eng.decode_path(1) == "perlayer"
    # without the a8 opt-in the packed path stays off (XLA dequant keeps
    # full activation precision)
    no_a8 = Engine(mk.cfg, mk.params, None, matmul_impl="pallas",
                   kv_dtype=jnp.float32, wcls_i8=True, fused_step=False)
    assert no_a8.decode_path(1) == "xla"
    cm, cp = mk.new_cache(1), pl_eng.new_cache(1)
    rng = np.random.default_rng(11)
    for i, t in enumerate(rng.integers(3, 2000, size=5)):
        lm, cm = mk.decode(np.array([t]), np.array([i]), cm)
        lp_, cp = pl_eng.decode(np.array([t]), np.array([i]), cp)
        lm, lp_ = np.asarray(lm, np.float32), np.asarray(lp_, np.float32)
        assert np.abs(lm - lp_).max() < 0.02 * max(1.0, np.abs(lm).max())
        assert lm.argmax() == lp_.argmax()


def _tiny_moe_cfg():
    import dataclasses

    return dataclasses.replace(_tiny_cfg(), n_experts=4, n_experts_active=2)


def test_q4_expert_recode_shapes_and_bound():
    cfg = _tiny_moe_cfg()
    params = synthetic_params(cfg, weight_dtype=jnp.int8)
    pq4 = recode_params_q4(params, group=128)
    lp = pq4.layers
    L, E, h2, d = params.layers.w13e.values.shape
    assert lp.w13e.values.shape == (L, E, h2, d // 2)
    assert lp.w13e.scale.shape == (L, E, h2, d // 128)
    assert lp.w13e.q4group == 128 and lp.w2e.q4group == 128
    # dequant error bound: scale/2 per element vs the i8-dequant source
    src = np.asarray(params.layers.w2e.astype_dequant(jnp.float32))
    deq = np.asarray(lp.w2e.astype_dequant(jnp.float32))
    bound = np.repeat(np.asarray(lp.w2e.scale), 128, axis=-1) * 0.5 + 1e-7
    assert (np.abs(deq - src) <= bound).all()


def test_q4_moe_gathered_matches_dense():
    """Gathered sparse q4 expert decode (packed tiles + s8 dots) vs the
    dense-masked XLA dequant path on IDENTICAL q4 params: the weight grid
    cancels, leaving activation-quantization noise."""
    cfg = _tiny_moe_cfg()
    params = synthetic_params(cfg, weight_dtype=jnp.int8)
    pq4 = recode_params_q4(params, group=128)
    sparse = Engine(cfg, pq4, None, matmul_impl="pallas",
                    kv_dtype=jnp.float32, wcls_i8=True, a8_decode=True)
    dense = Engine(cfg, pq4, None, matmul_impl="xla",
                   kv_dtype=jnp.float32, wcls_i8=True)
    assert sparse.decode_path(1) == "perlayer"
    cs, cd = sparse.new_cache(1), dense.new_cache(1)
    rng = np.random.default_rng(13)
    for i, t in enumerate(rng.integers(3, 2000, size=6)):
        ls, cs = sparse.decode(np.array([t]), np.array([i]), cs)
        ld, cd = dense.decode(np.array([t]), np.array([i]), cd)
        ls, ld = np.asarray(ls, np.float32), np.asarray(ld, np.float32)
        assert np.isfinite(ls).all()
        assert np.abs(ls - ld).max() < 0.08 * max(1.0, np.abs(ld).max())
        assert ls.argmax() == ld.argmax()
    prompt = rng.integers(3, 2000, size=6).tolist()
    want, _ = dense.generate(prompt, 6, stop_on_eos=False)
    got, _ = sparse.generate(prompt, 6, stop_on_eos=False)
    assert got[:3] == want[:3]


def test_q4_unpack_modes_agree(monkeypatch):
    """The bf16 floor-algebra unpack (default) and the i32 shift pipeline
    must produce IDENTICAL nibbles for every possible packed byte — both
    sides are exact integer arithmetic in their respective domains."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    b = jnp.arange(-128, 128, dtype=jnp.int32).astype(jnp.int8)
    # i32 reference
    w = b.astype(jnp.int32)
    hi_ref = np.asarray((w >> 4).astype(jnp.int8))
    lo_ref = np.asarray(((w << 28) >> 28).astype(jnp.int8))
    # bf16 floor algebra
    wf = b.astype(jnp.bfloat16)
    hi_f = jnp.floor(wf * (1.0 / 16.0))
    u = wf - hi_f * 16.0
    lo_f = jnp.where(u >= 8.0, u - 16.0, u)
    np.testing.assert_array_equal(np.asarray(hi_f.astype(jnp.int8)), hi_ref)
    np.testing.assert_array_equal(np.asarray(lo_f.astype(jnp.int8)), lo_ref)
