"""Fused dequant+matmul kernel: pallas (interpret on CPU) vs XLA reference.

The two-backend-same-op comparison strategy of the reference test suite
(SURVEY.md §4 item 1: "run the same op on two backends / two dtypes and
compare").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xalm_tpu.models.params import QWeight
from xalm_tpu.ops.linear import qmatmul
from xalm_tpu.ops.pallas_matmul import (
    pallas_qmatmul,
    pallas_qmatmul_stacked_full,
    supported_weight_dtype,
)
from xalm_tpu import quant


def _mk_qweight(rng, l, d, n, tname):
    w = (rng.normal(size=(l, d, n)) * 0.03).astype(np.float32)
    q = quant.quantize(w.reshape(l * d, n), tname)
    values = jnp.asarray(q.values.reshape(l, d, n))
    scale = jnp.asarray(q.scale.reshape(l, d)) if q.scale is not None else None
    return QWeight(values, scale), w


@pytest.mark.parametrize("tname", ["f32", "bf16", "f8_e4m3", "f8_e5m2", "q8", "i8"])
def test_stacked_kernel_matches_xla(tname):
    rng = np.random.default_rng(0)
    l, d, n, m = 3, 256, 384, 4
    qw, w = _mk_qweight(rng, l, d, n, tname)
    x = jnp.asarray(rng.normal(size=(m, n)) * 0.5, jnp.float32)
    for layer in (0, 2):
        got = pallas_qmatmul_stacked_full(x, qw.values, qw.scale, jnp.int32(layer))
        lw = QWeight(qw.values[layer], None if qw.scale is None else qw.scale[layer])
        ref = qmatmul(x, lw, compute_dtype=jnp.float32, impl="xla")
        # kernel computes in bf16 (except f32 weights) -> bf16-level tolerance
        tol = 1e-5 if tname == "f32" else 2e-2
        err = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
        assert err < tol, f"{tname} layer {layer}: rel err {err}"


def test_unstacked_wrapper_and_leading_dims():
    rng = np.random.default_rng(1)
    qw, w = _mk_qweight(rng, 1, 128, 256, "i8")
    lw = QWeight(qw.values[0], qw.scale[0])
    x = jnp.asarray(rng.normal(size=(2, 3, 256)), jnp.float32)
    got = pallas_qmatmul(x, lw)
    ref = qmatmul(x, lw, impl="xla")
    assert got.shape == (2, 3, 128)
    rel = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
    assert rel < 2e-2


def test_uneven_d_blocks():
    """D not a multiple of the tile: final block must be masked correctly."""
    rng = np.random.default_rng(2)
    qw, w = _mk_qweight(rng, 1, 320, 256, "f8_e4m3")  # 320 = 2.5 * 128
    lw = QWeight(qw.values[0], None)
    x = jnp.asarray(rng.normal(size=(2, 256)), jnp.float32)
    got = pallas_qmatmul(x, lw)
    ref = qmatmul(x, lw, impl="xla")
    assert got.shape == (2, 320)
    assert float(jnp.abs(got - ref).max() / jnp.abs(ref).max()) < 2e-2


def test_supported_dtypes():
    assert supported_weight_dtype(jnp.int8)
    assert supported_weight_dtype(jnp.bfloat16)
    # fp8 routes to XLA's fused convert+dot — every Pallas VPU dequant
    # strategy measured slower on v5e (see supported_weight_dtype)
    assert not supported_weight_dtype(jnp.float8_e4m3fn)
    assert not supported_weight_dtype(jnp.uint8)


def test_engine_pallas_impl_matches_xla(tmp_path):
    """Whole-model check: engine with matmul_impl=pallas (interpret) vs xla."""
    from tests.make_tiny_model import make_tiny_model
    from xalm_tpu.convert import convert as cvt
    from xalm_tpu.runtime.engine import Engine

    hf = make_tiny_model(str(tmp_path / "hf"))
    out = str(tmp_path / "t.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f8_e4m3"]) == 0
    toks = [1, 259, 260, 10, 20, 300]
    eng_x = Engine.from_xalm(out, matmul_impl="xla")
    eng_p = Engine.from_xalm(out, matmul_impl="pallas")
    lx, _, _ = eng_x.prefill(toks, eng_x.new_cache(1), logits_mode="all")
    lp, _, _ = eng_p.prefill(toks, eng_p.new_cache(1), logits_mode="all")
    # prefill chunk of 6 tokens is small enough for the pallas path (M<=64)
    np.testing.assert_allclose(lp, lx, rtol=5e-2, atol=1e-2)
    assert np.all(np.argmax(lp, -1) == np.argmax(lx, -1))


@pytest.mark.parametrize("dt", [jnp.float8_e4m3fn, jnp.float8_e5m2])
def test_f8_bit_dequant_all_codes(dt):
    # every f8 bit pattern must decode exactly like the reference cast
    # (NaN/Inf payloads excluded — weights are finite by construction)
    from xalm_tpu.ops.pallas_matmul import _f8_to_bf16

    codes = np.arange(256, dtype=np.uint8)
    w = jax.lax.bitcast_convert_type(jnp.asarray(codes), dt)
    want = np.asarray(w.astype(jnp.float32))
    got = np.asarray(_f8_to_bf16(w).astype(jnp.float32))
    finite = np.isfinite(want)
    np.testing.assert_array_equal(got[finite], want[finite])


@pytest.mark.parametrize("dt", [jnp.float8_e4m3fn, jnp.float8_e5m2])
def test_pallas_matmul_f8_matches_xla(dt):
    key = jax.random.PRNGKey(3)
    w = (jax.random.normal(key, (2, 256, 128)) * 0.1).astype(dt)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 128), jnp.float32)
    from xalm_tpu.ops.pallas_matmul import pallas_qmatmul_stacked

    got = pallas_qmatmul_stacked(x, w, jnp.int32(1))
    want = x.astype(jnp.bfloat16) @ w[1].astype(jnp.bfloat16).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32), rtol=2e-2, atol=2e-3)


def test_a8_prefill_close_to_reference(tmp_path):
    """W8A8 prefill (int8 activations, s8xs8 MXU path) stays close to the
    bf16-activation path: per-token activation quant adds ~1% noise."""
    import numpy as np

    from tests.make_tiny_model import make_tiny_model
    from xalm_tpu.convert import convert as cvt
    from xalm_tpu.runtime.engine import Engine

    hf = make_tiny_model(str(tmp_path / "hf"))
    out = str(tmp_path / "tiny_i8.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "i8"]) == 0
    ref = Engine.from_xalm(out, matmul_impl="pallas", progress=False)
    a8 = Engine(ref.cfg, ref.params, ref.tokenizer, matmul_impl="pallas", a8_prefill=True)
    toks = np.random.default_rng(4).integers(3, 350, size=32).tolist()
    lr, _, _ = ref.prefill(toks, ref.new_cache(1), logits_mode="last")
    la, _, _ = a8.prefill(toks, a8.new_cache(1), logits_mode="last")
    lr, la = np.asarray(lr), np.asarray(la)
    # logits order must be essentially preserved
    assert np.abs(lr - la).max() < 0.35
    assert lr.argmax() == la.argmax()


def test_wcls_i8_recode_preserves_logits(tmp_path):
    """Engine(wcls_i8=True): the classifier head streams i8 per-row codes;
    greedy decisions and logit magnitudes survive the recode, and the
    active-bytes model reflects the halved stream."""
    from tests.make_tiny_model import make_tiny_model
    from xalm_tpu.convert import convert as cvt
    from xalm_tpu.runtime.engine import Engine

    hf = make_tiny_model(str(tmp_path / "hf"))
    out = str(tmp_path / "tiny_i8.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "i8"]) == 0
    ref = Engine.from_xalm(out, progress=False)
    q = Engine(ref.cfg, ref.params, ref.tokenizer, wcls_i8=True)
    assert q.params.wcls.values.dtype == jnp.int8
    assert q.params.wcls.scale is not None
    # embed stays float: the lookup table must not be quantized
    assert q.params.embed.values.dtype != jnp.int8
    toks = np.random.default_rng(11).integers(3, 350, size=24).tolist()
    lr, _, _ = ref.prefill(toks, ref.new_cache(1), logits_mode="last")
    lq, _, _ = q.prefill(toks, q.new_cache(1), logits_mode="last")
    lr, lq = np.asarray(lr, np.float32), np.asarray(lq, np.float32)
    assert lr.argmax() == lq.argmax()
    # i8 per-row absmax: per-logit error ~ ||x|| * scale/2 — tight at tiny scale
    assert np.abs(lr - lq).max() < 0.05 * max(1.0, np.abs(lr).max())
    assert q._per_token_weight_bytes < ref._per_token_weight_bytes
