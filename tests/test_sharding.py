"""Tensor/data-parallel correctness on the 8-device virtual CPU mesh.

SURVEY.md §4: "multi-host tests via jax local mesh simulation
(XLA_FLAGS=--xla_force_host_platform_device_count=N) before real pod runs."
The gate: sharded logits == single-device logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.parallel.mesh import make_mesh
from xalm_tpu.parallel.sharded_engine import ShardedEngine
from xalm_tpu.runtime.engine import Engine

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262]


@pytest.fixture(scope="module")
def tiny_xalm(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    return out


@pytest.fixture(scope="module")
def ref_engine(tiny_xalm):
    return Engine.from_xalm(tiny_xalm)


def test_mesh_construction():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(dp=1)
    assert mesh.shape["tp"] == 8
    with pytest.raises(ValueError):
        make_mesh(dp=3)


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (4, 2), (8, 1)])
def test_sharded_prefill_matches_single(tiny_xalm, ref_engine, dp, tp):
    mesh = make_mesh(dp=dp, tp=tp)
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)
    ref_logits, _, _ = ref_engine.prefill(TOKENS, ref_engine.new_cache(1), logits_mode="all")

    b = dp  # one sequence per dp shard
    cache = eng.new_cache(b)
    toks = np.tile(np.array([TOKENS], np.int32), (b, 1))
    pos = np.zeros((b,), np.int32)
    logits, cache = eng.step(toks, pos, cache, logits_mode="all")
    got = np.asarray(logits)
    assert got.shape == (b, len(TOKENS), eng.cfg.vocab_size)
    for i in range(b):
        np.testing.assert_allclose(got[i], ref_logits, rtol=2e-4, atol=2e-5)


def test_sharded_decode_scan_matches_single(tiny_xalm, ref_engine):
    mesh = make_mesh(dp=2, tp=4)
    # tp=4 > n_kv_heads=2 must be rejected
    with pytest.raises(ValueError, match="kv_heads"):
        ShardedEngine.from_xalm(tiny_xalm, mesh)

    mesh = make_mesh(dp=4, tp=2)
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)

    # single-device greedy reference
    ref_out, _ = ref_engine.generate(TOKENS[:5], 6, stop_on_eos=False)

    b = 4
    cache = eng.new_cache(b)
    toks = np.tile(np.array([TOKENS[:5]], np.int32), (b, 1))
    pos = np.zeros((b,), np.int32)
    logits, cache = eng.step(toks, pos, cache, logits_mode="last")
    tok0 = np.argmax(np.asarray(logits), -1).astype(np.int32)
    out, cache = eng.decode_scan(tok0, np.full((b,), 5, np.int32), cache, 5)
    got = np.asarray(out)
    for i in range(b):
        assert [int(tok0[i])] + got[i].tolist() == ref_out


def test_sharded_ring_wrap(tiny_xalm):
    """Wrapped decode on the mesh: sink rotation + ring must work with
    kv-head-sharded caches."""
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh, context=16)
    ref = Engine.from_xalm(tiny_xalm, context=16)

    rng = np.random.default_rng(0)
    toks = rng.integers(3, 350, size=40).tolist()
    c_s, c_r = eng.new_cache(1), ref.new_cache(1)
    for i, t in enumerate(toks):
        ls, c_s = eng.decode(np.array([t]), np.array([i]), c_s)
        lr, c_r = ref.decode(np.array([t]), np.array([i]), c_r)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lr), rtol=2e-4, atol=2e-5)


def test_dp_batch_padding(tiny_xalm):
    """A batch smaller than dp is padded transparently (valid-masked rows /
    padding cache slots); results must match the single-device engine."""
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)
    ref = Engine.from_xalm(tiny_xalm)

    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 350, size=6).tolist()
    want, _ = ref.generate(prompt, 7, stop_on_eos=False)
    got, _ = eng.generate(prompt, 7, stop_on_eos=False)  # batch 1 on dp=2
    assert got == want


def test_sharded_wrapped_perplexity_matches_single(tiny_xalm):
    """Sharded perplexity must use the scanned teacher-forced path (one
    dispatch per segment) and match the single-device number on a document
    longer than the window (ring + sink active in the tail)."""
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh, context=16)
    ref = Engine.from_xalm(tiny_xalm, context=16)
    assert eng._ppl_scan is not None  # parity: the fast path exists
    toks = np.random.default_rng(7).integers(3, 350, size=48).tolist()
    p_ref, e_ref, n_ref = ref.perplexity(toks)
    p_sh, e_sh, n_sh = eng.perplexity(toks)
    assert n_sh == n_ref == 47
    assert p_sh == pytest.approx(p_ref, rel=1e-3)
    assert e_sh == pytest.approx(e_ref, rel=1e-2)


def test_sharded_scanned_prefill_chunks(tmp_path_factory):
    """>= 2 full 512-token chunks route through the sharded scanned
    _prefill_chunks (one dispatch for the chunk block); logits must match
    the single-device engine."""
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    prompt = np.random.default_rng(11).integers(3, 350, size=1100).tolist()
    ref = Engine.from_xalm(out, context=2048)
    sh = ShardedEngine.from_xalm(out, make_mesh(dp=2, tp=2), context=2048)
    assert sh._prefill_chunks is not None
    lr, _, pr = ref.prefill(prompt, ref.new_cache(1), logits_mode="last")
    ls, _, ps = sh.prefill(prompt, sh.new_cache(1), logits_mode="last")
    assert pr == ps == 1100
    np.testing.assert_allclose(np.asarray(lr), np.asarray(ls)[:1], rtol=2e-4, atol=2e-4)


def test_sharded_a8_prefill(tmp_path_factory):
    """ShardedEngine(a8_prefill=True) runs the W8A8 kernel path under
    shard_map and stays close to the bf16-activation sharded engine."""
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny_i8.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "i8"]) == 0
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    ref = ShardedEngine.from_xalm(out, mesh, matmul_impl="pallas")
    a8 = ShardedEngine.from_xalm(out, mesh, matmul_impl="pallas", a8_prefill=True)
    toks = np.random.default_rng(4).integers(3, 350, size=32).tolist()
    lr, _, _ = ref.prefill(toks, ref.new_cache(1), logits_mode="last")
    la, _, _ = a8.prefill(toks, a8.new_cache(1), logits_mode="last")
    lr, la = np.asarray(lr)[0], np.asarray(la)[0]
    assert np.abs(lr - la).max() < 0.35
    assert lr.argmax() == la.argmax()


def test_sharded_engine_long_prefill(tmp_path_factory):
    """Engine.prefill's scanned fast path must not break the sharded
    subclass (which builds its own jitted steps): a multi-chunk prompt
    through ShardedEngine matches the plain Engine."""
    import numpy as np

    from tests.make_tiny_model import make_tiny_model
    from xalm_tpu.convert import convert as cvt
    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine
    from xalm_tpu.runtime.engine import Engine

    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    prompt = np.random.default_rng(3).integers(3, 350, size=40).tolist()
    ref = Engine.from_xalm(out, context=64)
    sh = ShardedEngine.from_xalm(out, make_mesh(dp=2, tp=2), context=64)
    lr, _, _ = ref.prefill(prompt, ref.new_cache(1), logits_mode="last")
    ls, _, _ = sh.prefill(prompt, sh.new_cache(1), logits_mode="last")
    np.testing.assert_allclose(np.asarray(lr), np.asarray(ls)[:1], rtol=2e-4, atol=2e-4)


def test_sharded_sample_scan(tiny_xalm):
    """Stochastic decode under shard_map: reproducible per seed, valid
    tokens, and identical prompts on different dp rows decorrelate (the
    dp-axis key fold)."""
    import jax

    mesh = make_mesh(dp=2, tp=2)
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)
    b = 2
    toks = np.array([TOKENS[0], TOKENS[0]], np.int32)
    pos = np.zeros((b,), np.int32)
    key = jax.random.PRNGKey(11)

    def run():
        cache = eng.new_cache(b)
        # hydrate one token so the scan has context
        _, cache = eng.step(toks[:, None], pos, cache, logits_mode="none")
        out, _ = eng._sample_scan(
            eng.params, toks, pos + 1, cache, key,
            n_steps=12, temperature=1.2, top_k=0, top_p=1.0,
        )
        return np.asarray(out)

    a = run()
    bb = run()
    np.testing.assert_array_equal(a, bb)  # same seed -> same draws
    assert a.shape == (b, 12)
    assert (a >= 0).all() and (a < eng.cfg.vocab_size).all()
    # same prompt on both dp rows: rows must not be identical at temp 1.2
    assert not np.array_equal(a[0], a[1])


def test_sharded_generate_sampling(tiny_xalm):
    mesh = make_mesh(dp=1, tp=2)
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)
    out, _ = eng.generate([1, 259, 260], 8, stop_on_eos=False,
                          temperature=0.9, seed=5)
    out2, _ = eng.generate([1, 259, 260], 8, stop_on_eos=False,
                           temperature=0.9, seed=5)
    assert out == out2 and len(out) == 8
