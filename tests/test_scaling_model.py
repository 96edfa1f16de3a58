"""Pin the distributed decode path's collective structure.

docs/SCALING.md's projected multi-chip efficiency rests on an exact claim:
the tp decode step issues TWO all-reduces per layer (the row-parallel wo and
w2 partial sums) and nothing else on the hot path, while dp adds ZERO
per-layer collectives. If a refactor silently adds a collective (an
all-gather of the cache, a reshard of activations), the projection — and
the >=85% 2-host BASELINE leg it argues — is invalid. This test counts
collectives in the lowered HLO so that regression is loud.
"""

import re

import numpy as np
import pytest

import jax

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.parallel.mesh import make_mesh
from xalm_tpu.parallel.sharded_engine import ShardedEngine


@pytest.fixture(scope="module")
def tiny_xalm(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0
    return out


def _hlo_counts(lowered) -> dict:
    txt = lowered.as_text()  # StableHLO (region ops print as "op"(...))
    return {
        "all-reduce": txt.count("stablehlo.all_reduce"),
        "all-gather": txt.count("stablehlo.all_gather"),
        "all-to-all": txt.count("stablehlo.all_to_all"),
        "collective-permute": txt.count("stablehlo.collective_permute"),
    }


def test_tp_decode_step_collective_count(tiny_xalm):
    """One tp decode step: exactly 2 all-reduces (wo + w2 row-parallel
    psums) inside the layer-scan body; no all-to-alls, no permutes.
    The scan appears once in HLO, so the static count IS the per-layer
    count. Ref: docs/SCALING.md comm model; SURVEY.md section 2.4."""
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)
    cache = eng.new_cache(1)
    toks = np.zeros((1, 1), np.int32)
    pos = np.zeros((1,), np.int32)
    lowered = eng._fwd.lower(
        eng.params, toks, pos, cache, None, logits_mode="last"
    )
    counts = _hlo_counts(lowered)
    assert counts["all-reduce"] == 2, counts
    assert counts["all-to-all"] == 0 and counts["collective-permute"] == 0, counts
    # vocab-sharded logits come back shard-local: no gather on the step path
    assert counts["all-gather"] == 0, counts


def test_dp_decode_scan_has_no_extra_collectives(tiny_xalm):
    """dp=2, tp=2 decode scan: still only the 2 per-layer psums plus the
    distributed-argmax gathers (2 small (tp, B) gathers per step — vals and
    global indices, sharded_engine.sharded_argmax). dp itself contributes
    nothing: batch rows are independent."""
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)
    cache = eng.new_cache(2)
    toks = np.zeros((2,), np.int32)
    pos = np.zeros((2,), np.int32)
    lowered = eng._decode_scan.lower(
        eng.params, toks, pos, cache, 4, np.ones((2,), bool)
    )
    counts = _hlo_counts(lowered)
    assert counts["all-reduce"] == 2, counts
    assert counts["all-gather"] == 2, counts  # argmax winner pick only
    assert counts["all-to-all"] == 0 and counts["collective-permute"] == 0, counts


def test_comm_model_numbers_match_shapes(tiny_xalm):
    """The SCALING.md per-token comm-volume formula (2 * L * dim * 4 B
    all-reduced per token) matches the traced shapes: each psum moves one
    (B, 1, dim) f32 activation."""
    mesh = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    eng = ShardedEngine.from_xalm(tiny_xalm, mesh)
    cache = eng.new_cache(1)
    lowered = eng._fwd.lower(
        eng.params, np.zeros((1, 1), np.int32), np.zeros((1,), np.int32),
        cache, None, logits_mode="last",
    )
    txt = lowered.as_text()
    d = eng.cfg.dim
    shapes = []
    at = 0
    while True:
        at = txt.find("stablehlo.all_reduce", at)
        if at < 0:
            break
        # the op's result type follows its (multi-line) reduction region
        m = re.search(r"-> tensor<([0-9x]+)xf32>", txt[at : at + 4000])
        assert m is not None
        shapes.append(tuple(int(x) for x in m.group(1).split("x")))
        at += 1
    assert len(shapes) == 2, shapes
    for s in shapes:
        assert int(np.prod(s)) == d, (s, d)


def _topology_or_skip(name="v5e:2x4", dp=1, tp=2):
    from xalm_tpu.parallel.aot import topology_mesh

    try:
        return topology_mesh(name, dp=dp, tp=tp)
    except Exception as e:  # no libtpu compiler on this host
        pytest.skip(f"TPU topology compiler unavailable: {e}")


def _aot_cfg():
    from xalm_tpu.models.config import ModelConfig

    return ModelConfig(
        dim=2048, hidden_dim=5632, head_dim=128, n_layers=4, n_heads=16,
        n_kv_heads=8, vocab_size=32000, max_seq_len=1024, rope_theta=1e4,
        rotary_dim=128, norm_eps=1e-5, act="silu", tie_word_embeddings=False,
    )


def test_aot_tpu_collectives_decode():
    """Compile the tp=2 decode step for a REAL v5e topology (XLA:TPU
    compiler, zero chips) and pin the OPTIMIZED executable's collective
    structure: exactly the 2 per-layer psums survive the production
    pipeline, nothing else is inserted, and — measured, not assumed —
    the compiler keeps them SYNCHRONOUS (no all-reduce-start/done split):
    each psum's consumer is data-dependent, so there is no independent
    work to overlap. docs/SCALING.md's serial comm model cites this."""
    from xalm_tpu.parallel.aot import abstract_engine, collective_stats, compile_step

    mesh = _topology_or_skip()
    eng = abstract_engine(_aot_cfg(), mesh, matmul_impl="xla")
    stats = collective_stats(compile_step(eng))
    ar = stats["all-reduce"]
    assert ar["sync"] + ar["async"] == 2, stats
    for op in ("all-gather", "all-to-all", "collective-permute", "reduce-scatter"):
        assert stats[op] == {"sync": 0, "async": 0}, stats
    # the measured scheduling regime SCALING.md documents; if a future XLA
    # starts splitting these async, update SCALING.md's overlap paragraph
    assert ar == {"sync": 2, "async": 0}, stats


def test_aot_tpu_pallas_kernels_compile_multichip():
    """The production Pallas kernels (matmul_impl='pallas') lower to Mosaic
    custom calls AND compile inside the tp-sharded step for a real v5e
    topology — multi-chip Mosaic validation with no hardware attached
    (the virtual-CPU-mesh tests can't exercise Mosaic lowering at all)."""
    from xalm_tpu.parallel.aot import abstract_engine, compile_step

    mesh = _topology_or_skip()
    eng = abstract_engine(_aot_cfg(), mesh, matmul_impl="pallas")
    txt = compile_step(eng).as_text()
    assert txt.count("tpu_custom_call") > 0


def test_pp_decode_step_collective_count(tiny_xalm):
    """One pp decode step (pp=2 of a 2-layer model): exactly PP
    collective-permutes (the residual ring, one per sequencing tick) plus
    ONE all-reduce (the masked psum that broadcasts the final stage's
    residual for the logits); no gathers — the pp comm volume is
    PP x B x dim x 4 bytes per token, layer-count-independent
    (docs/SCALING.md pp section)."""
    from xalm_tpu.parallel.pipeline import PipelinedEngine, make_pp_mesh

    eng = PipelinedEngine.from_xalm(tiny_xalm, make_pp_mesh(2, devices=jax.devices()[:2]))
    cache = eng.new_cache(1)
    toks = np.zeros((1, 1), np.int32)
    pos = np.zeros((1,), np.int32)
    valid = np.ones((1, 1), bool)
    lowered = eng._fwd.lower(
        eng.params, toks, pos, cache, valid, logits_mode="last"
    )
    counts = _hlo_counts(lowered)
    assert counts["collective-permute"] == 2, counts  # PP ring hops
    assert counts["all-reduce"] == 1, counts  # final-stage broadcast
    assert counts["all-gather"] == 0 and counts["all-to-all"] == 0, counts
