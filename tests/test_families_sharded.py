"""Every model family under tensor parallelism: tp=2 prefill logits must
match the single-device engine (family deltas — post-norms, softcaps,
qk-norms, biases, fused-storage splits — all ride the shard_map path)."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.runtime.engine import Engine

TOKENS = [1, 259, 260, 10, 20, 300, 5, 77, 261, 262]


def _overrides(name):
    if name == "mistral":
        return {}
    if name == "gemma":
        from tests.test_gemma import GEMMA_OVERRIDES

        ov = dict(GEMMA_OVERRIDES)
        ov["head_dim"] = 16  # tp=2 needs n_kv_heads divisible; keep defaults
        return ov
    if name == "gemma2":
        from tests.test_gemma2 import GEMMA2_OVERRIDES

        return dict(GEMMA2_OVERRIDES)
    if name == "qwen2":
        from tests.test_qwen2 import QWEN2_OVERRIDES

        return dict(QWEN2_OVERRIDES)
    if name == "qwen3":
        from tests.test_qwen3 import QWEN3_OVERRIDES

        return dict(QWEN3_OVERRIDES)
    if name == "phi3":
        from tests.test_phi3 import PHI3_OVERRIDES

        return dict(PHI3_OVERRIDES)
    raise KeyError(name)


@pytest.mark.parametrize("family", ["mistral", "gemma", "gemma2", "qwen2", "qwen3", "phi3"])
def test_family_tp2_matches_single(family, tmp_path_factory):
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine

    hf = make_tiny_model(
        str(tmp_path_factory.mktemp("hf") / family), config_overrides=_overrides(family)
    )
    out = str(tmp_path_factory.mktemp("x") / f"{family}.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0

    ref = Engine.from_xalm(out, kv_dtype=jnp.float32, progress=False)
    want, _, _ = ref.prefill(TOKENS, ref.new_cache(1), logits_mode="all")

    eng = ShardedEngine.from_xalm(out, make_mesh(dp=1, tp=2), kv_dtype=jnp.float32)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

    a, _ = ref.generate(TOKENS[:5], 8, stop_on_eos=False, segment=1)
    b, _ = eng.generate(TOKENS[:5], 8, stop_on_eos=False, segment=4)
    assert a == b, family


@pytest.mark.parametrize("family", ["mistral", "gemma2", "qwen3"])
def test_family_pp2_matches_single(family, tmp_path_factory):
    """Representative families under pipeline parallelism (pp=2): the
    family deltas ride the per-stage local stacks + ppermute ring."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from xalm_tpu.parallel.pipeline import PipelinedEngine, make_pp_mesh

    hf = make_tiny_model(
        str(tmp_path_factory.mktemp("hf") / family), config_overrides=_overrides(family)
    )
    out = str(tmp_path_factory.mktemp("x") / f"{family}.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f32"]) == 0

    ref = Engine.from_xalm(out, kv_dtype=jnp.float32, progress=False)
    want, _, _ = ref.prefill(TOKENS, ref.new_cache(1), logits_mode="all")
    eng = PipelinedEngine.from_xalm(out, make_pp_mesh(2), kv_dtype=jnp.float32)
    got, _, _ = eng.prefill(TOKENS, eng.new_cache(1), logits_mode="all")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
