"""AOT compilation against TPU topologies — multi-chip compile, zero chips.

``jax.experimental.topologies`` exposes the real TPU compiler for a named
device topology (e.g. ``v5e:2x4``) without any attached hardware. This
module builds *abstract* ShardedEngines over such topologies and compiles
their decode/prefill steps with the production XLA:TPU pipeline, so that

  * a deploy target's multi-chip program is validated (shapes, layouts,
    SPMD partitioning, VMEM fit) before any chips are reserved, and
  * the optimized executable's collective structure can be inspected and
    pinned by tests (tests/test_scaling_model.py) — the comm model in
    docs/SCALING.md cites numbers measured here, not prose.

The reference has no distributed or AOT story (SURVEY.md §2.4); this is
target-platform infrastructure. Driven by ``tools/aot_compile.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xalm_tpu.models.config import ModelConfig
from xalm_tpu.parallel.mesh import AXIS_DP, AXIS_TP, make_mesh

__all__ = [
    "topology_mesh",
    "abstract_engine",
    "compile_step",
    "collective_stats",
]


def topology_mesh(topology_name: str = "v5e:2x4", *, dp: int = 1, tp: int = 2) -> Mesh:
    """(dp, tp) mesh over a named TPU topology's abstract devices.

    Raises if the TPU compiler (libtpu) is unavailable — callers/tests
    should treat that as a skip, not a failure.
    """
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu", topology_name=topology_name)
    devs = list(topo.devices)
    if dp * tp > len(devs):
        raise ValueError(f"dp*tp = {dp}*{tp} > topology {topology_name} ({len(devs)})")
    return make_mesh(dp=dp, tp=tp, devices=devs[: dp * tp])


def abstract_engine(cfg: ModelConfig, mesh: Mesh, *, weight_dtype=jnp.int8, **kw):
    """ShardedEngine whose params/cache are ShapeDtypeStructs on ``mesh``.

    Nothing is materialized: lower()/compile() only. Weight dtype defaults
    to the production i8 container format.
    """
    from xalm_tpu.parallel.sharded_engine import ShardedEngine
    from xalm_tpu.utils.synthetic import synthetic_params

    params = jax.eval_shape(lambda: synthetic_params(cfg, weight_dtype=weight_dtype))
    kw.setdefault("kv_dtype", jnp.bfloat16)
    kw.setdefault("compute_dtype", jnp.bfloat16)
    return ShardedEngine(cfg, params, None, mesh, abstract=True, **kw)


def compile_step(
    eng,
    *,
    batch: int = 1,
    t: int = 1,
    logits_mode: str = "last",
    compiler_options: dict | None = None,
):
    """Compile one forward step (t==1: decode; t>1: prefill chunk) of an
    abstract engine with the real TPU compiler; returns the jax Compiled."""
    mesh = eng.mesh
    cache = eng.new_cache(batch)
    bp = cache.batch if hasattr(cache, "batch") else batch

    def sds(shape, dtype, spec):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=NamedSharding(mesh, spec))

    toks = sds((bp, t), np.int32, P(AXIS_DP, None))
    pos = sds((bp,), np.int32, P(AXIS_DP))
    valid = sds((bp, t), bool, P(AXIS_DP, None))
    from xalm_tpu.ops.lowering import tpu_lowering

    with tpu_lowering():  # Pallas kernels must lower as real Mosaic, not
        # interpret-mode callbacks, even when this process's default
        # backend is CPU (the pytest mesh)
        lowered = eng._fwd.lower(
            eng.params, toks, pos, cache, valid, logits_mode=logits_mode
        )
    if compiler_options:
        return lowered.compile(compiler_options=compiler_options)
    return lowered.compile()


def collective_stats(compiled) -> dict:
    """Collective-op counts from the OPTIMIZED (post-XLA) executable text.

    Sync ops print as ``all-reduce(...)``; async pairs as
    ``all-reduce-start`` / ``all-reduce-done`` (same for the others).
    """
    txt = compiled.as_text()
    stats = {}
    for op in ("all-reduce", "all-gather", "all-to-all", "collective-permute",
               "reduce-scatter"):
        stats[op] = {
            "sync": txt.count(f" {op}("),
            "async": txt.count(f"{op}-start"),
        }
        assert txt.count(f"{op}-start") == txt.count(f"{op}-done")
    return stats
