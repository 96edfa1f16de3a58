"""Partition specs for megatron-style tensor parallelism + data parallelism.

Layout (SURVEY.md §2.4 "TPU-native equivalents"):

- wq/wk/wv: column-parallel — output (head) dim sharded on tp. GQA KV heads
  shard with the query heads, so decode attention is entirely chip-local
  (the reference's per-head OMP loop, infer.cpp:438, is the sharding seam).
- wo/w2: row-parallel — input dim sharded; their matmuls produce partial
  sums that ``forward`` psums over tp before the residual add.
- w1/w3: column-parallel on the hidden dim.
- wcls: vocab-sharded (column-parallel logits); embed replicated (one row
  gather per token — bandwidth-irrelevant).
- KV cache: batch on dp, kv-heads on tp.
- Activations/tokens: batch on dp, replicated over tp.

Per-row `i8` scales shard exactly like the rows they scale.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xalm_tpu.models.config import ModelConfig
from xalm_tpu.models.params import LayerParams, ModelParams, QWeight
from xalm_tpu.parallel.mesh import AXIS_DP, AXIS_TP
from xalm_tpu.runtime.cache import KVCache

__all__ = ["param_pspecs", "cache_pspecs", "shard_params", "shard_cache", "validate_tp"]


def validate_tp(cfg: ModelConfig, tp: int) -> None:
    from xalm_tpu.models.params import ffn_chunk

    if cfg.n_kv_heads % tp != 0:
        raise ValueError(
            f"tp={tp} must divide n_kv_heads={cfg.n_kv_heads} so GQA decode "
            f"stays chip-local"
        )
    if cfg.hidden_dim % tp != 0 or cfg.vocab_size % tp != 0:
        raise ValueError(f"tp={tp} must divide hidden_dim and vocab_size")
    if cfg.n_experts and cfg.n_experts % tp != 0:
        raise ValueError(f"tp={tp} must divide n_experts={cfg.n_experts}")
    chunks = cfg.hidden_dim // ffn_chunk(cfg.hidden_dim)
    if chunks % tp != 0:
        raise ValueError(
            f"tp={tp} must divide the fused gate/up chunk count {chunks} "
            f"(hidden_dim {cfg.hidden_dim} / chunk {ffn_chunk(cfg.hidden_dim)})"
        )


def _qw(col: P, scale: P) -> QWeight:
    return QWeight(values=col, scale=scale)


def param_pspecs(cfg: ModelConfig) -> ModelParams:
    """A ModelParams-shaped tree of PartitionSpecs (stacked layer dim first)."""
    col = _qw(P(None, AXIS_TP, None), P(None, AXIS_TP))  # output-dim sharded
    row = _qw(P(None, None, AXIS_TP), P(None, None))  # input-dim sharded
    # fused wqkv shards along kv-head groups, fused w13 along gate/up chunk
    # pairs — both land exactly on the column-parallel megatron layout
    # because the interleaves are per-kv-head / per-chunk (validate_tp)
    layers = LayerParams(
        attn_norm=P(None, None),
        wqkv=col,
        wo=row,
        mlp_norm=P(None, None),
        w13=col,
        w2=row,
        # qkv bias (Qwen2) shards with the column-parallel qkv output rows
        bqkv=P(None, AXIS_TP),
        # Mixtral MoE: replicated router, expert stacks sharded over the
        # expert dim (expert parallelism — llama.forward slices the router
        # weights to the local experts and the down psum sums contributions)
        wgate=P(None, None, None),
        w13e=_qw(P(None, AXIS_TP, None, None), P(None, AXIS_TP, None)),
        w2e=_qw(P(None, AXIS_TP, None, None), P(None, AXIS_TP, None)),
        post_attn_norm=P(None, None),
        post_mlp_norm=P(None, None),
        q_norm=P(None, None),
        k_norm=P(None, None),
    )
    return ModelParams(
        embed=_qw(P(None, None), P(None)),  # replicated
        layers=layers,
        out_norm=P(None),
        wcls=_qw(P(AXIS_TP, None), P(AXIS_TP)),  # vocab-sharded
    )


def cache_pspecs(cfg: ModelConfig, quantized: bool = False) -> KVCache:
    # (L, B, K, S, hd): batch on dp, kv heads on tp; int8 caches carry
    # (L, B, K, S) scale planes sharded the same way
    spec = P(None, AXIS_DP, AXIS_TP, None, None)
    sspec = P(None, AXIS_DP, AXIS_TP, None) if quantized else None
    return KVCache(k=spec, v=spec, k_scale=sspec, v_scale=sspec)


def _apply(tree, specs, mesh: Mesh):
    def put(x, spec):
        if x is None:
            return None
        if jax.process_count() > 1:
            # multi-host: every process holds the full host value and
            # materializes only its addressable shards
            from xalm_tpu.parallel.multihost import make_global

            return make_global(mesh, spec, x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree, specs, is_leaf=lambda x: x is None)


def shard_params(params: ModelParams, cfg: ModelConfig, mesh: Mesh) -> ModelParams:
    validate_tp(cfg, mesh.shape[AXIS_TP])
    return _apply(params, param_pspecs(cfg), mesh)


def shard_cache(cache: KVCache, cfg: ModelConfig, mesh: Mesh) -> KVCache:
    return _apply(cache, cache_pspecs(cfg, cache.quantized), mesh)
