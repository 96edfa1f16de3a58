"""Synthetic (random) model parameters at real shapes.

Decode throughput is weight-value-independent (the engine is
bandwidth-bound; reference README.md:7-14 measures the same way), so
benchmarks use randomly initialized parameters at Mistral-7B shapes —
no 14 GB checkpoint needed in CI or the bench harness. Deterministic
(jax PRNG, fixed seed; the fixture convention mirrors reference
tensor.cpp:94's fixed seed 42).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xalm_tpu.models.config import ModelConfig
from xalm_tpu.models.params import LayerParams, ModelParams, QWeight

__all__ = ["MISTRAL_7B", "synthetic_params"]

# Mistral-7B-Instruct-v0.2 geometry (HF config; reference README.md:4).
MISTRAL_7B = ModelConfig(
    dim=4096,
    hidden_dim=14336,
    head_dim=128,
    n_layers=32,
    n_heads=32,
    n_kv_heads=8,
    vocab_size=32000,
    max_seq_len=4096,  # the reference's clamped sliding window (model.h:54-56)
    rope_theta=1e6,
    rotary_dim=128,
    norm_eps=1e-5,
    act="silu",
    tie_word_embeddings=False,
)


def _synth_qweight(key, shape, weight_dtype, scale_mag=0.02, q4_group=0) -> QWeight:
    if q4_group:
        # draw the PACKED body directly (two random nibbles per byte) with
        # constant group scales: recoding a drawn i8 stack instead would
        # transiently hold old+new copies — ~17 GB at Mixtral expert-stack
        # scale. Unpacked codes are uniform in [-8, 7], the same value
        # class the real recode emits; throughput is value-independent.
        k = shape[-1]
        if k % (2 * q4_group) or q4_group % 128:
            raise ValueError(
                f"q4 group {q4_group} must be a 128-multiple dividing K/2={k // 2}"
            )
        kq, ks = jax.random.split(key)
        q = jax.jit(
            lambda kk: jax.lax.bitcast_convert_type(
                jax.random.bits(kk, (*shape[:-1], k // 2), jnp.uint8), jnp.int8
            )
        )(kq)
        # per-group scales vary (+/-25% around scale_mag/7) so a kernel bug
        # that reads the wrong group's scale perturbs bench logits instead
        # of being invisible behind a constant plane; same memory footprint
        scale = jax.jit(
            lambda kk: (scale_mag / 7.0)
            * jax.random.uniform(
                kk, (*shape[:-1], k // q4_group), jnp.float32, 0.75, 1.25
            )
        )(ks)
        return QWeight(q, scale, q4group=q4_group)
    if weight_dtype == jnp.int8:
        # draw raw random bits and bitcast to int8 — randint would stage a
        # 4x int32 transient, which OOMs at Mixtral expert-stack scale
        # (an (L, E, 2h, d) draw is 7.5 GB of codes); code VALUES are
        # irrelevant to a bandwidth bench
        q = jax.jit(
            lambda k: jax.lax.bitcast_convert_type(
                jax.random.bits(k, shape, jnp.uint8), jnp.int8
            )
        )(key)
        scale = jnp.full(shape[:-1], scale_mag / 127.0, jnp.float32)
        return QWeight(q, scale)
    # generate in bf16 to halve the transient footprint at 7B scale
    w = jax.jit(lambda k: jax.random.normal(k, shape, jnp.bfloat16) * scale_mag)(key)
    return QWeight(w.astype(weight_dtype), None)


def synthetic_params(
    cfg: ModelConfig,
    weight_dtype=jnp.float8_e4m3fn,
    embed_dtype=jnp.bfloat16,  # the converter boosts embeds to 16-bit;
    # bf16 rather than f16 because Mosaic has no f16 (see ops/pallas_matmul)
    seed: int = 42,
    q4_group: int = 0,  # draw the body packed 4-bit (bench: no recode peak)
) -> ModelParams:
    """Random ModelParams at cfg's shapes, weight-only quantized like the
    converter would (body in ``weight_dtype``, embeds boosted, f32 norms)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), 12)
    L, d, h, q, kv, v = (
        cfg.n_layers,
        cfg.dim,
        cfg.hidden_dim,
        cfg.q_dim,
        cfg.kv_dim,
        cfg.vocab_size,
    )
    moe = cfg.n_experts > 0
    g4 = q4_group
    layers = LayerParams(
        attn_norm=jnp.ones((L, d), jnp.float32),
        # random weights need no interleave pass — draw the fused layouts
        # (see models/params.LayerParams) at their fused shapes directly
        wqkv=_synth_qweight(keys[0], (L, q + 2 * kv, d), weight_dtype, q4_group=g4),
        wo=_synth_qweight(keys[3], (L, d, q), weight_dtype, q4_group=g4),
        mlp_norm=jnp.ones((L, d), jnp.float32),
        w13=None if moe else _synth_qweight(keys[4], (L, 2 * h, d), weight_dtype, q4_group=g4),
        w2=None if moe else _synth_qweight(keys[5], (L, d, h), weight_dtype, q4_group=g4),
        wgate=(
            jax.random.normal(keys[9], (L, cfg.n_experts, d), jnp.float32) * 0.3
            if moe else None
        ),
        w13e=(
            _synth_qweight(keys[10], (L, cfg.n_experts, 2 * h, d), weight_dtype, q4_group=g4)
            if moe else None
        ),
        w2e=(
            _synth_qweight(keys[11], (L, cfg.n_experts, d, h), weight_dtype, q4_group=g4)
            if moe else None
        ),
    )
    embed = _synth_qweight(keys[7], (v, d), embed_dtype, scale_mag=0.05)
    wcls = embed if cfg.tie_word_embeddings else _synth_qweight(keys[8], (v, d), embed_dtype, scale_mag=0.05)
    return ModelParams(
        embed=embed,
        layers=layers,
        out_norm=jnp.ones((d,), jnp.float32),
        wcls=wcls,
    )
