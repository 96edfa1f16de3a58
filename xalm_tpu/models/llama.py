"""Llama/Mistral-family forward pass — functional, jit-first, scan-over-layers.

Behavioral contract (reference src/infer.cpp:365-638, SURVEY.md §2/§5.7):

- f32 residual stream and softmax with max subtraction; fp16 KV cache
  rounding on write; optional qkv clipping pre-RoPE (infer.cpp:393-399).
- Interleaved-pair RoPE with a ``rotary_dim`` cutoff — pairs beyond
  rotary_dim are unrotated (infer.cpp:305-322).
- GQA: query head h attends kv head h // (n_heads/n_kv_heads)
  (infer.cpp:434-444).
- StreamingLLM sink+ring KV cache: writes at ``kv_pos``, attends over
  ``kv_len`` slots, and re-rotates the ``kv_sink`` pinned keys by +1 position
  each decode step (infer.cpp:411-431, arXiv:2309.17453).
- GLU FFN: w2(act(w1 x) * w3 x) with gelu(tanh)/silu (infer.cpp:455-495).

TPU-first departures from the reference's per-token matvec loop:

- One traced function handles a whole (batch, chunk) of tokens: prefill is a
  single batched MXU pass with the causal mask *implied by kv_len* (slot s is
  visible to the query at position p iff s < min(p+1, S) — for non-wrapped
  prefill that equals s <= p, i.e. causality), not T sequential matvec chains.
- Layers are a ``lax.scan`` over stacked weights; the KV cache rides in the
  carry and is updated in place (donated buffer) via scatter rows.
- Positions are **per-sequence vectors** so a continuous batch wraps its
  rings independently.

Chunk contract: calls with T > 1 must not wrap the ring — the engine chunks
prompts so ``pos + T <= max_seq_len``; once wrapped, it feeds tokens one at a
time (T=1), which is also the only shape where sink re-rotation applies.
"""

from __future__ import annotations

import math
import os
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from xalm_tpu.models.config import KV_SINKS, ModelConfig
from xalm_tpu.models.params import (
    ModelParams,
    Q8_FIXED_SCALE,
    QWeight,
    ffn_chunk,
    split_qkv_rows,
    split_w13_rows,
)
from xalm_tpu.ops.linear import qmatmul
from xalm_tpu.runtime.cache import KVCache, ring_indices

__all__ = ["forward", "rope_freqs", "apply_rope", "rmsnorm", "embed_lookup", "attention"]

LogitsMode = Literal["none", "last", "all", "token"]
# "token": return the greedy next token id (B,) int32 instead of logits —
# with the full megakernel folds the whole decode step (embed -> layers ->
# logits -> argmax) is one pallas_call; other paths argmax in XLA


def rope_freqs(cfg: ModelConfig) -> np.ndarray:
    """Per-pair angular frequency; pairs with j >= rotary_dim get freq 0
    (unrotated tail — reference infer.cpp:309-312).

    ``cfg.rope_scaling`` rescales the base frequencies for long-context
    checkpoints (no reference counterpart — the reference clamps context to
    4k instead): "linear" divides every frequency by ``rope_factor``;
    "llama3" (HF _compute_llama3_parameters) keeps high-frequency pairs,
    divides low-frequency pairs by the factor, and smoothly interpolates
    the band between ``high/low_freq_factor`` wavelength cutoffs."""
    j = np.arange(0, cfg.head_dim, 2, dtype=np.float32)
    freqs = np.where(
        j < cfg.rotary_dim,
        cfg.rope_theta ** (-(j / max(cfg.rotary_dim, 1))),
        0.0,
    ).astype(np.float32)
    if cfg.rope_scaling == "linear":
        freqs = freqs / np.float32(cfg.rope_factor)
    elif cfg.rope_scaling == "llama3":
        orig = np.float32(cfg.rope_original_max_pos)
        factor = np.float32(cfg.rope_factor)
        with np.errstate(divide="ignore"):
            wavelen = np.where(freqs > 0, 2.0 * np.pi / freqs, np.inf)
        low_wl = orig / np.float32(cfg.rope_low_freq_factor)
        high_wl = orig / np.float32(cfg.rope_high_freq_factor)
        smooth = (orig / wavelen - cfg.rope_low_freq_factor) / max(
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor, 1e-9
        )
        interp = (1.0 - smooth) * freqs / factor + smooth * freqs
        freqs = np.where(
            wavelen > low_wl, freqs / factor, np.where(wavelen < high_wl, freqs, interp)
        )
    return freqs.astype(np.float32)


def apply_rope(x: jax.Array, positions: jax.Array, freqs) -> jax.Array:
    """Interleaved-pair rotation. ``x``: (B, T, H, head_dim) f32;
    ``positions``: (B, T) int32.

    Lane-wise formulation: ``out = x * cexp + swap(x) * sexp`` where
    ``swap[2j] = -x[2j+1], swap[2j+1] = x[2j]`` is built from two rolls on
    the lane (head_dim) axis — the same products as the pairwise form, but
    with no (hd/2, 2) reshapes, which cost a chain of relayout copies per
    layer on TPU (measured ~100 us/step at decode)."""
    b, t, h, hd = x.shape
    ang = positions[:, :, None].astype(jnp.float32) * jnp.asarray(freqs)  # (B, T, hd//2)
    cexp = jnp.repeat(jnp.cos(ang), 2, axis=-1)[:, :, None]  # (B, T, 1, hd)
    sexp = jnp.repeat(jnp.sin(ang), 2, axis=-1)[:, :, None]
    even = (jnp.arange(hd, dtype=jnp.int32) % 2) == 0
    swapped = jnp.where(even, -jnp.roll(x, -1, axis=-1), jnp.roll(x, 1, axis=-1))
    return x * cexp + swapped * sexp


def rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """f32 RMS norm (reference infer.cpp:224-251)."""
    x = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * w.astype(jnp.float32)


def embed_lookup(embed: QWeight, tokens: jax.Array) -> jax.Array:
    """Gather + dequantize embedding rows (reference infer.cpp:553-602)."""
    rows = embed.values[tokens].astype(jnp.float32)
    if embed.values.dtype == jnp.int8:
        if embed.scale is not None:
            rows = rows * embed.scale[tokens][..., None]
        else:
            rows = rows * Q8_FIXED_SCALE
    return rows


def attention(
    q: jax.Array,  # (B, T, n_heads, head_dim) f32, already rotated
    k: jax.Array,  # (B, n_kv_heads, S, head_dim) cache dtype
    v: jax.Array,  # (B, n_kv_heads, S, head_dim)
    kv_len: jax.Array,  # (B, T) int32 — slots visible to each query
    cfg: ModelConfig,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """GQA attention over the (possibly ring-ordered) cache. Returns (B, T, q_dim).

    Ring order is attention-order-irrelevant: keys are pre-rotated, scores are
    position-agnostic beyond that (reference attn, infer.cpp:325-359).
    """
    # head counts come from the *arrays*, not cfg — under tensor parallelism
    # these are the local shard's heads (n_heads/tp, n_kv_heads/tp); the GQA
    # group ratio is shard-invariant because tp divides n_kv_heads.
    b, t, hq, hd = q.shape
    kh = k.shape[1]
    g = hq // kh
    s = k.shape[2]
    qg = q.reshape(b, t, kh, g, hd) * (1.0 / math.sqrt(hd))
    # MXU inputs in compute_dtype (bf16 doubles prefill peak); accumulation
    # and the max-subtracted softmax stay f32 either way
    scores = jnp.einsum(
        "btkgh,bksh->bkgts",
        qg.astype(compute_dtype),
        k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if cfg.attn_softcap:
        # Gemma-2 attention logit softcapping (HF modeling_gemma2 eager)
        scores = jnp.tanh(scores / cfg.attn_softcap) * cfg.attn_softcap
    mask = (
        jnp.arange(s, dtype=jnp.int32)[None, None, None, None, :]
        < kv_len[:, None, None, :, None]
    )
    scores = jnp.where(mask, scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgts,bksh->btkgh",
        att.astype(compute_dtype),
        v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, t, hq * hd)


def _quantize_rows(rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, T, K, hd) f32 -> int8 codes + per-row f32 scale (absmax/127),
    the `i8` weight scheme applied to the KV cache."""
    amax = jnp.max(jnp.abs(rows), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(rows / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _write_scales(scales: jax.Array, layer, kv_pos: jax.Array, snew: jax.Array) -> jax.Array:
    """Scatter (B, T, K) per-row scales into the (L, B, K, S) plane."""
    b, t, kh = snew.shape
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    k_idx = jnp.arange(kh, dtype=jnp.int32)[None, :, None]
    s_idx = kv_pos[:, None, :]
    return scales.at[layer, b_idx, k_idx, s_idx].set(
        snew.transpose(0, 2, 1), mode="drop"
    )


def _write_rows(cache: jax.Array, layer, kv_pos: jax.Array, rows: jax.Array) -> jax.Array:
    """Scatter (B, T) new KV rows into cache layer ``layer``.

    cache: (L, B, K, S, hd); rows: (B, T, K, hd) already in cache dtype.
    """
    b, t, kh, hd = rows.shape
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None, None]  # (B,1,1)
    k_idx = jnp.arange(kh, dtype=jnp.int32)[None, :, None]  # (1,K,1)
    s_idx = kv_pos[:, None, :]  # (B,1,T)
    # Padding/inactive tokens carry the kv_pos == logical-max_seq_len
    # sentinel: with the physical window padded past the logical one, the
    # write lands in a padding row no attention ever reads (and mode="drop"
    # still discards it when the sentinel is truly out of physical bounds).
    return cache.at[layer, b_idx, k_idx, s_idx].set(
        rows.transpose(0, 2, 1, 3), mode="drop"
    )


def _write_chunk(
    cache: jax.Array, layer, pos: jax.Array, rows: jax.Array,
    valid: jax.Array | None, s: int,
) -> jax.Array:
    """Contiguous in-place chunk write for T > 1 prefill (no wrap by the
    chunk contract): one dynamic_update_slice per batch row instead of a
    scatter — XLA reliably aliases DUS on the donated cache, where the
    scatter's unprovable aliasing cost a full cache copy per layer.

    cache: (L, B, K, S, hd); rows: (B, T, K, hd) in cache dtype. Rows with
    ``valid == False`` keep the existing cache contents (a masked
    read-modify-write of the tiny window) — an inactive batch row may be
    mid-ring-wrap, where a clamped blind write would clobber live slots.
    """
    b, t, kh, hd = rows.shape
    win = rows.transpose(0, 2, 1, 3)[:, None, None]  # (B, 1, 1, K, T, hd)
    for bi in range(b):
        start = jnp.minimum(pos[bi], s - t)  # in-bounds even for inactive rows
        idx = (layer, bi, 0, start, 0)
        new = win[bi]
        if valid is not None:
            cur = jax.lax.dynamic_slice(cache, idx, (1, 1, kh, t, hd))
            vmask = valid[bi][None, None, None, :, None]
            new = jnp.where(vmask, new, cur)
        cache = jax.lax.dynamic_update_slice(cache, new, idx)
    return cache


def _rotate_sinks(
    cache_k: jax.Array, layer, active: jax.Array, freqs, cfg: ModelConfig,
    k_scale: jax.Array | None = None,
):
    """Rotate the pinned sink keys forward by +1 position for wrapped
    sequences (reference infer.cpp:416-431). T=1 decode only.

    Quantized caches dequantize the sink rows, rotate, and re-quantize with
    a fresh per-row scale (rotation can change the row absmax). Returns
    (cache_k, k_scale)."""
    _, l_b, kh, _, hd = cache_k.shape  # kh = local kv heads under tp
    sinks = jax.lax.dynamic_slice(
        cache_k,
        (layer, 0, 0, 0, 0),
        (1, l_b, kh, KV_SINKS, hd),
    )[0]  # (B, K, KV_SINKS, hd)
    if k_scale is not None:
        sscale = jax.lax.dynamic_slice(
            k_scale, (layer, 0, 0, 0), (1, l_b, kh, KV_SINKS)
        )[0]  # (B, K, KV_SINKS)
        vals = sinks.astype(jnp.float32) * sscale[..., None]
    else:
        vals = sinks.astype(jnp.float32)
    ones = jnp.ones((l_b, KV_SINKS), dtype=jnp.int32)
    rotated = apply_rope(vals.transpose(0, 2, 1, 3), ones, freqs).transpose(0, 2, 1, 3)
    if k_scale is not None:
        # requantize: (B, K, KV_SINKS, hd) -> treat as (B, T=KV_SINKS, K, hd)
        q, sc = _quantize_rows(rotated.transpose(0, 2, 1, 3))
        q = q.transpose(0, 2, 1, 3)
        sc = sc.transpose(0, 2, 1)
        new = jnp.where(active[:, None, None, None], q, sinks)
        new_sc = jnp.where(active[:, None, None], sc, sscale)
        cache_k = jax.lax.dynamic_update_slice(cache_k, new[None], (layer, 0, 0, 0, 0))
        k_scale = jax.lax.dynamic_update_slice(k_scale, new_sc[None], (layer, 0, 0, 0))
        return cache_k, k_scale
    new = jnp.where(active[:, None, None, None], rotated.astype(cache_k.dtype), sinks)
    return jax.lax.dynamic_update_slice(cache_k, new[None], (layer, 0, 0, 0, 0)), None


def _spec_verify_attention(
    q, k, v, ck, cv, ks, vs, layer, kv_pos, cfg, freqs, compute_dtype
):
    """Attention for a WRAPPED-ring speculative verify chunk (runtime/spec.py).

    The chunk's KV rows are NOT written to the ring; instead each query i
    attends [per-query-rotated sinks] + [ring minus the rows this chunk
    would overwrite] + [in-chunk causal draft rows]. In the plain decode
    path, the row written at kv_pos(pos+j) evicts the oldest window
    position pos+j-(S-KV_SINKS) — outside every chunk query's window — so
    masking exactly those slots (for j <= i) reproduces per-step ring
    semantics without mutating the cache. Sinks are pinned but re-rotated
    +1 per emitted position (reference infer.cpp:416-431); query i sees
    them rotated +(i+1) from the pre-chunk state, rounded through the
    cache dtype like the plain path's write-then-read.

    Returns (attn_out (B, T, q_dim), rows) where rows is the chunk's KV in
    stored form — (k, v) cache-dtype rows, plus (k_scale, v_scale) for
    quantized caches — for runtime/spec.spec_commit to scatter the
    accepted prefix."""
    b, t, hq, hd = q.shape
    kl = jax.lax.dynamic_index_in_dim(ck, layer, axis=0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(cv, layer, axis=0, keepdims=False)
    if ks is not None:
        kq_codes, ksc = _quantize_rows(k)
        vq_codes, vsc = _quantize_rows(v)
        rows = (kq_codes, vq_codes, ksc, vsc)
        kl = kl.astype(jnp.float32) * jax.lax.dynamic_index_in_dim(
            ks, layer, 0, keepdims=False
        )[..., None]
        vl = vl.astype(jnp.float32) * jax.lax.dynamic_index_in_dim(
            vs, layer, 0, keepdims=False
        )[..., None]
        # draft rows attend in stored (quantize-rounded) form, like a
        # write-then-read on the plain path
        kd = kq_codes.astype(jnp.float32) * ksc[..., None]
        vd = vq_codes.astype(jnp.float32) * vsc[..., None]
    else:
        rows = (k.astype(ck.dtype), v.astype(cv.dtype))
        kd = rows[0].astype(jnp.float32)
        vd = rows[1].astype(jnp.float32)
    kh = kl.shape[1]
    g = hq // kh
    s = kl.shape[2]
    qg = q.reshape(b, t, kh, g, hd) * (1.0 / math.sqrt(hd))
    qc = qg.astype(compute_dtype)
    # ring region: everything except sinks and the slots this chunk evicts
    sc_ring = jnp.einsum(
        "btkgh,bksh->bkgts", qc, kl.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    slot = jnp.arange(s, dtype=jnp.int32)
    evicted = jnp.cumsum(
        (slot[None, None, :] == kv_pos[:, :, None]).astype(jnp.int32), axis=1
    ) > 0  # (B, T, S): slot kv_pos[:, j] is dead for queries i >= j
    # physical planes are padded past the logical window (KVCache.plane_
    # shape %32): padding rows are never live, exactly like kv_len masking
    dead = evicted | ((slot < KV_SINKS) | (slot >= cfg.max_seq_len))[None, None, :]
    sc_ring = jnp.where(dead[:, None, None], -jnp.inf, sc_ring)  # (B,K,G,T,S)
    # in-chunk causal draft rows (query i sees drafts j <= i)
    sc_draft = jnp.einsum(
        "btkgh,bjkh->bkgtj", qc, kd.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    causal = (
        jnp.arange(t, dtype=jnp.int32)[:, None]
        >= jnp.arange(t, dtype=jnp.int32)[None, :]
    )
    sc_draft = jnp.where(causal[None, None, None], sc_draft, -jnp.inf)
    # sinks rotated +(i+1) per query, rounded through the cache dtype
    sink_k = kl[:, :, :KV_SINKS]  # (B, KH, KV_SINKS, hd) f32
    base = jnp.broadcast_to(
        sink_k.reshape(b, 1, kh * KV_SINKS, hd), (b, t, kh * KV_SINKS, hd)
    )
    steps = jnp.broadcast_to(
        jnp.arange(1, t + 1, dtype=jnp.int32)[None, :], (b, t)
    )
    rot = apply_rope(base, steps, freqs).reshape(b, t, kh, KV_SINKS, hd)
    if ks is not None:
        rq, rsc = _quantize_rows(rot.reshape(b, t * kh, KV_SINKS, hd))
        rot = (rq.astype(jnp.float32) * rsc[..., None]).reshape(
            b, t, kh, KV_SINKS, hd
        )
    else:
        rot = rot.astype(ck.dtype).astype(jnp.float32)
    sc_sink = jnp.einsum(
        "btkgh,btksh->bkgts", qc, rot.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.concatenate([sc_sink, sc_ring, sc_draft], axis=-1)
    if cfg.attn_softcap:
        # cap only finite scores (tanh(-inf) would resurrect masked slots)
        capped = jnp.tanh(scores / cfg.attn_softcap) * cfg.attn_softcap
        scores = jnp.where(jnp.isfinite(scores), capped, scores)
    att = jax.nn.softmax(scores, axis=-1)
    a_sink = att[..., :KV_SINKS]
    a_ring = att[..., KV_SINKS : KV_SINKS + s]
    a_draft = att[..., KV_SINKS + s :]
    sink_v = vl[:, :, :KV_SINKS]  # V rows are never rotated
    out = (
        jnp.einsum("bkgts,bksh->btkgh", a_sink.astype(compute_dtype),
                   sink_v.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bkgts,bksh->btkgh", a_ring.astype(compute_dtype),
                     vl.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
        + jnp.einsum("bkgtj,bjkh->btkgh", a_draft.astype(compute_dtype),
                     vd.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    )
    return out.reshape(b, t, hq * hd), rows


def forward(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: jax.Array,  # (B, T) int32
    pos: jax.Array,  # (B,) int32 — absolute position of tokens[:, 0]
    cache: KVCache,
    valid: jax.Array | None = None,  # (B, T) bool; False = padding/inactive
    *,
    logits_mode: LogitsMode = "last",
    compute_dtype=jnp.float32,
    matmul_impl: str = "auto",
    a8_prefill: bool = False,
    a8_decode: bool = False,
    tp_axis: str | None = None,
    pp_axis: str | None = None,
    fused_step: bool | str = "auto",
    spec_verify: bool = False,
):
    """One jitted step over a (B, T) token block. Returns (logits, cache).

    logits: (B, vocab) for "last", (B, T, vocab) for "all", None for "none"
    ("none" is the reference's HYDRATE_KV_CACHE early-out, infer.cpp:620-623).
    Tokens with ``valid == False`` neither write the cache nor produce
    meaningful logits (their KV write is dropped out-of-bounds).

    Tensor parallelism: when called inside ``shard_map`` with ``tp_axis``
    set, params must carry megatron-style local shards (see
    xalm_tpu/parallel/shardings.py): wq/wk/wv/w1/w3 column-sharded (local
    heads / local hidden), wo/w2 row-sharded producing partial sums that are
    ``psum``'d here before the residual add, and wcls vocab-sharded (logits
    come back vocab-local). GQA stays chip-local because KV heads shard with
    the query heads (SURVEY.md §7 "GQA head mapping + sharding interplay").
    """
    b, t = tokens.shape
    s = cfg.max_seq_len
    freqs = rope_freqs(cfg)
    if spec_verify:
        assert tp_axis is None and pp_axis is None, "spec verify is single-device"
        assert t > 1 and logits_mode == "all"

    positions = pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # (B, T)
    _, kv_pos, kv_len = ring_indices(positions, s)
    if valid is not None:
        kv_pos = jnp.where(valid, kv_pos, s)  # out-of-bounds -> write dropped

    x = embed_lookup(params.embed, tokens)  # (B, T, dim) f32
    if cfg.embed_scale != 1.0:
        # Gemma residual normalizer (HF modeling_gemma: sqrt(hidden_size));
        # the megakernel's in-kernel embed fold applies the same constant
        x = x * cfg.embed_scale

    lp = params.layers
    use_pallas = matmul_impl == "pallas"

    # --- megakernel decode fast path: the WHOLE layer stack in one
    # pallas_call with manual-DMA weight streaming (ops/fused_decode.py).
    # b<=8, T=1, i8 weights, float OR quantized-i8 cache — the headline
    # decode regime plus the serving batch sizes and `--kv i8` (weights
    # stream once per STEP; rows carry their own kv_pos/rotate,
    # valid-masked rows ride the kv_pos == S sentinel set above, and i8
    # caches thread their scale planes through the kernel in-place).
    if fused_step == "auto":
        # measured-table routing (VERDICT r4 item 5): shapes are trace-time
        # static, so this resolves to a constant per compiled program
        from xalm_tpu.ops.fused_decode import measured_fused_preferred

        fused_step = measured_fused_preferred(b, cache.k_scale is not None)
    if (
        fused_step
        and t == 1
        and use_pallas
        and tp_axis is None
    ):
        from xalm_tpu.ops.fused_decode import (
            fused_decode_step,
            fused_step_supported,
        )

        if fused_step_supported(
            cfg, params, cache.k, b, t, cache.k_scale, a8=a8_decode
        ):
            from xalm_tpu.ops.fused_decode import (
                embed_fold_supported,
                wcls_fold_supported,
            )
            from xalm_tpu.ops.pallas_attention import rope_cos_sin_plus1

            ang = positions[:, 0, None].astype(jnp.float32) * jnp.asarray(freqs)
            cexp_p = jnp.repeat(jnp.cos(ang), 2, axis=-1)  # (B, hd)
            sexp_p = jnp.repeat(jnp.sin(ang), 2, axis=-1)
            cexp1, sexp1 = rope_cos_sin_plus1(freqs)
            active = positions[:, 0] >= s
            if valid is not None:
                # inactive serving slots must not re-rotate their sinks
                active = active & valid[:, 0]
            active = active.astype(jnp.int32)
            fold = logits_mode != "none" and wcls_fold_supported(cfg, params)
            # embed fold: the kernel gathers the token row and computes the
            # rope trig itself; the XLA gather/cos/sin above are then dead
            # code the jit removes (b=1 specialization)
            fold_e = b == 1 and embed_fold_supported(cfg, params)
            mk_kw = dict(
                embed=params.embed,
                token=tokens[:, 0],
                pos=positions[:, 0],
                freqs=jnp.asarray(freqs),
            ) if fold_e else {}
            if a8_decode:
                mk_kw["a8"] = True
            mk_quant = cache.k_scale is not None
            if mk_quant:
                mk_kw.update(k_scale=cache.k_scale, v_scale=cache.v_scale)

            def mk_cache(outs):
                """Split the megakernel's trailing cache planes off its
                output tuple -> (head_outputs, new KVCache)."""
                if mk_quant:
                    ck, cv, ks, vs = outs[-4:]
                    return outs[:-4], KVCache(k=ck, v=cv, k_scale=ks, v_scale=vs)
                ck, cv = outs[-2:]
                return outs[:-2], KVCache(k=ck, v=cv, k_scale=None, v_scale=None)
            mk_args = (
                params,
                cfg,
                x[:, 0, :],
                cache.k,
                cache.v,
                kv_pos[:, 0],
                kv_len[:, 0],
                active,
                cexp_p,
                sexp_p,
                jnp.asarray(cexp1),
                jnp.asarray(sexp1),
            )
            if fold:
                # phase 5: final norm + i8 classifier stream + argmax
                # in-kernel
                outs = fused_decode_step(
                    *mk_args, wcls=params.wcls, out_norm=params.out_norm,
                    **mk_kw,
                )
                (xf, logits, tok), new_cache = mk_cache(outs)
                if logits_mode == "token":
                    return tok[:, 0], new_cache
                return (
                    logits if logits_mode == "last" else logits[:, None, :]
                ), new_cache
            outs = fused_decode_step(*mk_args, **mk_kw)
            (xf,), new_cache = mk_cache(outs)
            if logits_mode == "none":
                return None, new_cache
            xn = rmsnorm(xf[:, None, :], params.out_norm, cfg.norm_eps)
            from xalm_tpu.ops.pallas_matmul import (
                pallas_qmatmul,
                supported_weight_dtype,
            )

            if supported_weight_dtype(params.wcls.values.dtype):
                logits = pallas_qmatmul(xn, params.wcls)
            else:
                logits = qmatmul(
                    xn, params.wcls, compute_dtype=compute_dtype, impl="xla"
                )
            if cfg.logit_softcap:  # Gemma-2 (the wcls fold caps in-kernel)
                logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap
            if logits_mode == "token":
                return (
                    jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32),
                    new_cache,
                )
            return logits[:, 0] if logits_mode == "last" else logits, new_cache

    def mm(xx, qw: QWeight, layer=None, norm_sw=None):
        """Stacked-weight matmul. With the pallas impl, the kernel indexes the
        stacked (L, D, N) buffer by `layer` via scalar prefetch — the scan
        never slices weights, so no per-layer HBM copy exists. The xla path
        slices explicitly (fallback / large-M prefill).

        ``norm_sw``: stacked (L, dim) rmsnorm weights applied to xx before
        the matmul. At decode shapes both the norm (prologue) and the i8
        per-row scales (epilogue) fold INTO the kernel, indexed by the same
        scalar-prefetch layer — an XLA dynamic-slice of either costs a
        separate 20-60 us strided-read kernel per layer per step."""
        m = b * xx.shape[1] if xx.ndim == 3 else b
        # the kernel blocks M in 512-row tiles; odd m > 512 (never produced
        # by the bucketed engine/batcher) falls back to the XLA path
        pallas_ok = use_pallas and _pallas_ok(qw) and (m <= 512 or m % 512 == 0)
        if (
            use_pallas and qw.q4group and layer is not None and m < 256
            # the packed-tile kernel's dots are s8 x s8 — running it IS the
            # int8-activation tradeoff, so it stays behind the a8 opt-in
            # (same gate as the q4 megakernel), split by call shape the same
            # way the W8A8 paths are: t==1 decode rows need a8_decode, t>1
            # prefill chunks need a8_prefill (Engine.decode_path reports the
            # same predicate); without the matching opt-in, q4 dequantizes
            # through XLA at full activation precision below
            and (a8_decode if (xx.ndim != 3 or xx.shape[1] == 1) else a8_prefill)
        ):
            # packed 4-bit decode off the megakernel: the per-layer stacked
            # kernel streams the packed tiles (in-VMEM unpack + grouped
            # s8 x s8 dots) — MoE b>8 slots and gathered experts run here;
            # prefill/odd shapes still dequantize through XLA below
            from xalm_tpu.ops.pallas_matmul import pallas_qmatmul_stacked

            if norm_sw is not None:
                xx = rmsnorm(xx, _index(norm_sw, layer), cfg.norm_eps)
            y = pallas_qmatmul_stacked(
                xx.reshape(-1, xx.shape[-1]).astype(jnp.float32),
                qw.values, layer, scale=qw.scale, q4_group=qw.q4group,
            )
            return y.reshape(*xx.shape[:-1], y.shape[-1])
        if pallas_ok and layer is not None and m < 256:
            from xalm_tpu.ops.pallas_matmul import pallas_qmatmul_stacked

            is_i8 = qw.values.dtype == jnp.int8
            y = pallas_qmatmul_stacked(
                xx.reshape(-1, xx.shape[-1]),
                qw.values,
                layer,
                norm_w=norm_sw,
                norm_eps=cfg.norm_eps if norm_sw is not None else None,
                scale=qw.scale if is_i8 else None,
                q8_scale=Q8_FIXED_SCALE if (is_i8 and qw.scale is None) else None,
            )
            return y.reshape(*xx.shape[:-1], y.shape[-1])
        if norm_sw is not None:
            xx = rmsnorm(xx, _index(norm_sw, layer), cfg.norm_eps)
        if pallas_ok:
            from xalm_tpu.ops.pallas_matmul import (
                pallas_qmatmul,
                pallas_qmatmul_stacked,
                pallas_qmatmul_stacked_full,
            )

            if layer is None:
                return pallas_qmatmul(xx, qw)
            xm = xx.reshape(-1, xx.shape[-1])
            if a8_prefill and qw.values.dtype == jnp.int8:
                # W8A8 prefill: per-token int8 activations, s8 x s8 MXU at
                # 2x the bf16 rate; weight scales fold into the epilogue
                y = pallas_qmatmul_stacked(
                    xm, qw.values, layer, scale=qw.scale,
                    q8_scale=Q8_FIXED_SCALE if qw.scale is None else None,
                    a8=True,
                )
            elif qw.scale is not None:
                y = pallas_qmatmul_stacked_full(xm, qw.values, qw.scale, layer)
            else:
                y = pallas_qmatmul_stacked(xm, qw.values, layer)
                if qw.values.dtype == jnp.int8:
                    y = y * Q8_FIXED_SCALE
            return y.reshape(*xx.shape[:-1], y.shape[-1])
        if layer is not None:
            qw = QWeight(
                jax.lax.dynamic_index_in_dim(qw.values, layer, 0, keepdims=False),
                None
                if qw.scale is None
                else jax.lax.dynamic_index_in_dim(qw.scale, layer, 0, keepdims=False),
                q4group=qw.q4group,
            )
        return qmatmul(xx, qw, compute_dtype=compute_dtype, impl="xla")

    def _pallas_ok(qw: QWeight) -> bool:
        from xalm_tpu.ops.pallas_matmul import supported_weight_dtype

        if qw.q4group:
            # packed 4-bit runs EITHER the megakernel (in-VMEM unpack) or
            # the XLA dequant path; the per-layer pallas kernels don't
            # stream packed tiles
            return False
        return supported_weight_dtype(qw.values.dtype)

    def _fused_cache_ok(ck) -> bool:
        from xalm_tpu.ops.pallas_attention import supported_cache_dtype

        return supported_cache_dtype(ck.dtype)

    clip = cfg.qkv_clip if math.isfinite(cfg.qkv_clip) else None

    def _index(arr, layer):
        return jax.lax.dynamic_index_in_dim(arr, layer, 0, keepdims=False)

    def _act_fn(g):
        if cfg.act == "silu":
            return jax.nn.silu(g)
        return jax.nn.gelu(g, approximate=True)

    def body(carry, layer):
        x, ck, cv, ks, vs = carry

        # --- attention --- (rmsnorm folds into the matmul kernel prologue
        # at decode shapes; see mm)
        g = cfg.n_heads // cfg.n_kv_heads
        qkv = mm(x, lp.wqkv, layer, norm_sw=lp.attn_norm)
        if lp.bqkv is not None:
            # Qwen2-family attention bias (fused row order matches wqkv)
            qkv = qkv + _index(lp.bqkv, layer)
        q, k, v = split_qkv_rows(qkv, -1, g, cfg.head_dim)
        if clip is not None:
            q = jnp.clip(q, -clip, clip)
            k = jnp.clip(k, -clip, clip)
            v = jnp.clip(v, -clip, clip)
        # -1: local head counts under tensor parallelism
        q = q.reshape(b, t, -1, cfg.head_dim)
        k = k.reshape(b, t, -1, cfg.head_dim)
        v = v.reshape(b, t, -1, cfg.head_dim)
        if lp.q_norm is not None:
            # Qwen3 per-head q/k RMS norms before rope (weights carry the
            # converter's rope permutation; the RMS itself is
            # permutation-invariant, so this matches HF exactly)
            q = rmsnorm(q, _index(lp.q_norm, layer), cfg.norm_eps)
            k = rmsnorm(k, _index(lp.k_norm, layer), cfg.norm_eps)
        q = apply_rope(q, positions, freqs)
        k = apply_rope(k, positions, freqs)

        rows = None
        fuse_attn = (
            t == 1 and use_pallas and cfg.attn_softcap == 0.0
            and (ks is not None or _fused_cache_ok(ck))
        )
        if spec_verify:
            # wrapped-ring verify chunk: masked attention, NO cache writes;
            # the chunk's stored-form KV rows come back for spec_commit
            attn_out, rows = _spec_verify_attention(
                q, k, v, ck, cv, ks, vs, layer, kv_pos, cfg, freqs,
                compute_dtype,
            )
        elif fuse_attn:
            # fused kernels: in-place ring write + sink rotation + flash
            # attention; no cache copies exist (ops/pallas_attention.py).
            # Quantized caches use the _q variants (in-VMEM quantize/dequant
            # against the per-row scale planes).
            from xalm_tpu.ops.pallas_attention import (
                fused_decode_attention,
                fused_decode_attention_q,
                rope_cos_sin_plus1,
            )

            active = positions[:, 0] >= s
            if valid is not None:
                active = active & valid[:, 0]
            cexp, sexp = rope_cos_sin_plus1(freqs)
            if ks is not None:
                attn_out, ck, cv, ks, vs = fused_decode_attention_q(
                    q[:, 0], k[:, 0], v[:, 0], ck, cv, ks, vs,
                    layer, kv_pos[:, 0], kv_len[:, 0], active,
                    jnp.asarray(cexp), jnp.asarray(sexp),
                )
            else:
                attn_out, ck, cv = fused_decode_attention(
                    q[:, 0],
                    k[:, 0],
                    v[:, 0],
                    ck,
                    cv,
                    layer,
                    kv_pos[:, 0],
                    kv_len[:, 0],
                    active,
                    jnp.asarray(cexp),
                    jnp.asarray(sexp),
                )
            attn_out = attn_out[:, None]  # (B, 1, q_dim)
        elif (
            t > 1
            and use_pallas
            and ks is None
            and _fused_cache_ok(ck)
            # kernel tiling constraints: q blocks are tq=min(t,128) rows
            # (t must divide evenly) and the (tq*g, hd) scratch wants
            # 8-row-aligned shapes; odd chunk sizes (ring-boundary buckets
            # with non-512-multiple contexts, batcher remainders) fall back
            # to the XLA path instead of tripping kernel asserts
            and (t <= 128 or t % 128 == 0)
            and (min(t, 128) * (q.shape[2] // ck.shape[2])) % 8 == 0
        ):
            # chunked-prefill fast path: contiguous in-place KV writes + a
            # causal flash kernel over the stacked cache — the (T, S) score
            # matrix never exists in HBM (ops/pallas_attention.py).
            from xalm_tpu.ops.pallas_attention import fused_prefill_attention

            ck = _write_chunk(ck, layer, pos, k.astype(ck.dtype), valid, s)
            cv = _write_chunk(cv, layer, pos, v.astype(cv.dtype), valid, s)
            attn_out = fused_prefill_attention(q, ck, cv, layer, pos)
        else:
            if ks is None:
                ck = _write_rows(ck, layer, kv_pos, k.astype(ck.dtype))
                cv = _write_rows(cv, layer, kv_pos, v.astype(cv.dtype))
            else:
                # quantized KV: store int8 codes + per-row scales
                qk, sk = _quantize_rows(k)
                qv, sv = _quantize_rows(v)
                ck = _write_rows(ck, layer, kv_pos, qk)
                cv = _write_rows(cv, layer, kv_pos, qv)
                ks = _write_scales(ks, layer, kv_pos, sk)
                vs = _write_scales(vs, layer, kv_pos, sv)
            if t == 1:
                # sink re-rotation is a per-step operation; chunked (T>1)
                # calls never have wrapped sequences by the chunk contract.
                active = positions[:, 0] >= s
                if valid is not None:
                    active = active & valid[:, 0]
                ck, ks = _rotate_sinks(ck, layer, active, freqs, cfg, ks)

            kl = jax.lax.dynamic_index_in_dim(ck, layer, axis=0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(cv, layer, axis=0, keepdims=False)
            if ks is not None:
                kl = kl.astype(jnp.float32) * _index(ks, layer)[..., None]
                vl = vl.astype(jnp.float32) * _index(vs, layer)[..., None]
            attn_out = attention(q, kl, vl, kv_len, cfg, compute_dtype)
        attn_proj = mm(attn_out, lp.wo, layer)
        if tp_axis is not None:
            # row-parallel wo produced partial sums over the sharded head dim
            attn_proj = jax.lax.psum(attn_proj, tp_axis)
        if lp.post_attn_norm is not None:  # Gemma-2 post-block norm
            attn_proj = rmsnorm(attn_proj, _index(lp.post_attn_norm, layer), cfg.norm_eps)
        x = x + attn_proj

        # --- GLU FFN ---
        if lp.w13e is not None:
            # --- sparse mixture-of-experts FFN (Mixtral; HF
            # modeling_mixtral semantics): f32 router softmax -> top-k of
            # the PROBABILITIES, renormalized. Computed densely over the
            # stacked (E, ...) expert weights with the non-selected experts
            # masked to weight 0 — semantically exact, E/k x the selected
            # FLOPs (the TPU-simple correctness tier; a gathered sparse
            # path is a perf extension).
            xn2 = rmsnorm(x, _index(lp.mlp_norm, layer), cfg.norm_eps)
            wg = _index(lp.wgate, layer).astype(jnp.float32)  # (E, dim)
            rlog = jnp.einsum("btd,ed->bte", xn2, wg)
            probs = jax.nn.softmax(rlog, axis=-1)
            topv, topi = jax.lax.top_k(probs, cfg.n_experts_active)
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
            e_ids = jnp.arange(cfg.n_experts, dtype=jnp.int32)
            wts = jnp.sum(
                topv[..., None] * (topi[..., None] == e_ids), axis=-2
            )  # (B, T, E): renormalized top-k probs, zero elsewhere
            if tp_axis is not None:
                # expert parallelism over the tp axis: the router (replicated)
                # computes full probabilities, each device contributes only
                # its LOCAL experts (non-local weights sliced away are zero
                # in its partial sum) and the shared down psum below sums
                # the expert contributions exactly
                e_loc = lp.w13e.values.shape[1]
                wts = jax.lax.dynamic_slice_in_dim(
                    wts, jax.lax.axis_index(tp_axis) * e_loc, e_loc, axis=-1
                )
            if (
                t == 1 and b == 1 and tp_axis is None and use_pallas
                and (
                    _pallas_ok(lp.w13e)
                    # this branch is t==1-only, so q4 packed experts need
                    # the decode-side a8 opt-in specifically (their dots
                    # are s8 x s8) — same predicate as Engine accounting
                    or (bool(lp.w13e.q4group) and a8_decode)
                )
                and not os.environ.get("XALM_NO_MOE_GATHER")
                # env kills the gather for dense-vs-gathered A/B benches
            ):
                # --- gathered sparse expert decode: stream ONLY the top-k
                # experts' weights. The stacked Pallas kernel indexes the
                # (L*E, ...) flattened expert stacks by layer*E + expert via
                # scalar prefetch — a zero-copy gather, so decode reads k/E
                # of the expert bytes (the dense-masked path below reads all
                # E; at Mixtral's 8-choose-2 that is 4x the FFN traffic).
                from xalm_tpu.ops.pallas_matmul import pallas_qmatmul_stacked_multi

                ne = lp.w13e.values.shape[1]
                w13v_f = lp.w13e.values.reshape(
                    -1, *lp.w13e.values.shape[2:]
                )  # (L*E, 2h, d) — contiguous: a bitcast, not a copy
                w13s_f = (
                    None if lp.w13e.scale is None
                    # shape-aware: per-row (L, E, D) -> (L*E, D); q4 group
                    # scales (L, E, D, Gk) -> (L*E, D, Gk)
                    else lp.w13e.scale.reshape(-1, *lp.w13e.scale.shape[2:])
                )
                w2v_f = lp.w2e.values.reshape(-1, *lp.w2e.values.shape[2:])
                w2s_f = (
                    None if lp.w2e.scale is None
                    else lp.w2e.scale.reshape(-1, *lp.w2e.scale.shape[2:])
                )
                xm = xn2.reshape(1, -1)
                # ONE kernel launch per matmul across all top-k experts:
                # the expert index rides a leading grid dim (scalar
                # prefetch), so expert e+1's tiles prefetch under expert
                # e's dots and the per-expert launch bubbles collapse
                idxs = layer * ne + topi[0, 0, :]
                a13 = pallas_qmatmul_stacked_multi(
                    xm, w13v_f, w13s_f, idxs, q4_group=lp.w13e.q4group
                )  # (k, 2h)
                g_, u_ = split_w13_rows(a13, ffn_chunk(cfg.hidden_dim))
                dn_e = pallas_qmatmul_stacked_multi(
                    _act_fn(g_) * u_, w2v_f, w2s_f, idxs,
                    q4_group=lp.w2e.q4group, shared_x=False,
                )  # (k, d)
                dn = jnp.sum(topv[0, 0, :, None] * dn_e, axis=0, keepdims=True)
                x = x + dn.reshape(1, 1, -1)
                return (x, ck, cv, ks, vs), rows
            def _expert_mat(qw, layer):
                # q4 expert stacks dequantize per layer here (the dense-
                # masked correctness tier — prefill / A-B / CPU); the
                # gathered decode path above streams them packed instead
                v = _index(qw.values, layer)
                if qw.q4group:
                    s = _index(qw.scale, layer)
                    return QWeight(v, s, q4group=qw.q4group).astype_dequant(
                        compute_dtype
                    ), None
                return v.astype(compute_dtype), (
                    None if qw.scale is None else _index(qw.scale, layer)
                )
            w13v, w13s = _expert_mat(lp.w13e, layer)  # (E, 2h, d)
            a13 = jnp.einsum(
                "btd,ehd->bteh",
                xn2.astype(compute_dtype),
                w13v,
                preferred_element_type=jnp.float32,
            )
            if w13s is not None:
                a13 = a13 * w13s[None, None]
            gate, up = split_w13_rows(a13, ffn_chunk(cfg.hidden_dim))
            acte = _act_fn(gate)
            w2v, w2s = _expert_mat(lp.w2e, layer)  # (E, d, h)
            down_e = jnp.einsum(
                "bteh,edh->bted",
                (acte * up).astype(compute_dtype),
                w2v,
                preferred_element_type=jnp.float32,
            )
            if w2s is not None:
                down_e = down_e * w2s[None, None]
            down = jnp.einsum("bted,bte->btd", down_e, wts)
        else:
            # fused gate/up stream, chunk-interleaved (LayerParams.w13);
            # mlp rmsnorm folds into the kernel prologue at decode shapes
            gate, up = split_w13_rows(
                mm(x, lp.w13, layer, norm_sw=lp.mlp_norm), ffn_chunk(cfg.hidden_dim)
            )
            down = mm(_act_fn(gate) * up, lp.w2, layer)
        if tp_axis is not None:
            # row-parallel w2: partial sums over the sharded hidden dim
            down = jax.lax.psum(down, tp_axis)
        if lp.post_mlp_norm is not None:  # Gemma-2 post-block norm
            down = rmsnorm(down, _index(lp.post_mlp_norm, layer), cfg.norm_eps)
        x = x + down
        return (x, ck, cv, ks, vs), rows

    if pp_axis is not None:
        # --- pipeline parallelism (capacity mode): the stacked layer dim is
        # sharded over the `pp` mesh axis; each device holds L/PP layers and
        # their KV cache slice, so weights AND cache memory divide by PP.
        # Inference pp is inherently sequential for one sequence: PP
        # sequencing ticks run here, each device executing its LOCAL stack
        # and keeping the result only on the tick where it is the active
        # stage; a ppermute ring hands the residual to the next stage. (All
        # devices compute every tick — the idle stages' work is discarded,
        # same wall-clock as hardware-idle pipelining; microbatch overlap is
        # the standard extension and left to the batcher's dp axis.)
        pp = jax.lax.axis_size(pp_axis)
        me = jax.lax.axis_index(pp_axis)
        l_local = lp.wqkv.values.shape[0]
        layer_ids = jnp.arange(l_local, dtype=jnp.int32)
        def run_stack(x_in):
            (y, ck2, cv2, ks2, vs2), _ = jax.lax.scan(
                body, (x_in, cache.k, cache.v, cache.k_scale, cache.v_scale),
                layer_ids,
            )
            return y, ck2, cv2, ks2, vs2

        ck, cv, ks, vs = cache.k, cache.v, cache.k_scale, cache.v_scale
        ring = [(i, (i + 1) % pp) for i in range(pp)]
        for s_ in range(pp):
            y, ck2, cv2, ks2, vs2 = run_stack(x)
            keep = me == s_  # this tick's active stage keeps its outputs
            x = jnp.where(keep, y, x)
            ck = jnp.where(keep, ck2, ck)
            cv = jnp.where(keep, cv2, cv)
            if ks is not None:
                ks = jnp.where(keep, ks2, ks)
                vs = jnp.where(keep, vs2, vs)
            x = jax.lax.ppermute(x, pp_axis, ring)
        # after the last ppermute the final stage's residual sits on device
        # 0; mask+psum broadcasts it so every device computes the logits
        x = jax.lax.psum(jnp.where(me == 0, x, jnp.zeros_like(x)), pp_axis)
    else:
        layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
        (x, ck, cv, ks, vs), rows_l = jax.lax.scan(
            body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale), layer_ids
        )
    new_cache = KVCache(k=ck, v=cv, k_scale=ks, v_scale=vs)

    if spec_verify:
        # rows_l: per-layer stored-form chunk KV, stacked (L, B, T, K, ...);
        # the cache itself is unmodified (spec_commit scatters the accepted
        # prefix). Logits come back "all" for the acceptance argmax.
        assert tp_axis is None and pp_axis is None and logits_mode == "all"
        xn_v = rmsnorm(x, params.out_norm, cfg.norm_eps)
        logits_v = mm(xn_v, params.wcls)
        if cfg.logit_softcap:
            logits_v = jnp.tanh(logits_v / cfg.logit_softcap) * cfg.logit_softcap
        return logits_v, new_cache, rows_l

    if logits_mode == "none":
        return None, new_cache
    if logits_mode in ("last", "token"):
        x = x[:, -1:]
    xn = rmsnorm(x, params.out_norm, cfg.norm_eps)
    logits = mm(xn, params.wcls)
    if cfg.logit_softcap:
        logits = jnp.tanh(logits / cfg.logit_softcap) * cfg.logit_softcap
    if logits_mode in ("last", "token"):
        logits = logits[:, 0]
    if logits_mode == "token":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_cache
    return logits, new_cache
