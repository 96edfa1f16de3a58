"""Fused decode attention: KV ring write + sink re-rotation + GQA attention.

One Pallas kernel per (batch, kv-head) grid cell does, over the head's
contiguous (S, head_dim) cache stripe:

1. insert the new K/V row at ``kv_pos`` (ring write; out-of-bounds sentinel
   rows — padded/inactive slots — match nothing and write nothing),
2. re-rotate the KV_SINKS pinned sink keys by +1 position for wrapped
   sequences (StreamingLLM, reference infer.cpp:416-431),
3. masked softmax(q K^T / sqrt(hd)) V over ``kv_len`` slots for the head's
   GQA query group (reference attn, infer.cpp:325-359),

writing the updated stripe back through an **aliased** output — the cache is
updated in place, so the per-step HBM traffic is exactly one read + one
write of the stripes touched. This replaces the XLA scatter +
dynamic-update-slice + slice-read chain, whose aliasing XLA could not prove,
costing a full cache copy per layer per step (measured; SURVEY.md §7
predicted exactly this hazard: "ring-buffer KV writes under jit ... likely
folded into the attention kernel").

Like the matmul kernel, the cache stays stacked (L, B, K, S, hd) and the
layer is selected by a scalar-prefetch index — no per-layer slicing exists.

The sink re-rotation uses the interleaved-pair identity
``rot(x)[2j] = x[2j] c_j - x[2j+1] s_j;  rot(x)[2j+1] = x[2j] s_j + x[2j+1] c_j``
expressed lane-wise with a pair-swap built from two rolls (Mosaic has no
stride-2 lane access): ``swap = where(even_lane, -roll(x,-1), roll(x,+1))``.

Cache dtype must be bf16 or f32 on TPU (Mosaic has no f16).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xalm_tpu.models.config import KV_SINKS

__all__ = ["fused_decode_attention", "rope_cos_sin_plus1", "supported_cache_dtype"]

_NEG_INF = -1e30


def supported_cache_dtype(dtype) -> bool:
    return jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32))


def rope_cos_sin_plus1(freqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Lane-expanded cos/sin of a +1-position rotation: entry i carries
    cos/sin(freq_{i//2}); freq 0 (the unrotated tail) yields identity."""
    c = np.cos(freqs)
    s = np.sin(freqs)
    cexp = np.repeat(c, 2).astype(np.float32)
    sexp = np.repeat(s, 2).astype(np.float32)
    return cexp[None, :], sexp[None, :]  # (1, hd) — 2D for SMEM/VMEM tiling


def _kernel(
    layer_ref, kv_pos_ref, kv_len_ref, rotate_ref,  # scalar prefetch
    q_ref, knew_ref, vnew_ref, cexp_ref, sexp_ref, kin_ref, vin_ref,  # inputs
    out_ref, kout_ref, vout_ref,  # outputs
    *, s: int, hd: int, g: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    kvp = kv_pos_ref[b]
    kvl = kv_len_ref[b]
    rot = rotate_ref[b]

    kv = kin_ref[0, 0, 0].astype(jnp.float32)  # (S, hd)
    vv = vin_ref[0, 0, 0].astype(jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    is_new = row_ids == kvp  # out-of-bounds sentinel (kvp==S) matches nothing
    # knew/vnew blocks carry all K heads (Mosaic needs the 2nd-minor dim
    # whole); select this grid cell's head with a dynamic row slice
    knew_row = knew_ref[0, pl.ds(j, 1), :]  # (1, hd)
    vnew_row = vnew_ref[0, pl.ds(j, 1), :]
    kv = jnp.where(is_new, knew_row, kv)
    vv = jnp.where(is_new, vnew_row, vv)

    # sink re-rotation (+1 position) on rows < KV_SINKS of K when wrapped
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, hd), 1)
    even = (lane % 2) == 0
    # pltpu.roll wants non-negative shifts: roll by -1 == roll by hd-1
    swapped = jnp.where(even, -pltpu.roll(kv, hd - 1, 1), pltpu.roll(kv, 1, 1))
    rotated = kv * cexp_ref[0][None, :] + swapped * sexp_ref[0][None, :]
    kv = jnp.where((row_ids < KV_SINKS) & (rot != 0), rotated, kv)

    kout_ref[0, 0, 0] = kv.astype(kout_ref.dtype)
    vout_ref[0, 0, 0] = vv.astype(vout_ref.dtype)

    q = q_ref[0, 0].astype(jnp.float32) * (1.0 / math.sqrt(hd))  # (G, hd)
    scores = jax.lax.dot_general(
        q, kv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G, S)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) < kvl)
    scores = jnp.where(mask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        att, vv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G, hd)
    out_ref[0, 0] = out


def fused_decode_attention(
    q: jax.Array,  # (B, H, hd) f32, rotated
    k_new: jax.Array,  # (B, K, hd) f32, rotated + clipped
    v_new: jax.Array,  # (B, K, hd) f32
    cache_k: jax.Array,  # (L, B, K, S, hd) bf16/f32 — updated in place
    cache_v: jax.Array,
    layer: jax.Array,  # scalar int32
    kv_pos: jax.Array,  # (B,) int32; S = dropped write (inactive slot)
    kv_len: jax.Array,  # (B,) int32
    rotate: jax.Array,  # (B,) int32/bool — sink rotation active
    cexp: jax.Array,  # (1, hd) f32
    sexp: jax.Array,  # (1, hd) f32
):
    """Returns (attn_out (B, H*hd) f32, cache_k', cache_v')."""
    l, b, kh, s, hd = cache_k.shape
    h = q.shape[1]
    g = h // kh
    qg = q.reshape(b, kh, g, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, kh),
        in_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda i, j, *sp: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, hd), lambda i, j, *sp: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, hd), lambda i, j, *sp: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), lambda i, j, *sp: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd), lambda i, j, *sp: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, hd), lambda i, j, lr, *sp: (lr[0], i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, hd), lambda i, j, lr, *sp: (lr[0], i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, g, hd), lambda i, j, *sp: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, hd), lambda i, j, lr, *sp: (lr[0], i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, hd), lambda i, j, lr, *sp: (lr[0], i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    kern = functools.partial(_kernel, s=s, hd=hd, g=g)
    out, ck, cv = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b, kh, g, hd), jnp.float32),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ),
        grid_spec=grid_spec,
        # inputs counted including the 4 scalar-prefetch args:
        # 9 = cache_k -> output 1, 10 = cache_v -> output 2 (in place)
        input_output_aliases={9: 1, 10: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(kv_pos, jnp.int32),
        jnp.asarray(kv_len, jnp.int32),
        jnp.asarray(rotate, jnp.int32),
        qg, k_new, v_new, cexp, sexp, cache_k, cache_v,
    )
    return out.reshape(b, h * hd), ck, cv
