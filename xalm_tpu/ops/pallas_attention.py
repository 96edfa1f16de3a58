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
from xalm_tpu.ops.lowering import interpret_mode
from jax.experimental.pallas import tpu as pltpu

from xalm_tpu.models.config import KV_SINKS

__all__ = [
    "fused_decode_attention",
    "fused_decode_attention_q",
    "fused_prefill_attention",
    "rope_cos_sin_plus1",
    "supported_cache_dtype",
]

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


_ROWBLK = 8  # Mosaic's minimal second-to-last tile — the RMW window height
_ROWBLK_I8 = 32  # int8 sublane tile height


def rope_lane(v, cexp, sexp, hd: int):
    """Interleaved-pair rotation, lane-wise: swap[2j] = -v[2j+1],
    swap[2j+1] = v[2j], built from two rolls (Mosaic has no stride-2 lane
    access). Shared by the sink-rotation kernels here and the decode
    megakernel (ops/fused_decode.py) — the sign/roll identity must stay
    bit-identical across them for the kernel-equivalence tests to hold."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    even = (lane % 2) == 0
    sw = jnp.where(even, -pltpu.roll(v, hd - 1, 1), pltpu.roll(v, 1, 1))
    return v * cexp + sw * sexp


def _quant_rows_f32(vals, axis=-1):
    """f32 -> (int8 codes, f32 per-row scale), absmax/127 (the `i8` scheme).
    Integer cast routes through int32 (Mosaic's native width)."""
    amax = jnp.max(jnp.abs(vals), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(vals / scale), -127, 127)
    return q.astype(jnp.int32).astype(jnp.int8), scale


# --------------------------------------------------------------------------
# quantized-cache (int8 + per-row scale) kernel set: one grid cell per batch
# row for the updates (blocks carry all K heads so the (L,B,K,S) f32 scale
# planes tile legally: their last two block dims are (K, S) = whole), plus a
# flash attention pass with per-row dequant in VMEM.
# --------------------------------------------------------------------------


def _insert_q_kernel(
    layer_ref, blk_ref, kv_pos_ref,  # scalar prefetch
    knew_ref, vnew_ref, kin_ref, vin_ref, ksin_ref, vsin_ref,  # inputs
    kout_ref, vout_ref, ksout_ref, vsout_ref,  # outputs (all aliased)
    *, hd: int, kh: int, rowblk: int,
):
    """All math in 2-D (K folded into rows): Mosaic's well-trodden layouts.
    3-D broadcasts with trailing newaxis fail to lower at small shapes."""
    b = pl.program_id(0)
    kvp = kv_pos_ref[b]
    base = blk_ref[b] * rowblk
    n = kh * rowblk

    def ins(new_ref, win_ref, sin_ref, wout_ref, sout_ref):
        vals = new_ref[0]  # (K, hd) f32
        codes, scale = _quant_rows_f32(vals)  # codes (K, hd); scale (K, 1)
        win = win_ref[0, 0].reshape(n, hd)  # K-major rows of the window
        # row r of head k sits at flat index k*rowblk + r
        flat = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        is_new = (base + flat % rowblk) == kvp  # sentinel kvp==S_logical: no hit
        head = flat // rowblk  # (n, 1)
        # replicate each head's new row across its window rows via a matmul
        # (one-hot (n, K) @ codes (K, hd)) — layout-friendly, no 3-D bcast
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (n, kh), 1) == head).astype(jnp.float32)
        rep = jax.lax.dot_general(
            onehot, codes.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.int8)
        wout_ref[0, 0] = jnp.where(is_new, rep, win).reshape(kh, rowblk, hd)
        stripe = sin_ref[0, 0]  # (K, S) f32
        cols = jax.lax.broadcasted_iota(jnp.int32, stripe.shape, 1)
        sout_ref[0, 0] = jnp.where(cols == kvp, scale, stripe)

    ins(knew_ref, kin_ref, ksin_ref, kout_ref, ksout_ref)
    ins(vnew_ref, vin_ref, vsin_ref, vout_ref, vsout_ref)


def _sink_q_kernel(
    layer_ref, rotate_ref,  # scalar prefetch
    cexp_ref, sexp_ref, kin_ref, ksin_ref,  # inputs (aliased to outputs)
    kout_ref, ksout_ref,
    *, hd: int, kh: int, rowblk: int,
):
    b = pl.program_id(0)
    rot = rotate_ref[b]
    n = kh * rowblk
    codes = kin_ref[0, 0].reshape(n, hd)  # (K*rowblk, hd) int8, K-major
    stripe = ksin_ref[0, 0]  # (K, S) f32
    # per-flat-row scale stripe[k, r] for flat = k*rowblk + r. A reshape to a
    # (n, 1) column is an unsupported Mosaic shape cast (lane-collapse), so
    # build it with lane-preserving one-hot matmul + masked row reduction.
    flat = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_in = flat % rowblk
    head = flat // rowblk
    onehot_head = (jax.lax.broadcasted_iota(jnp.int32, (n, kh), 1) == head).astype(jnp.float32)
    swin = jax.lax.dot_general(
        onehot_head, stripe[:, :rowblk], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (n, rowblk): row f carries head(f)'s first-rowblk scales
    col_pick = jax.lax.broadcasted_iota(jnp.int32, (n, rowblk), 1) == row_in
    rowscale = jnp.sum(jnp.where(col_pick, swin, 0.0), axis=1, keepdims=True)

    vals = codes.astype(jnp.float32) * rowscale
    rotated = rope_lane(vals, cexp_ref[0][None, :], sexp_ref[0][None, :], hd)
    rq, rscale = _quant_rows_f32(rotated)  # (n, hd), (n, 1)
    live = (row_in < KV_SINKS) & (rot != 0)
    kout_ref[0, 0] = jnp.where(live, rq, codes).reshape(kh, rowblk, hd)

    # write back the requantized sink scales; (n,1)->(K,rowblk) is again a
    # lane-collapse, so place each value at its column then project per head
    s = stripe.shape[1]
    placed = jnp.where(col_pick, rscale, 0.0)  # (n, rowblk)
    rtab = jax.lax.dot_general(
        onehot_head, placed, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, rowblk)
    kcols = jax.lax.broadcasted_iota(jnp.int32, (kh, s), 1)
    slive = (kcols < KV_SINKS) & (rot != 0)
    if s > rowblk:
        padded = jnp.concatenate(
            [rtab, jnp.zeros((kh, s - rowblk), jnp.float32)], axis=1
        )
    else:
        padded = rtab
    ksout_ref[0, 0] = jnp.where(slive, padded, stripe)


def _batch_mask_cols(kv_len_ref, b: int, sb: int, t):
    """(1, b*sb) per-column live-position count: column c belongs to batch
    row c // sb and covers cache slot t*sb + c % sb. Built from the
    scalar-prefetched kv_len with b cheap lane selects (the only remaining
    per-batch work — O(b) selects, not O(b) MXU dots)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, b * sb), 1)
    col_bi = col // sb
    kvl = jnp.zeros((1, b * sb), jnp.int32)
    for bi in range(b):
        kvl = jnp.where(col_bi == bi, kv_len_ref[bi], kvl)
    pos = t * sb + col % sb
    return col_bi, pos, kvl


def _attn_q_kernel(
    layer_ref, blkmax_ref, kv_len_ref,  # scalar prefetch
    q_ref, kin_ref, vin_ref, ks_ref, vs_ref,  # inputs
    out_ref,
    acc_ref, m_ref, l_ref,
    *, b: int, sb: int, nsb: int, hd: int, g: int,
):
    """Flash-decoding over an int8 cache, batch-vectorized like _attn_kernel
    (grid (kh, nsb); ONE block-diagonal-masked dot for the whole batch).
    Per-row scales factor OUT of both dots so the int8 codes feed the MXU
    directly and dequant is O(sb) per head, not O(sb*hd) — a full VPU
    dequant caps decode at ~240 GB/s (measured; the fp8-dequant trap)."""
    j = pl.program_id(0)
    t = pl.program_id(1)
    bg = b * g
    kvl_max = kv_len_ref[0]
    for bi in range(1, b):
        kvl_max = jnp.maximum(kvl_max, kv_len_ref[bi])

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(t * sb < kvl_max)
    def _block():
        q_all = q_ref[...].reshape(bg, hd).astype(jnp.bfloat16)
        k_all = kin_ref[...].reshape(b * sb, hd)
        v_all = vin_ref[...].reshape(b * sb, hd)
        # per-column scale rows, concatenated on the lane axis (lane-dim
        # concat is layout-free; a (b, sb) -> (1, b*sb) reshape would move
        # sublanes into lanes, which Mosaic rejects)
        kscale = jnp.concatenate(
            [ks_ref[0, bi, pl.ds(j, 1), :] for bi in range(b)], axis=-1
        )  # (1, b*sb)
        vscale = jnp.concatenate(
            [vs_ref[0, bi, pl.ds(j, 1), :] for bi in range(b)], axis=-1
        )
        scores = jax.lax.dot_general(
            q_all, k_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (kscale * (1.0 / math.sqrt(hd)))  # (bg, b*sb)
        col_bi, pos, kvl = _batch_mask_cols(kv_len_ref, b, sb, t)
        row_bi = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) // g
        live = (row_bi == col_bi) & (pos < kvl)
        scores = jnp.where(live, scores, _NEG_INF)
        m_old = m_ref[:bg, :1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        # explicit p mask: in a fully-masked block m_new stays _NEG_INF and
        # exp(scores - m_new) would be 1, not 0 (kv_len == 0 rows)
        p = jnp.where(live, jnp.exp(scores - m_new), 0.0)
        m_ref[:bg, :1] = m_new
        l_ref[:bg, :1] = l_ref[:bg, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:bg, :] = acc_ref[:bg, :] * alpha + jax.lax.dot_general(
            (p * vscale).astype(jnp.bfloat16), v_all,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(t == nsb - 1)
    def _finish():
        l = l_ref[:bg, :1]
        # kv_len == 0 rows have l == 0: emit 0, not 0/0 NaN
        out = acc_ref[:bg, :] / jnp.where(l > 0, l, 1.0)
        out_ref[...] = out.reshape(b, 1, g, hd)


def _attn_kernel(
    layer_ref, blkmax_ref, kv_len_ref,  # scalar prefetch
    q_ref, kin_ref, vin_ref,  # inputs (read-only cache sequence blocks)
    out_ref,  # output
    acc_ref, m_ref, l_ref,  # VMEM scratch, persistent across the t axis
    *, b: int, sb: int, nsb: int, hd: int, g: int,
):
    """Flash-decoding: the sequence axis is grid dimension t over ``sb``-row
    blocks with a running max/denominator, so HBM traffic scales with
    ``kv_len`` instead of the window. Blocks past every sequence's kv_len
    are clamped by the index_map to the last live block (the pipeline skips
    re-fetching an unchanged block) and their compute is skipped.

    The whole batch rides in each block: grid cells are (kh, nsb) —
    independent of B — so batched serving doesn't drown in per-cell launch
    overhead (measured ~0.3 us/cell: a (B, KH, NSB) grid cost ~5 ms/step at
    batch 8). The batch is vectorized as ONE block-diagonal-masked
    (b*g, b*sb) dot rather than b unrolled per-row dots: the off-diagonal
    MXU work is free at decode (HBM-bound, systolic array idle) while
    compile time and code size stop scaling with b (the old unrolled form
    emitted 16 flash updates per cell at the advertised serving batch)."""
    j = pl.program_id(0)
    t = pl.program_id(1)
    del j
    bg = b * g
    kvl_max = kv_len_ref[0]
    for bi in range(1, b):
        kvl_max = jnp.maximum(kvl_max, kv_len_ref[bi])

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(t * sb < kvl_max)
    def _block():
        # f32 MXU inputs on purpose: decode is HBM-bound (the array is idle)
        # and the f32 dot keeps this path bit-comparable with the golden XLA
        # attention at test tolerances
        q_all = q_ref[...].reshape(bg, hd).astype(jnp.float32) * (1.0 / math.sqrt(hd))
        k_all = kin_ref[...].reshape(b * sb, hd).astype(jnp.float32)
        v_all = vin_ref[...].reshape(b * sb, hd).astype(jnp.float32)
        scores = jax.lax.dot_general(
            q_all, k_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bg, b*sb)
        col_bi, pos, kvl = _batch_mask_cols(kv_len_ref, b, sb, t)
        row_bi = jax.lax.broadcasted_iota(jnp.int32, (bg, 1), 0) // g
        live = (row_bi == col_bi) & (pos < kvl)
        scores = jnp.where(live, scores, _NEG_INF)
        m_old = m_ref[:bg, :1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        # explicit p mask: in a fully-masked block m_new stays _NEG_INF and
        # exp(scores - m_new) would be 1, not 0 (kv_len == 0 rows)
        p = jnp.where(live, jnp.exp(scores - m_new), 0.0)
        m_ref[:bg, :1] = m_new
        l_ref[:bg, :1] = l_ref[:bg, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:bg, :] = acc_ref[:bg, :] * alpha + jax.lax.dot_general(
            p, v_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == nsb - 1)
    def _finish():
        l = l_ref[:bg, :1]
        # kv_len == 0 rows have l == 0: emit 0, not 0/0 NaN
        out = acc_ref[:bg, :] / jnp.where(l > 0, l, 1.0)
        out_ref[...] = out.reshape(b, 1, g, hd)


def fused_decode_attention_q(
    q: jax.Array,  # (B, H, hd) f32, rotated
    k_new: jax.Array,  # (B, K, hd) f32, rotated + clipped
    v_new: jax.Array,  # (B, K, hd) f32
    cache_k: jax.Array,  # (L, B, K, S, hd) int8 — updated in place
    cache_v: jax.Array,
    k_scale: jax.Array,  # (L, B, K, S) f32 — updated in place
    v_scale: jax.Array,
    layer: jax.Array,
    kv_pos: jax.Array,  # (B,) int32; logical-S sentinel = dropped write
    kv_len: jax.Array,  # (B,) int32
    rotate: jax.Array,  # (B,) int32/bool
    cexp: jax.Array,  # (1, hd) f32
    sexp: jax.Array,
):
    """Quantized-cache decode step: in-place int8 row insert (quantizing in
    VMEM), sink re-rotation with re-quantization, flash attention with
    per-row dequant. Returns (out (B, H*hd), ck, cv, ks, vs)."""
    l, b, kh, s, hd = cache_k.shape
    h = q.shape[1]
    g = h // kh
    qg = q.reshape(b, kh, g, hd)
    interp = interpret_mode()
    rowblk = _ROWBLK_I8

    layer1 = jnp.asarray(layer, jnp.int32).reshape(1)
    kv_pos = jnp.asarray(kv_pos, jnp.int32)
    blk = jnp.minimum(kv_pos, s - 1) // rowblk

    win_spec = pl.BlockSpec(
        (1, 1, kh, rowblk, hd),
        lambda i, lr, br, *sp: (lr[0], i, 0, br[i], 0),
        memory_space=pltpu.VMEM,
    )
    stripe_spec = pl.BlockSpec(
        (1, 1, kh, s), lambda i, lr, *sp: (lr[0], i, 0, 0), memory_space=pltpu.VMEM
    )
    new_spec = pl.BlockSpec((1, kh, hd), lambda i, *sp: (i, 0, 0), memory_space=pltpu.VMEM)

    ck, cv, ks, vs = pl.pallas_call(
        functools.partial(_insert_q_kernel, hd=hd, kh=kh, rowblk=rowblk),
        out_shape=(
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b,),
            in_specs=[new_spec, new_spec, win_spec, win_spec, stripe_spec, stripe_spec],
            out_specs=[win_spec, win_spec, stripe_spec, stripe_spec],
        ),
        # inputs counted incl. 3 scalar-prefetch args
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interp,
    )(layer1, blk, kv_pos, k_new, v_new, cache_k, cache_v, k_scale, v_scale)

    sink_win = pl.BlockSpec(
        (1, 1, kh, rowblk, hd), lambda i, lr, *sp: (lr[0], i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((1, hd), lambda i, *sp: (0, 0), memory_space=pltpu.VMEM)
    ck, ks = pl.pallas_call(
        functools.partial(_sink_q_kernel, hd=hd, kh=kh, rowblk=rowblk),
        out_shape=(
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[vec_spec, vec_spec, sink_win, stripe_spec],
            out_specs=[sink_win, stripe_spec],
        ),
        input_output_aliases={4: 0, 5: 1},
        interpret=interp,
    )(layer1, jnp.asarray(rotate, jnp.int32), cexp, sexp, ck, ks)

    # flash attention: sequence block must be a multiple of 128 lanes for the
    # (K, sb) scale blocks (or the whole window)
    sb = 512
    while sb > 128 and s % sb != 0:
        sb //= 2
    if s % sb != 0:
        sb = s
    nsb = s // sb
    kv_len = jnp.asarray(kv_len, jnp.int32)
    # batched kernel: one sequence-block index per cell (max over the batch;
    # shorter sequences mask their tail rows)
    blkmax = jnp.max(jnp.maximum(kv_len - 1, 0))[None] // sb
    rows_p = -(-(b * g) // _ROWBLK) * _ROWBLK  # scratch rows, sublane-padded

    seq_spec = pl.BlockSpec(
        (1, b, 1, sb, hd),
        lambda j, t, lr, bm, *sp: (lr[0], 0, j, jnp.minimum(t, bm[0]), 0),
        memory_space=pltpu.VMEM,
    )
    sscale_spec = pl.BlockSpec(
        (1, b, kh, sb),
        lambda j, t, lr, bm, *sp: (lr[0], 0, 0, jnp.minimum(t, bm[0])),
        memory_space=pltpu.VMEM,
    )
    def attn_call(nsb_eff: int):
        return pl.pallas_call(
            functools.partial(_attn_q_kernel, b=b, sb=sb, nsb=nsb_eff, hd=hd, g=g),
            out_shape=jax.ShapeDtypeStruct((b, kh, g, hd), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(kh, nsb_eff),
                in_specs=[
                    pl.BlockSpec((b, 1, g, hd), lambda j, t, *sp: (0, j, 0, 0), memory_space=pltpu.VMEM),
                    seq_spec,
                    seq_spec,
                    sscale_spec,
                    sscale_spec,
                ],
                out_specs=pl.BlockSpec((b, 1, g, hd), lambda j, t, *sp: (0, j, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((rows_p, hd), jnp.float32),
                    pltpu.VMEM((rows_p, 128), jnp.float32),
                    pltpu.VMEM((rows_p, 128), jnp.float32),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interp,
        )(layer1, blkmax, kv_len, qg, ck, cv, ks, vs)

    out = _tiered(attn_call, nsb, blkmax)
    return out.reshape(b, h * hd), ck, cv, ks, vs


def _n_tiers() -> int:
    """Flash-grid context-tier count (XALM_ATTN_TIERS overrides; perf knob —
    each tier is a separately Mosaic-compiled program, see _tiered)."""
    import os

    return max(1, int(os.environ.get("XALM_ATTN_TIERS", "3")))


def _tiered(attn_call, nsb: int, blkmax):
    """Run the flash grid at a context-sized tier: short contexts (the
    common serving regime) iterate 1 sequence-block cell per head instead
    of nsb mostly-skipped ones (~10 us/layer/step of pure cell overhead at
    a 4k window); mid contexts use nsb/2. The index maps already clamp
    block fetches to blkmax, so every tier computes identically."""
    n = _n_tiers()
    if nsb <= 1 or n == 1:
        return attn_call(nsb)
    tiers = [1, nsb] if (nsb < 4 or n == 2) else [1, nsb // 2, nsb]
    idx = sum(jnp.int32(blkmax[0] >= t) for t in tiers[:-1])
    return jax.lax.switch(idx, [functools.partial(attn_call, t) for t in tiers])


def _update_kernel(
    layer_ref, blk_ref, kv_pos_ref, rot_ref,  # scalar prefetch
    knew_ref, vnew_ref, cexp_ref, sexp_ref, kin_ref, vin_ref,  # inputs
    kout_ref, vout_ref,  # outputs (aliased windows)
    *, hd: int,
):
    """Merged ring-insert + sink-rotation: grid (B, KH, 2). Cell jc=0 inserts
    the new K/V row into the 8-row window holding kv_pos; cell jc=1
    re-rotates the sink keys in window 0 (V written back unchanged — its
    window index stays constant across jc, so the block never re-fetches).
    One kernel instead of two saves a launch + pipeline ramp per layer per
    step (~2.5 us each, x32 layers).

    Each cell computes its window's FINAL content from (window, new row)
    idempotently — correct whether the block it reads is the original HBM
    data or a VMEM copy already updated by the other cell (both windows
    coincide when kv_pos < 8). Insert and rotation touch disjoint rows
    whenever rotation is active (wrapped => kv_pos lands in ring slots
    >= KV_SINKS), so insert-then-rotate composes in either order."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    jc = pl.program_id(2)
    kwin = kin_ref[0, 0, 0]  # (_ROWBLK, hd)
    vwin = vin_ref[0, 0, 0]
    kvp = kv_pos_ref[b]
    rows = jax.lax.broadcasted_iota(jnp.int32, (_ROWBLK, 1), 0)

    @pl.when(jc == 0)
    def _insert():
        is_new = blk_ref[b] * _ROWBLK + rows == kvp  # sentinel kvp==S: no hit
        kout_ref[0, 0, 0] = jnp.where(
            is_new, knew_ref[0, pl.ds(j, 1), :].astype(kwin.dtype), kwin
        )
        vout_ref[0, 0, 0] = jnp.where(
            is_new, vnew_ref[0, pl.ds(j, 1), :].astype(vwin.dtype), vwin
        )

    @pl.when(jc == 1)
    def _sink():
        # K window 0: re-apply the insert for rows landing here (idempotent),
        # then rotate the sinks; V window (insert block): re-apply the insert
        rot = rot_ref[b]
        k0 = jnp.where(
            rows == kvp, knew_ref[0, pl.ds(j, 1), :].astype(kwin.dtype), kwin
        ).astype(jnp.float32)
        rotated = rope_lane(k0, cexp_ref[0][None, :], sexp_ref[0][None, :], hd)
        k0 = jnp.where((rows < KV_SINKS) & (rot != 0), rotated, k0)
        kout_ref[0, 0, 0] = k0.astype(kout_ref.dtype)
        is_new = blk_ref[b] * _ROWBLK + rows == kvp
        vout_ref[0, 0, 0] = jnp.where(
            is_new, vnew_ref[0, pl.ds(j, 1), :].astype(vwin.dtype), vwin
        )


def _prefill_kernel(
    layer_ref, pos_ref,  # scalar prefetch
    q_ref, kin_ref, vin_ref,  # inputs
    out_ref,
    acc_ref, m_ref, l_ref,  # VMEM scratch, persistent across the kb axis
    *, kh: int, tq: int, g: int, sk: int, nkb: int, hd: int, compute_dtype,
):
    """Causal flash attention for chunked prefill over the stacked cache.

    Grid (B*KH, nqb, nkb): one cell handles a (tq queries x sk cache rows)
    tile for one (batch, kv-head) pair. Queries ride as (tq*g, hd) rows
    (GQA group flattened); query ti at absolute position pos_b + qb*tq + ti
    sees cache slots < pos_b + qb*tq + ti + 1 — causality via the chunk
    contract (T > 1 calls never wrap the ring, models/llama.py docstring).
    Cache blocks past the tile's last visible slot are clamped by the
    index_map and their compute skipped, so HBM traffic is ~half the naive
    O(T*S) and the (T, S) score matrix never exists in HBM (the XLA einsum
    path materializes ~B*KH*G*T*S*4 bytes of scores per layer — the measured
    prefill bottleneck)."""
    j = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    bi = j // kh
    pos_b = pos_ref[bi]
    rows = tq * g

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb * sk < pos_b + qb * tq + tq)
    def _block():
        q = q_ref[0, 0].astype(compute_dtype)  # (tq*g, hd)
        kv = kin_ref[0, 0, 0].astype(compute_dtype)  # (sk, hd)
        vv = vin_ref[0, 0, 0].astype(compute_dtype)
        scores = jax.lax.dot_general(
            q, kv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (1.0 / math.sqrt(hd))  # (rows, sk)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (rows, sk), 0) // g
        col_s = kb * sk + jax.lax.broadcasted_iota(jnp.int32, (rows, sk), 1)
        visible = col_s < (pos_b + qb * tq + row_t + 1)
        scores = jnp.where(visible, scores, _NEG_INF)
        m_old = m_ref[:, :1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.where(visible, jnp.exp(scores - m_new), 0.0)
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(compute_dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == nkb - 1)
    def _finish():
        l = l_ref[:, :1]
        out_ref[0, 0] = acc_ref[...] / jnp.where(l > 0, l, 1.0)


def fused_prefill_attention(
    q: jax.Array,  # (B, T, H, hd) f32, rotated
    cache_k: jax.Array,  # (L, B, K, S, hd) bf16/f32 — already holds the chunk
    cache_v: jax.Array,
    layer: jax.Array,  # scalar int32
    pos: jax.Array,  # (B,) int32 — absolute position of q[:, 0]; no wrap
) -> jax.Array:
    """Returns attention output (B, T, H*hd) f32. Precondition: the chunk's
    K/V rows are already written at [pos, pos+T) (contiguous; the T > 1
    chunk contract guarantees no ring wrap)."""
    l, b, kh, s, hd = cache_k.shape
    _, t, h, _ = q.shape
    g = h // kh
    interp = interpret_mode()

    tq = min(t, 128)
    assert t % tq == 0, (t, tq)
    nqb = t // tq
    sk = 512
    while sk > 8 and s % sk != 0:
        sk //= 2
    sk = min(sk, s)
    nkb = s // sk

    layer1 = jnp.asarray(layer, jnp.int32).reshape(1)
    pos = jnp.asarray(pos, jnp.int32)
    # f32 caches (tests/golden paths) keep f32 MXU inputs; bf16 caches use
    # bf16 (4x MXU peak) with f32 softmax/accumulation either way
    compute_dtype = jnp.float32 if cache_k.dtype == jnp.float32 else jnp.bfloat16

    # (B, KH, T*G, hd): kernel math stays 2-D per block
    qg = q.reshape(b, t, kh, g, hd).transpose(0, 2, 1, 3, 4).reshape(b, kh, t * g, hd)

    def kv_idx(j, qb, kb, lr, ps):
        bi = j // kh
        last = ps[bi] + qb * tq + tq - 1  # last visible slot for this tile
        return (lr[0], bi, j % kh, jnp.minimum(kb, last // sk), 0)

    out = pl.pallas_call(
        functools.partial(
            _prefill_kernel, kh=kh, tq=tq, g=g, sk=sk, nkb=nkb, hd=hd,
            compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((b, kh, t * g, hd), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * kh, nqb, nkb),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, tq * g, hd),
                    lambda j, qb, kb, *sp: (j // kh, j % kh, qb, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1, 1, sk, hd), kv_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, sk, hd), kv_idx, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, tq * g, hd),
                lambda j, qb, kb, *sp: (j // kh, j % kh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((tq * g, hd), jnp.float32),
                pltpu.VMEM((tq * g, 128), jnp.float32),
                pltpu.VMEM((tq * g, 128), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interp,
    )(layer1, pos, qg, cache_k, cache_v)
    # (B, KH, T*G, hd) -> (B, T, H*hd)
    return (
        out.reshape(b, kh, t, g, hd).transpose(0, 2, 1, 3, 4).reshape(b, t, h * hd)
    )


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
    """Returns (attn_out (B, H*hd) f32, cache_k', cache_v').

    Three kernels, not one: an 8-row in-place insert (K and V), an 8-row
    in-place sink re-rotation (K only), then a read-only attention pass.
    The old single-kernel design wrote the full (S, hd) stripes back every
    step — ~0.5 GB/token of pure write traffic for a 7B model at a 4k
    window; splitting the writes into 8-row windows removes it while the
    aliased outputs keep the cache update copy-free.
    """
    l, b, kh, s, hd = cache_k.shape
    h = q.shape[1]
    g = h // kh
    qg = q.reshape(b, kh, g, hd)
    interp = interpret_mode()

    layer1 = jnp.asarray(layer, jnp.int32).reshape(1)
    kv_pos = jnp.asarray(kv_pos, jnp.int32)
    # row-block holding kv_pos; the kvp==S dropped-write sentinel clamps to
    # the last block and then matches no row inside the kernel
    blk = jnp.minimum(kv_pos, s - 1) // _ROWBLK

    # merged insert + sink-rotation: K windows switch to block 0 on the sink
    # cell (jc == 1); V windows stay on the insert block so the VMEM copy is
    # written back unchanged without a re-fetch
    kwin_spec = pl.BlockSpec(
        (1, 1, 1, _ROWBLK, hd),
        lambda i, j, jc, lr, br, *sp: (lr[0], i, j, jnp.where(jc == 0, br[i], 0), 0),
        memory_space=pltpu.VMEM,
    )
    vwin_spec = pl.BlockSpec(
        (1, 1, 1, _ROWBLK, hd),
        lambda i, j, jc, lr, br, *sp: (lr[0], i, j, br[i], 0),
        memory_space=pltpu.VMEM,
    )
    new_spec = pl.BlockSpec(
        (1, kh, hd), lambda i, j, jc, *sp: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (1, hd), lambda i, j, jc, *sp: (0, 0), memory_space=pltpu.VMEM
    )
    ck, cv = pl.pallas_call(
        functools.partial(_update_kernel, hd=hd),
        out_shape=(
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, kh, 2),
            in_specs=[new_spec, new_spec, vec_spec, vec_spec, kwin_spec, vwin_spec],
            out_specs=[kwin_spec, vwin_spec],
        ),
        # inputs counted incl. 4 scalar-prefetch args: 8=cache_k, 9=cache_v
        input_output_aliases={8: 0, 9: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interp,
    )(
        layer1, blk, kv_pos, jnp.asarray(rotate, jnp.int32),
        k_new, v_new, cexp, sexp, cache_k, cache_v,
    )

    # flash-decoding sequence blocking: pick the largest power-of-two block
    # <= 512 rows dividing the window (1024 measured neutral)
    sb = 512
    while sb > _ROWBLK and s % sb != 0:
        sb //= 2
    sb = min(sb, s)
    nsb = s // sb
    kv_len = jnp.asarray(kv_len, jnp.int32)
    # last live block across the WHOLE batch: the batched kernel shares one
    # sequence-block index per cell; shorter sequences mask their tail rows
    blkmax = jnp.max(jnp.maximum(kv_len - 1, 0))[None] // sb

    rows_p = -(-(b * g) // _ROWBLK) * _ROWBLK  # scratch rows, sublane-padded
    seq_spec = pl.BlockSpec(
        (1, b, 1, sb, hd),
        lambda j, t, lr, bm, *sp: (lr[0], 0, j, jnp.minimum(t, bm[0]), 0),
        memory_space=pltpu.VMEM,
    )

    def attn_call(nsb_eff: int):
        return pl.pallas_call(
            functools.partial(_attn_kernel, b=b, sb=sb, nsb=nsb_eff, hd=hd, g=g),
            out_shape=jax.ShapeDtypeStruct((b, kh, g, hd), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(kh, nsb_eff),
                in_specs=[
                    pl.BlockSpec((b, 1, g, hd), lambda j, t, *sp: (0, j, 0, 0), memory_space=pltpu.VMEM),
                    seq_spec,
                    seq_spec,
                ],
                out_specs=pl.BlockSpec((b, 1, g, hd), lambda j, t, *sp: (0, j, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((rows_p, hd), jnp.float32),
                    pltpu.VMEM((rows_p, 128), jnp.float32),
                    pltpu.VMEM((rows_p, 128), jnp.float32),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interp,
        )(layer1, blkmax, kv_len, qg, ck, cv)

    out = _tiered(attn_call, nsb, blkmax)
    return out.reshape(b, h * hd), ck, cv
