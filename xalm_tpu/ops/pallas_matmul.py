"""Fused dequant+matmul Pallas kernel — the decode hot path.

TPU-native replacement for the reference's templated dequant-and-dot matvec
(reference src/infer.cpp:104-222): quantized weight tiles stream HBM->VMEM
through the Pallas pipeline (double-buffered by the grid), are dequantized
in VMEM registers, and hit the MXU — the dequantized matrix never exists in
HBM, so bytes moved per token = quantized weight bytes, which is what the
>=90%-of-roofline target requires (BASELINE.json).

Key design point: weights stay **stacked** (L, D, N) and the layer is chosen
by a scalar-prefetch index feeding the BlockSpec index_map. The layer scan
never slices the weight array, so XLA never materializes a per-layer copy —
the kernel DMAs tiles straight out of the stacked HBM buffer.

Per-row scales (`i8`) multiply the (tiny) output outside the kernel; the
reference's fixed-scale `q8` multiplies by 1/100 the same way.

Compute: inputs cast to bf16 in VMEM (f32 for f32/f16 weights), f32 MXU
accumulation. At decode the MXU is idle either way — HBM bandwidth is the
wall — so dequant cost is hidden entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from xalm_tpu.ops.lowering import interpret_mode
from jax.experimental.pallas import tpu as pltpu

from xalm_tpu.models.params import Q8_FIXED_SCALE, QWeight

__all__ = ["pallas_qmatmul_stacked", "pallas_qmatmul", "supported_weight_dtype"]

# Per-block VMEM budget for the weight tile (double-buffered by the pipeline;
# the bf16 dequant copy lives alongside, so real usage is ~3x this).
# 1 MiB won the 512K/1M/2M/4M decode sweep on v5e.
_WEIGHT_BLOCK_BYTES = 1024 * 1024
_MAX_TD = 2048
# v5e has 128 MiB of VMEM; XLA's default 16 MiB scoped limit is far below
# what a double-buffered weight stream wants.
_VMEM_LIMIT = 64 * 1024 * 1024


def supported_weight_dtype(dtype) -> bool:
    # f16 is absent: Mosaic has no f16 support on TPU ("Unsupported type in
    # mosaic dialect: f16") — the loader converts f16 checkpoints to bf16 on
    # TPU instead (see models/params.load_params f16_mode).
    #
    # fp8 is absent because v5e has no fp8 MXU path and every VPU dequant
    # strategy measured slower than XLA's fused convert+dot (~300 GB/s):
    # Mosaic's native f8->bf16 convert ~78 GB/s; int32 bit surgery
    # (_f8_to_bf16, kept below with an exactness test) ~266 GB/s end to end.
    # fp8 checkpoints therefore route to the XLA path; int8 feeds the MXU
    # natively and is the performance-representative 8-bit format on v5e.
    return jnp.dtype(dtype) in (
        jnp.dtype(jnp.int8),
        jnp.dtype(jnp.bfloat16),
        jnp.dtype(jnp.float32),
    )


_F8_LAYOUT = {
    # dtype -> (mantissa bits, exponent bias)
    jnp.dtype(jnp.float8_e4m3fn): (3, 7),
    jnp.dtype(jnp.float8_e5m2): (2, 15),
}


def _f8_to_bf16(w):
    """f8 -> bf16 by integer bit surgery: assemble f32 bits in int32 lanes
    (Mosaic's native integer width — 8/16-bit vector shifts don't legalize),
    bitcast, and downcast. Exact for all finite codes: both formats store
    round mantissas, so widening just re-biases the exponent and top-aligns
    the mantissa. Denormals decode as mantissa * 2^(1-bias-M); f8 NaN/Inf
    payloads are not special-cased (quantized weights are finite by
    construction — the converter saturates, xalm_tpu/quant.py)."""
    m_bits, bias = _F8_LAYOUT[jnp.dtype(w.dtype)]
    u = jax.lax.bitcast_convert_type(w, jnp.uint8).astype(jnp.int32)
    sign31 = (u & 0x80) << 24
    e = (u >> m_bits) & ((1 << (7 - m_bits)) - 1)
    mant = u & ((1 << m_bits) - 1)
    normal_bits = sign31 | ((e + (127 - bias)) << 23) | (mant << (23 - m_bits))
    normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)
    denorm_mag = mant.astype(jnp.float32) * (2.0 ** (1 - bias - m_bits))
    denorm = jnp.where(sign31 != 0, -denorm_mag, denorm_mag)
    return jnp.where(e == 0, denorm, normal).astype(jnp.bfloat16)


def _tile_d(d: int, n: int, itemsize: int, block_bytes: int = _WEIGHT_BLOCK_BYTES) -> int:
    td = block_bytes // (n * itemsize)
    td = max(128, min(_MAX_TD, td // 128 * 128))
    return min(td, pl.cdiv(d, 128) * 128)


def _kernel(
    l_ref, *refs, compute_dtype, norm_eps=None, fixed_scale=None, a8=False,
    q4_group=0,
):
    """Fused [rmsnorm] -> dequant matmul -> [row scale] tile kernel.

    Optional refs are threaded positionally: the wrapper assembles
    (l, x, [nw], w, [s]) -> o. Prologue norm and epilogue scale run per
    weight tile on the VPU — at decode m the extra work is trivial and each
    fold removes a separate XLA kernel launch (~20-60 us/layer/step measured
    in the decode profile)."""
    refs = list(refs)
    x_ref = refs.pop(0)
    nw_ref = refs.pop(0) if norm_eps is not None else None
    w_ref = refs.pop(0)
    s_ref = refs.pop(0) if (fixed_scale == "row" or q4_group) else None
    out_ref = refs.pop(0)
    del l_ref  # consumed by the index_map
    if q4_group:
        # packed 4-bit tile (same scheme as the megakernel's _q4dot,
        # ops/fused_decode.py): two signed nibbles per byte in split-half
        # k-order, unpacked in VMEM at the int32 width Mosaic legalizes
        # (hi sign-extends through >>4; lo re-signs via <<28>>28). Each
        # half's groups feed s8 x s8 dots over disjoint lane slices of the
        # int8 activation row; the (Gk, td) group-scale block (transposed
        # by the wrapper so scales land on LANES) multiplies each group's
        # i32 partial in f32. Group dots split the contraction — total MXU
        # passes equal the single big dot.
        wp = w_ref[0].astype(jnp.int32)  # (td, Nh)
        hi = (wp >> 4).astype(jnp.int8)
        lo = ((wp << 28) >> 28).astype(jnp.int8)
        s = s_ref[0]  # (Gk, td) f32
        x = x_ref[...]  # (m, 2*Nh) int8 — wrapper quantized per row
        if x.ndim == 3:  # multi-expert: (1, m, n) block -> (m, n)
            x = x.reshape(x.shape[1], x.shape[2])
        nh = wp.shape[-1]
        npg = nh // q4_group
        acc = None
        for h, wh in ((0, lo), (1, hi)):
            for gi in range(npg):
                sl = slice(h * nh + gi * q4_group, h * nh + (gi + 1) * q4_group)
                g = h * npg + gi
                d = jax.lax.dot_general(
                    x[:, sl], wh[:, gi * q4_group : (gi + 1) * q4_group],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * s[g : g + 1]  # (1, td) lane row
                acc = d if acc is None else acc + d
        out_ref[...] = acc.reshape(out_ref.shape)
        return
    w = w_ref[0]
    if jnp.dtype(w.dtype) in _F8_LAYOUT:
        w = _f8_to_bf16(w)
    elif w.dtype != jnp.int8:
        # f32/bf16 weights: cast once in VMEM and hit the MXU
        w = w.astype(compute_dtype)
    # int8 weights feed the MXU directly (v5e has a native s8 systolic
    # path); routing them through a VPU int8->bf16 cast first costs more
    # cycles than the DMA of the tile and caps the stream well below HBM
    # speed-of-light (measured).
    x = x_ref[...]
    if x.ndim == 3:  # multi-expert: (1, m, n) block -> (m, n)
        x = x.reshape(x.shape[1], x.shape[2])
    if a8:
        # W8A8: int8 x int8 feeds the MXU at 2x the bf16 rate (v5e: 394
        # TOPS s8 vs 197 TFLOPs bf16); int32 accumulation. The caller
        # quantized x per row and multiplies its scale into the output.
        y = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    else:
        if norm_eps is not None:
            ms = jnp.mean(x * x, axis=-1, keepdims=True)
            x = x * jax.lax.rsqrt(ms + norm_eps) * nw_ref[0]
        x = x.astype(compute_dtype)
        y = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    if s_ref is not None:
        y = y * s_ref[0]
    elif isinstance(fixed_scale, float):
        y = y * fixed_scale
    out_ref[...] = y.reshape(out_ref.shape)


# Max M rows per block: prefill chunks stream the whole activation tile
# through VMEM; 512 x 14336 bf16 = 14.7 MiB fits comfortably.
_MAX_TM = 512


def pallas_qmatmul_stacked(
    x: jax.Array,  # (M, N) activations, f32
    values: jax.Array,  # (L, D, N) stacked quantized weights
    layer: jax.Array,  # scalar int32 layer index
    *,
    norm_w: jax.Array | None = None,  # (L, N) stacked rmsnorm weights (prologue)
    norm_eps: float | None = None,
    scale: jax.Array | None = None,  # (L, D) stacked per-row scales (epilogue)
    q8_scale: float | None = None,  # fixed scale epilogue (q8)
    a8: bool = False,  # quantize activations per row: int8 x int8 MXU path
    q4_group: int = 0,  # packed 4-bit values (L, D, N/2) + (L, D, Gk) scales
) -> jax.Array:
    """y[M, D] = [scale *] dequant(values[layer]) @ rmsnorm?(x)^T, fused.

    Decode (small M): one M block, the weight stream is the whole traffic;
    the optional rmsnorm prologue and row-scale epilogue fold what would be
    separate XLA kernels into this call. The stacked (L, ...) norm/scale
    arrays are indexed by the same scalar-prefetch layer as the weights —
    an XLA dynamic-slice of a row from a sublane-tiled (L, D) array costs
    20-60 us of strided reads per layer per step (measured). Prefill (M up
    to 512 per chunk): M is blocked; prologue/epilogue are refused (per-tile
    norm recompute at large M wastes VPU cycles — callers norm in XLA
    there)."""
    m, n = x.shape
    l, d, n2 = values.shape
    assert n == (2 * n2 if q4_group else n2), (x.shape, values.shape, q4_group)
    compute_dtype = jnp.float32 if values.dtype == jnp.float32 else jnp.bfloat16
    small_m = m < 256
    if q4_group:
        # decode-shape path only (the megakernel owns the b<=8 hot loop;
        # this covers per-layer decode — MoE gathered experts, b>8 slots).
        # Packed tiles need int8 activations: the s8 x s8 dots are the only
        # consumers that never materialize the unpacked matrix.
        assert small_m and scale is not None and norm_w is None and not a8
        assert values.dtype == jnp.int8 and scale.shape == (l, d, n // q4_group)
    # the rmsnorm prologue recomputes per weight tile: worthwhile only at
    # decode shapes; the scale epilogue is one output pass at any M
    assert small_m or norm_w is None, (
        "norm prologue fusion is a decode-shape optimization"
    )
    sx = None
    if a8 or q4_group:
        assert values.dtype == jnp.int8 and norm_w is None
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sx = jnp.where(amax > 0, amax / 127.0, 1.0)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    elif small_m:
        # decode: cast inside the kernel — a separate (1, N) XLA cast kernel
        # costs ~20 us of launch for trivial work
        xq = x
    else:
        # prefill: pre-cast once so the VPU doesn't re-cast per weight block
        xq = x.astype(compute_dtype)
    # decode (small M) is HBM-bound: 1 MiB tiles won the sweep. Prefill
    # (M >= 256) is MXU-bound: larger tiles amortize per-tile overhead.
    blk = _WEIGHT_BLOCK_BYTES if small_m else 4 * _WEIGHT_BLOCK_BYTES
    td = _tile_d(d, n2, values.dtype.itemsize, blk)
    if m <= _MAX_TM:
        tm, nm = m, 1
    else:
        tm = _MAX_TM
        while m % tm != 0:
            tm //= 2
        nm = m // tm

    # m outer, d inner: the x block is loop-invariant across d (fetched
    # once per m block); weight tiles stream nm times total
    in_specs = [
        pl.BlockSpec((tm, n), lambda mi, i, lr: (mi, 0), memory_space=pltpu.VMEM)
    ]
    operands = [xq]
    eps = None
    if norm_w is not None:
        eps = float(norm_eps)
        in_specs.append(
            pl.BlockSpec((1, 1, n), lambda mi, i, lr: (lr[0], 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(norm_w.reshape(l, 1, n).astype(jnp.float32))
    in_specs.append(
        pl.BlockSpec((1, td, n2), lambda mi, i, lr: (lr[0], i, 0), memory_space=pltpu.VMEM)
    )
    operands.append(values)
    fixed_scale = None
    if q4_group:
        # group scales transposed (L, D, Gk) -> (L, Gk, D) so the per-group
        # vector lands on LANES in-kernel (a (td,) sublane slice of the
        # container layout cannot broadcast across the output's lane dim).
        # The transpose is step-invariant — XLA hoists it out of the decode
        # scan, so it costs one resident copy, not per-step traffic.
        gk = n // q4_group
        in_specs.append(
            pl.BlockSpec(
                (1, gk, td), lambda mi, i, lr: (lr[0], 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(jnp.swapaxes(scale, -1, -2).astype(jnp.float32))
    elif scale is not None:
        fixed_scale = "row"
        in_specs.append(
            pl.BlockSpec((1, 1, td), lambda mi, i, lr: (lr[0], 0, i), memory_space=pltpu.VMEM)
        )
        operands.append(scale.reshape(l, 1, d).astype(jnp.float32))
    elif q8_scale is not None:
        fixed_scale = float(q8_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nm, pl.cdiv(d, td)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, td), lambda mi, i, lr: (mi, i), memory_space=pltpu.VMEM),
    )
    bytes_accessed = nm * td * n2 * values.dtype.itemsize * pl.cdiv(d, td) + m * n * 4 + m * d * 4
    if q4_group:
        bytes_accessed += nm * d * (n // q4_group) * 4
    out = pl.pallas_call(
        functools.partial(
            _kernel, compute_dtype=compute_dtype, norm_eps=eps,
            fixed_scale=fixed_scale, a8=a8, q4_group=q4_group,
        ),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        # interpreter on non-TPU backends so the kernel is testable on the
        # CPU mesh (SURVEY.md §4: jit-vs-interpret pallas kernel checks)
        interpret=interpret_mode(),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    if sx is not None:
        out = out * sx  # per-row activation scale (fused into the next op)
    return out


def pallas_qmatmul_stacked_multi(
    x: jax.Array,  # (m, n) shared across experts, or (ke*m, n) per-expert rows
    values: jax.Array,  # (LE, D, N[/2]) stacked (layer*expert) weights
    scale: jax.Array | None,  # (LE, D) per-row | (LE, D, Gk) q4 groups | None
    idxs: jax.Array,  # (ke,) int32 flattened layer*E + expert indices
    *,
    q4_group: int = 0,
    shared_x: bool = True,
) -> jax.Array:
    """Batched gathered matmul: y[ke*m, D] = dequant(values[idxs[e]]) @ x.

    One pallas_call runs ALL top-k experts as a leading grid dimension —
    the tile pipeline prefetches expert e+1's weights while expert e
    computes, and the per-expert kernel-launch overhead (the dominant
    bubble in the 32-launch/step gathered MoE decode) collapses to one.
    Decode shapes only (m < 256). ``shared_x``: every expert consumes the
    same activation rows (the up projection); otherwise x carries ke
    row-groups of m (the down projection, whose inputs differ per expert).
    """
    ke = int(idxs.shape[0])
    m = x.shape[0] // (1 if shared_x else ke)
    n = x.shape[1]
    l, d, n2 = values.shape
    assert n == (2 * n2 if q4_group else n2), (x.shape, values.shape, q4_group)
    assert m < 256 and ke * m <= 512
    compute_dtype = jnp.float32 if values.dtype == jnp.float32 else jnp.bfloat16
    sx = None
    if q4_group:
        assert values.dtype == jnp.int8 and scale is not None
        assert scale.shape == (l, d, n // q4_group)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sx = jnp.where(amax > 0, amax / 127.0, 1.0)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    else:
        xq = x  # dequant+dot casts in-kernel at decode m
    td = _tile_d(d, n2, values.dtype.itemsize)

    # shared x keeps a 2-D whole-array block; per-expert rows go 3-D
    # (ke, m, n) with a (1, m, n) block — Mosaic requires the last two
    # block dims be sublane/lane aligned OR the whole dim, and an m-row
    # block of a (ke*m)-row array is neither
    if shared_x:
        in_specs = [
            pl.BlockSpec((m, n), lambda ei, i, lr: (0, 0), memory_space=pltpu.VMEM)
        ]
        operands = [xq]
    else:
        in_specs = [
            pl.BlockSpec(
                (1, m, n), lambda ei, i, lr: (ei, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        operands = [xq.reshape(ke, m, n)]
    in_specs.append(
        pl.BlockSpec((1, td, n2), lambda ei, i, lr: (lr[ei], i, 0), memory_space=pltpu.VMEM)
    )
    operands.append(values)
    fixed_scale = None
    if q4_group:
        gk = n // q4_group
        in_specs.append(
            pl.BlockSpec((1, gk, td), lambda ei, i, lr: (lr[ei], 0, i), memory_space=pltpu.VMEM)
        )
        operands.append(jnp.swapaxes(scale, -1, -2).astype(jnp.float32))
    elif scale is not None:
        fixed_scale = "row"
        in_specs.append(
            pl.BlockSpec((1, 1, td), lambda ei, i, lr: (lr[ei], 0, i), memory_space=pltpu.VMEM)
        )
        operands.append(scale.reshape(l, 1, d).astype(jnp.float32))
    elif values.dtype == jnp.int8:
        fixed_scale = float(Q8_FIXED_SCALE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ke, pl.cdiv(d, td)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, m, td), lambda ei, i, lr: (ei, 0, i), memory_space=pltpu.VMEM
        ),
    )
    bytes_accessed = ke * (td * n2 * values.dtype.itemsize * pl.cdiv(d, td) + m * d * 4)
    out = pl.pallas_call(
        functools.partial(
            _kernel, compute_dtype=compute_dtype, norm_eps=None,
            fixed_scale=fixed_scale, a8=False, q4_group=q4_group,
        ),
        out_shape=jax.ShapeDtypeStruct((ke, m, d), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * ke * m * n * d, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret_mode(),
    )(jnp.asarray(idxs, jnp.int32), *operands)
    out = out.reshape(ke * m, d)
    if sx is not None:
        out = out * (jnp.tile(sx, (ke, 1)) if shared_x else sx)
    return out


def pallas_qmatmul_stacked_full(
    x: jax.Array,
    values: jax.Array,
    scale: jax.Array | None,
    layer: jax.Array,
    *,
    q4_group: int = 0,
) -> jax.Array:
    if q4_group:
        return pallas_qmatmul_stacked(
            x, values, layer, scale=scale, q4_group=q4_group
        )
    y = pallas_qmatmul_stacked(x, values, layer)
    if values.dtype == jnp.int8:
        if scale is not None:
            row = jax.lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
            y = y * row
        else:
            y = y * Q8_FIXED_SCALE
    return y


def pallas_qmatmul(x: jax.Array, w: QWeight, *, out_dtype=jnp.float32) -> jax.Array:
    """Unstacked convenience wrapper: x (..., N) @ dequant(w (D, N))^T."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    xm = x.reshape(-1, n).astype(jnp.float32)
    values = w.values[None]
    scale = w.scale[None] if w.scale is not None else None
    y = pallas_qmatmul_stacked_full(xm, values, scale, jnp.int32(0))
    return y.reshape(*lead, -1).astype(out_dtype)
