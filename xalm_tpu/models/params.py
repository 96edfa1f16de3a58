"""Quantized weight pytrees and .xalm -> device loading.

The reference keeps dtype-erased ``Tensor`` objects per layer and dispatches
matmul kernels on a runtime ``Type`` tag (reference src/model.h:158-247,
src/infer.cpp:185-216). TPU-first equivalent: weights live as JAX arrays in
their *storage* dtype (int8 / fp8 / f16 / bf16) inside a pytree, layers
**stacked along a leading axis** so the whole transformer is one
``lax.scan`` — compile time is O(1) in depth and sharding annotations apply
to every layer at once.

Quantization semantics are carried in the array dtype plus the optional
per-output-row ``scale``:

- float dtypes (f32/f16/bf16/fp8): dequantize = cast.
- int8 with ``scale``: xalm_tpu `i8`, y = (x @ W^T) * scale (row-wise).
- int8 without ``scale``: reference `q8`, fixed scale 1/100
  (reference types.h:423-424).
- int8 with ``q4group > 0``: packed 4-bit (`q4`) — each byte holds two
  signed nibbles along the contraction dim in split-half order (low
  nibble = k, high nibble = k + K/2, so in-kernel unpack is two
  arithmetic shifts and the halves feed two dots over disjoint
  activation halves — no lane interleave). ``scale`` is per-(row, group)
  f32 of shape (..., D, K // q4group); dequantize w[k] = nibble *
  scale[row, k // q4group]. The reference's home-grown 4-bit formats
  (qi3/qi4, convert.py:368-651) are interchange-only; this is the
  runtime-streamable layout the decode megakernel consumes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from xalm_tpu import dtypes as xdt
from xalm_tpu.models.config import ModelConfig

__all__ = [
    "QWeight",
    "LayerParams",
    "ModelParams",
    "load_params",
    "recode_fp8_rows",
    "recode_fp8_qweight",
    "recode_params_fp8",
    "recode_params_q4",
    "recode_qweight_q4",
    "unpack_q4",
    "Q8_FIXED_SCALE",
    "ffn_chunk",
    "fuse_qkv",
    "fuse_w13",
    "split_qkv_rows",
    "split_w13_rows",
]

Q8_FIXED_SCALE = 1.0 / 100.0


def ffn_chunk(hidden_dim: int) -> int:
    """Interleave chunk for the fused gate/up weight: largest power of two
    <= 128 lanes that divides the hidden dim into a multiple-of-8 chunk
    count — so splits stay tile-aligned AND tensor parallelism up to 8 ways
    always lands on chunk-pair boundaries (e.g. Llama-2's 11008 -> 32-row
    chunks, 344 of them; Mistral's 14336 -> 128-row chunks, 112)."""
    c = 128
    while c > 1 and (hidden_dim % c != 0 or (hidden_dim // c) % 8 != 0):
        c //= 2
    return c


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["values", "scale"],
    meta_fields=["q4group"],
)
@dataclasses.dataclass
class QWeight:
    """A (possibly quantized) weight matrix of logical shape (..., D, N).

    ``scale`` is a per-output-row f32 array of shape (..., D) for `i8`
    weights, else None. ``q4group > 0`` marks packed 4-bit values of
    physical shape (..., D, N // 2) with per-(row, group) scales of shape
    (..., D, N // q4group) — see the module docstring for the layout.
    """

    values: Any
    scale: Any = None
    q4group: int = 0

    @property
    def shape(self):
        return self.values.shape

    def astype_dequant(self, dtype) -> jax.Array:
        """Materialize the dequantized matrix (test/debug path — the runtime
        kernels dequantize in VMEM instead)."""
        if self.q4group:
            codes = unpack_q4(self.values)  # (..., D, K) int8
            k = codes.shape[-1]
            g = k // self.q4group
            c = codes.reshape(*codes.shape[:-1], g, self.q4group).astype(dtype)
            return (c * self.scale[..., None].astype(dtype)).reshape(codes.shape)
        v = self.values.astype(dtype)
        if self.values.dtype == jnp.int8:
            s = self.scale if self.scale is not None else Q8_FIXED_SCALE
            if self.scale is not None:
                s = s[..., None]
            v = v * jnp.asarray(s, dtype)
        return v


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "attn_norm", "wqkv", "wo", "mlp_norm", "w13", "w2", "bqkv",
        "wgate", "w13e", "w2e", "post_attn_norm", "post_mlp_norm",
        "q_norm", "k_norm",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class LayerParams:
    """Per-layer weights, stacked with leading dim L.

    The container keeps the reference's separate canonical tensors
    (model.cpp:89-106: attn.{q,k,v,down}, mlp.{gate,down,up}); in device
    memory they are **fused** so decode issues one weight stream per matmul
    group instead of paying per-kernel launch latency seven times per layer
    (measured ~10-17 us fixed cost per call — ~1.5 ms/step at 32 layers):

    - ``wqkv`` (L, KH*(G+2)*hd, dim): per kv-head group j the rows are
      [q rows of group j | k row-block j | v row-block j]. Query heads are
      grouped contiguously (GQA head mapping h -> h//G, reference
      infer.cpp:435-441), so the q sub-rows keep their original order and
      the layout shards cleanly along KH for tensor parallelism.
    - ``w13`` (L, 2*hidden, dim): gate/up interleaved in ``ffn_chunk``-row
      chunks [gate_c0 | up_c0 | gate_c1 | ...] — splits are lane-aligned
      and any tp that divides the chunk count shards evenly.
    """

    attn_norm: Any  # (L, dim)
    wqkv: QWeight  # (L, kh*(g+2)*hd, dim) — fused q/k/v, grouped by kv head
    wo: QWeight  # (L, dim, q_dim)
    mlp_norm: Any  # (L, dim)
    # dense GLU FFN (None for MoE models — w13e/w2e carry the experts)
    w13: QWeight | None = None  # (L, 2*hidden_dim, dim) — fused gate/up
    w2: QWeight | None = None  # (L, dim, hidden_dim)
    # Qwen2-family attention bias, fused in wqkv's kv-head-grouped row order
    # (None for Llama/Mistral/Gemma); added to the qkv projection output in
    # llama.forward, outside the matmul kernels
    bqkv: Any = None  # (L, kh*(g+2)*hd) f32 | None
    # Mixtral sparse-MoE FFN: router + per-expert fused gate/up and down
    # stacks (None for dense models)
    wgate: Any = None  # (L, E, dim) f32 router
    w13e: QWeight | None = None  # (L, E, 2*hidden_dim, dim)
    w2e: QWeight | None = None  # (L, E, dim, hidden_dim)
    # Gemma-2 post-block norms, applied to the sub-block OUTPUT before the
    # residual add (None for every other family)
    post_attn_norm: Any = None  # (L, dim)
    post_mlp_norm: Any = None  # (L, dim)
    # Qwen3-style per-head q/k RMS norms, applied before rope (rows carry
    # the converter's rope permutation so they scale the permuted head dims)
    q_norm: Any = None  # (L, head_dim)
    k_norm: Any = None  # (L, head_dim)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed", "layers", "out_norm", "wcls"],
    meta_fields=[],
)
@dataclasses.dataclass
class ModelParams:
    embed: QWeight  # (vocab, dim)
    layers: LayerParams
    out_norm: Any  # (dim,)
    wcls: QWeight  # (vocab, dim); aliases embed when tied

    def nbytes(self) -> int:
        return sum(
            x.nbytes for x in jax.tree.leaves(self) if hasattr(x, "nbytes")
        )


def _np_to_jnp_dtype(arr: np.ndarray):
    # ml_dtypes dtypes map 1:1 onto jnp dtypes
    return jnp.dtype(arr.dtype)


def _load_qweight(xf, name: str, expect_shape: tuple[int, ...]) -> tuple[np.ndarray, np.ndarray | None]:
    info = xf.tensors.get(name)
    if info is None:
        raise ValueError(f"FATAL: missing tensor {name}")
    if tuple(info.shape) != tuple(expect_shape):
        raise ValueError(
            f"FATAL: tensor {name} has unexpected shape {info.shape}, expected {expect_shape}"
        )
    values = xf.load(name)
    scale = None
    sname = xdt.scale_name(name)
    if info.dtype.name == "i8":
        if sname not in xf.tensors:
            raise ValueError(f"FATAL: i8 tensor {name} missing {sname}")
        scale = xf.load(sname)
    return values, scale


def _fuse_rows(parts: list[np.ndarray], groups: int) -> np.ndarray:
    """Interleave row blocks: each part (L, groups, rows_i, ...) slices are
    concatenated per group. Parts must already carry the group axis."""
    return np.ascontiguousarray(np.concatenate(parts, axis=2)).reshape(
        parts[0].shape[0], -1, *parts[0].shape[3:]
    )


def fuse_qkv(
    wq: np.ndarray, wk: np.ndarray, wv: np.ndarray, kh: int
) -> np.ndarray:
    """(L, q_dim, d) + 2x (L, kv_dim, d) -> (L, kh*(g+2)*hd, d) grouped by
    kv head; also fuses (L, rows) scale planes (pass 2-D arrays)."""
    l = wq.shape[0]
    tail = wq.shape[2:]
    q4 = wq.reshape(l, kh, -1, *tail)
    k4 = wk.reshape(l, kh, -1, *tail)
    v4 = wv.reshape(l, kh, -1, *tail)
    return _fuse_rows([q4, k4, v4], kh)


def split_qkv_rows(y, kh: int, g: int, hd: int):
    """Inverse of fuse_qkv on the *output* side: y (..., kh*(g+2)*hd) ->
    (q (..., kh*g*hd), k (..., kh*hd), v (..., kh*hd)). Pass kh=-1 to infer
    the (possibly tensor-parallel-local) kv-head count from the row count."""
    lead = y.shape[:-1]
    y4 = y.reshape(*lead, kh, g + 2, hd)
    q = y4[..., :g, :].reshape(*lead, -1)
    k = y4[..., g, :].reshape(*lead, -1)
    v = y4[..., g + 1, :].reshape(*lead, -1)
    return q, k, v


def fuse_w13(w1: np.ndarray, w3: np.ndarray, chunk: int) -> np.ndarray:
    """(L, hidden, d) x2 -> (L, 2*hidden, d), chunk-interleaved."""
    l = w1.shape[0]
    tail = w1.shape[2:]
    a = w1.reshape(l, -1, 1, chunk, *tail)
    b = w3.reshape(l, -1, 1, chunk, *tail)
    return np.ascontiguousarray(np.concatenate([a, b], axis=2)).reshape(l, -1, *tail)


def split_w13_rows(y, chunk: int):
    """y (..., 2*hidden) -> (gate (..., hidden), up (..., hidden))."""
    lead = y.shape[:-1]
    y4 = y.reshape(*lead, -1, 2, chunk)
    gate = y4[..., 0, :].reshape(*lead, -1)
    up = y4[..., 1, :].reshape(*lead, -1)
    return gate, up


def _stack_scales(scs: list, n: int, what: str):
    """Expert scale lists must be all-present or all-absent — a mix means
    int8 codes would silently run unscaled (the _fused 'FATAL: mixed
    quantization' contract, applied across experts)."""
    if 0 < len(scs) < n:
        raise ValueError(f"FATAL: mixed quantization across {what} experts")
    return np.stack(scs, axis=1) if scs else None


def _stack_hd_norm(xf, put, cfg: ModelConfig, name_fmt: str):
    """Stacked (L, head_dim) f32 per-head q/k norms (Qwen3)."""
    vals = np.stack(
        [
            _load_qweight(xf, name_fmt.format(i), (cfg.head_dim,))[0]
            for i in range(cfg.n_layers)
        ]
    )
    return put(np.asarray(vals).astype(np.float32))


def _load_router(stack_host, put, cfg: ModelConfig, d: int):
    """Router weights must be float (the converter keeps them f32 like the
    norms — expert selection cannot ride a lossy int8 code)."""
    vals, sc = stack_host("l.{}.moe.gate.weight", (cfg.n_experts, d))
    if sc is not None:
        raise ValueError("FATAL: MoE router weights must not be int8-quantized")
    return put(np.asarray(vals).astype(np.float32))


def _stack_experts_w13(stack_host, put, cfg: ModelConfig, h: int) -> QWeight:
    """Per-expert fused gate/up stacks -> (L, E, 2h, d) (+ (L, E, 2h) scales)."""
    vals, scs = [], []
    for e in range(cfg.n_experts):
        g, gs = stack_host(f"l.{{}}.moe.{e}.gate.weight", (h, cfg.dim))
        u, us = stack_host(f"l.{{}}.moe.{e}.up.weight", (h, cfg.dim))
        if (gs is None) != (us is None):
            raise ValueError(
                f"FATAL: mixed quantization across expert {e} gate/up weights"
            )
        vals.append(fuse_w13(g, u, ffn_chunk(h)))
        if gs is not None:
            scs.append(fuse_w13(gs, us, ffn_chunk(h)))
    v = np.stack(vals, axis=1)
    s = _stack_scales(scs, cfg.n_experts, "gate/up")
    return QWeight(put(v), put(s) if s is not None else None)


def _stack_experts_w2(stack_host, put, cfg: ModelConfig, d: int, h: int) -> QWeight:
    """Per-expert down stacks -> (L, E, d, h) (+ (L, E, d) scales)."""
    vals, scs = [], []
    for e in range(cfg.n_experts):
        w, ws = stack_host(f"l.{{}}.moe.{e}.down.weight", (d, h))
        vals.append(w)
        if ws is not None:
            scs.append(ws)
    v = np.stack(vals, axis=1)
    s = _stack_scales(scs, cfg.n_experts, "down")
    return QWeight(put(v), put(s) if s is not None else None)


def load_units(cfg: ModelConfig) -> int:
    """Number of progress units load_params reports: 9 tensors per layer
    (reference model.cpp:89-106) plus embed/out_norm/wcls; MoE layers swap
    the 3 mlp tensors for the router + 3 per expert."""
    per_layer = 9 if not cfg.n_experts else 7 + 3 * cfg.n_experts
    if cfg.post_norms:
        per_layer += 2
    # qk norms load outside the ticking stack helpers — not counted
    return per_layer * cfg.n_layers + 3


_FP8_DTYPES = (np.dtype("float8_e4m3fn"), np.dtype("float8_e5m2"))


def recode_fp8_rows(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """fp8 weights -> (int8 codes, per-row f32 scale), the `i8` scheme.

    v5e has no fp8 MXU path: fp8 weights either dequantize on the VPU
    (~240-300 GB/s ceiling, measured) or fall to XLA's convert+dot (~61 % of
    roofline). Re-coding each output row to int8 * (absmax/127) at load keeps
    the exact on-disk format (reference src/infer.cpp:129-134 treats fp8 as a
    first-class matvec dtype) while the runtime streams MXU-native int8.
    Error: each value moves by <= scale/2 = row_absmax/254, strictly finer
    than the fp8 grid spacing near the row max (e4m3: absmax/16 per step at
    the top binade)."""
    rows = vals.reshape(-1, vals.shape[-1])
    n = rows.shape[0]
    q = np.empty(rows.shape, np.int8)
    scale = np.empty((n,), np.float32)
    # blocked: the f32 temporaries stay at slab size (a full-tensor astype
    # of a stacked 7B weight would transiently need tens of GB of host RAM)
    slab = max(1, (64 << 20) // (rows.shape[-1] * 4))
    for at in range(0, n, slab):
        f = rows[at : at + slab].astype(np.float32)
        if not np.isfinite(f).all():
            # e5m2 can encode inf/NaN: amax=inf would give scale=inf and a
            # NaN->int8 cast (undefined) — a silently corrupted model. The
            # recode contract is exact-format-preserving for finite weights
            # (the converter saturates, xalm_tpu/quant.py), so fail loudly.
            raise ValueError(
                "non-finite fp8 weight values: container is corrupt or was "
                "not produced by a saturating converter (cannot recode to i8)"
            )
        amax = np.abs(f).max(axis=1)
        sc = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        scale[at : at + slab] = sc
        np.clip(np.round(f / sc[:, None]), -127, 127, out=f)
        q[at : at + slab] = f.astype(np.int8)
    return q.reshape(vals.shape), scale.reshape(vals.shape[:-1])


def _recode_fp8_slab(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    f = v.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(f / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(jax.jit, donate_argnums=0)
def _recode_fp8_stacked(v: jax.Array):
    # per-layer map keeps the f32 intermediate at one layer's footprint;
    # donation frees the fp8 buffer as soon as the int8 copy exists
    return jax.lax.map(_recode_fp8_slab, v)


@functools.partial(jax.jit, donate_argnums=0)
def _recode_fp8_flat(v: jax.Array):
    return _recode_fp8_slab(v)


def recode_fp8_qweight(qw: QWeight) -> QWeight:
    """Device-side fp8 -> i8 recode of one QWeight (see recode_fp8_rows)."""
    if jnp.dtype(qw.values.dtype) not in (
        jnp.dtype(jnp.float8_e4m3fn),
        jnp.dtype(jnp.float8_e5m2),
    ):
        return qw
    fn = _recode_fp8_stacked if qw.values.ndim == 3 else _recode_fp8_flat
    q, scale = fn(qw.values)
    return QWeight(q, scale)


def recode_params_fp8(params: ModelParams) -> ModelParams:
    """Recode every fp8 QWeight in a loaded/synthetic ModelParams to i8."""
    tied = params.wcls is params.embed
    embed = recode_fp8_qweight(params.embed)
    lp = params.layers
    layers = LayerParams(
        attn_norm=lp.attn_norm,
        wqkv=recode_fp8_qweight(lp.wqkv),
        wo=recode_fp8_qweight(lp.wo),
        mlp_norm=lp.mlp_norm,
        w13=None if lp.w13 is None else recode_fp8_qweight(lp.w13),
        w2=None if lp.w2 is None else recode_fp8_qweight(lp.w2),
        bqkv=lp.bqkv,
        wgate=lp.wgate,
        w13e=None if lp.w13e is None else recode_fp8_qweight(lp.w13e),
        w2e=None if lp.w2e is None else recode_fp8_qweight(lp.w2e),
    )
    wcls = embed if tied else recode_fp8_qweight(params.wcls)
    return ModelParams(embed=embed, layers=layers, out_norm=params.out_norm, wcls=wcls)


def unpack_q4(packed) -> jax.Array:
    """Packed (..., K/2) int8 -> (..., K) int8 codes in [-8, 7].

    Split-half layout: byte j holds k=j in the low nibble and k=j+K/2 in
    the high nibble (both signed). The high nibble sign-extends for free
    through the int8->int32 convert + arithmetic >> 4; the low nibble
    re-signs via << 28 >> 28 — the only integer ops Mosaic legalizes on
    vectors are i32-width (CLAUDE.md), and this is exactly the in-kernel
    unpack the decode megakernel runs per streamed tile."""
    w = jnp.asarray(packed).astype(jnp.int32)
    hi = (w >> 4).astype(jnp.int8)
    lo = ((w << 28) >> 28).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-1)


def _pack_q4_codes(q: jax.Array) -> jax.Array:
    """int codes in [-8, 7] of shape (..., K) -> packed (..., K/2) int8."""
    k = q.shape[-1]
    assert k % 2 == 0
    lo, hi = q[..., : k // 2], q[..., k // 2 :]
    u = ((hi & 0xF) << 4) | (lo & 0xF)  # 0..255 in int32
    return jnp.where(u > 127, u - 256, u).astype(jnp.int8)


def _q4_slab(f: jax.Array, group: int) -> tuple[jax.Array, jax.Array]:
    """f32 (..., D, K) -> (packed (..., D, K/2) int8, scale (..., D, K/g))."""
    *lead, d, k = f.shape
    g = k // group
    fg = f.reshape(*lead, d, g, group)
    amax = jnp.max(jnp.abs(fg), axis=-1)
    sc = jnp.where(amax > 0, amax / 7.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(fg / sc[..., None]), -8, 7).astype(jnp.int32)
    return _pack_q4_codes(q.reshape(*lead, d, k)), sc


def recode_qweight_q4(qw: QWeight, group: int) -> QWeight:
    """Re-code one i8/float QWeight to packed 4-bit + per-(row, group)
    scales (symmetric absmax/7 per group — the reference's qi4 grid,
    convert.py:368-651, at runtime-streamable granularity)."""
    if qw.q4group:
        return qw
    k = qw.values.shape[-1]
    if k % (2 * group) or group % 128:
        raise ValueError(f"q4 group {group} must be a 128-multiple dividing K/2={k // 2}")

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=(2,))
    def _one(v, scale, grp):
        f = v.astype(jnp.float32)
        if scale is not None:
            f = f * scale[..., None]
        elif jnp.dtype(v.dtype) == jnp.dtype(jnp.int8):
            f = f * Q8_FIXED_SCALE
        return _q4_slab(f, grp)

    if qw.values.ndim == 4:  # stacked experts (L, E, D, K): flatten to
        # (L*E, D, K) so the per-slice map below bounds the f32 temp to one
        # expert matrix (a whole-stack f32 temp is ~4x the packed bytes)
        le = qw.values.shape[0] * qw.values.shape[1]
        flat = QWeight(
            qw.values.reshape(le, *qw.values.shape[2:]),
            None if qw.scale is None else qw.scale.reshape(le, *qw.scale.shape[2:]),
        )
        out = recode_qweight_q4(flat, group)
        return QWeight(
            out.values.reshape(*qw.values.shape[:3], -1),
            out.scale.reshape(*qw.values.shape[:3], -1),
            q4group=group,
        )
    if qw.values.ndim == 3:  # stacked layers: map keeps the f32 temp per-layer
        @functools.partial(jax.jit, donate_argnums=0, static_argnums=(2,))
        def _stacked(v, scale, grp):
            if scale is None:
                fixed = Q8_FIXED_SCALE if jnp.dtype(v.dtype) == jnp.dtype(jnp.int8) else 1.0
                return jax.lax.map(
                    lambda a: _q4_slab(a.astype(jnp.float32) * fixed, grp), v
                )
            return jax.lax.map(
                lambda args: _q4_slab(
                    args[0].astype(jnp.float32) * args[1][..., None], grp
                ),
                (v, scale),
            )

        packed, sc = _stacked(qw.values, qw.scale, group)
    else:
        packed, sc = _one(qw.values, qw.scale, group)
    return QWeight(packed, sc, q4group=group)


def recode_params_q4(params: ModelParams, group: int = 512) -> ModelParams:
    """Re-code the four dense body weights (wqkv/wo/w13/w2) to packed 4-bit.

    Embed, classifier head, and norms are untouched: the head is
    quality-critical (it keeps the i8 per-row recode, RESULTS.md) and the
    embed lookup reads one row per token. Halves the decode body stream —
    the dominant HBM term (docs/PERF.md byte model). MoE models pack the
    expert stacks the same way (the gathered decode path streams them
    packed; the router stays f32)."""
    lp = params.layers
    if lp.w13 is None:
        layers = dataclasses.replace(
            lp,
            wqkv=recode_qweight_q4(lp.wqkv, group),
            wo=recode_qweight_q4(lp.wo, group),
            w13e=recode_qweight_q4(lp.w13e, group),
            w2e=recode_qweight_q4(lp.w2e, group),
        )
    else:
        layers = dataclasses.replace(
            lp,
            wqkv=recode_qweight_q4(lp.wqkv, group),
            wo=recode_qweight_q4(lp.wo, group),
            w13=recode_qweight_q4(lp.w13, group),
            w2=recode_qweight_q4(lp.w2, group),
        )
    return dataclasses.replace(params, layers=layers)


def recode_wcls_i8(params: ModelParams) -> ModelParams:
    """Opt-in: re-code a float (bf16/f16/f32) classifier head to i8 per-row.

    The converter boosts wcls to 16-bit (reference convert.py:141-155
    boost_type), so even an `i8` container streams a 2x-width classifier at
    decode — 262 MB of the 7.29 GB/token footprint at 7B (docs/PERF.md).
    Per-row absmax int8 halves that stream; the quantization error is
    quality-gated on the real checkpoint (RESULTS.md). No-op for already-i8
    heads; tied heads are untied (the embed lookup keeps the float table,
    only the logits projection streams i8)."""
    w = params.wcls
    if jnp.dtype(w.values.dtype) == jnp.dtype(jnp.int8):
        return params
    # NOT the donating jit: a tied head aliases params.embed, which must
    # survive (the embed lookup stays float)
    q, scale = jax.jit(_recode_fp8_slab)(w.values)
    return dataclasses.replace(params, wcls=QWeight(q, scale))


def load_params(
    xf, cfg: ModelConfig, device_put=True, f16_mode: str = "auto",
    fp8_mode: str = "auto", progress=None,
) -> ModelParams:
    """Load and stack all weights from an open XalmFile.

    Shape validation matches the reference loader (model.cpp:62-81). Stacking
    is host-side numpy (cheap views -> one contiguous stack per weight kind),
    then a single device transfer per stacked tensor.

    ``f16_mode``: what to do with f16 container weights — "auto" converts to
    bf16 on TPU (Mosaic has no f16; same byte count, ~3 fewer mantissa bits)
    and keeps f16 elsewhere; "keep" / "bf16" / "f32" force.

    ``fp8_mode``: what to do with fp8 container weights — "auto" recodes to
    int8 + per-row scale on TPU (see recode_fp8_rows; fp8 has no MXU path on
    v5e) and keeps fp8 elsewhere; "keep" / "recode" force.
    """
    if f16_mode == "auto":
        f16_mode = "bf16" if jax.default_backend() == "tpu" else "keep"
    if fp8_mode == "auto":
        fp8_mode = "recode" if jax.default_backend() == "tpu" else "keep"
    _f16_target = {"keep": None, "bf16": jnp.bfloat16, "f32": jnp.float32}[f16_mode]
    _recode_fp8 = {"keep": False, "recode": True}[fp8_mode]
    _tick = progress if progress is not None else (lambda: None)

    def maybe_recode(vals: np.ndarray, scale):
        if _recode_fp8 and vals.dtype in _FP8_DTYPES:
            assert scale is None  # fp8 containers carry no scale tensors
            return recode_fp8_rows(vals)
        return vals, scale

    def put(x):
        arr = jnp.asarray(x) if device_put else x
        if arr.dtype == jnp.float16 and _f16_target is not None:
            arr = arr.astype(_f16_target)
        return arr

    def _validate(name_fmt: str, expect_shape) -> list[str]:
        names = [name_fmt.format(l) for l in range(cfg.n_layers)]
        for name in names:
            info = xf.tensors.get(name)
            if info is None:
                raise ValueError(f"FATAL: missing tensor {name}")
            if tuple(info.shape) != tuple(expect_shape):
                # q4 container tensors carry K/2 packed bytes + a .scale4
                # partner (see quant.quantize_q4_rows)
                packed = tuple(expect_shape[:-1]) + (expect_shape[-1] // 2,)
                if not (
                    name + ".scale4" in xf.tensors
                    and tuple(info.shape) == packed
                ):
                    raise ValueError(
                        f"FATAL: tensor {name} has unexpected shape {info.shape}, expected {expect_shape}"
                    )
        return names

    def _stack(names: list[str]) -> np.ndarray:
        # native thread-pool copy straight into the stacked array
        # (native/loader.cpp); falls back to serial copies inside read_stack
        out = xf.read_stack(names) if hasattr(xf, "read_stack") else np.stack([xf.load(n) for n in names])
        for _ in names:
            _tick()
        return out

    def _stack_noprogress(names: list[str]) -> np.ndarray:
        return xf.read_stack(names) if hasattr(xf, "read_stack") else np.stack([xf.load(n) for n in names])

    def stack_host(name_fmt: str, expect_shape) -> tuple[np.ndarray, np.ndarray | None]:
        """Host-side (numpy) stacked values + scales for one weight kind."""
        names = _validate(name_fmt, expect_shape)
        first = xf.tensors[names[0]]
        scale = None
        if names[0] + ".scale4" in xf.tensors:
            # q4: packed nibbles + per-(row, group) scale planes; scales
            # are (D, G) so they fuse/stack like the values (same row order)
            scale = _stack_noprogress([n + ".scale4" for n in names])
            return _stack(names), scale
        if first.dtype.name == "i8":
            snames = [xdt.scale_name(n) for n in names]
            if any(s not in xf.tensors for s in snames):
                raise ValueError(f"FATAL: i8 tensors for {name_fmt} missing scales")
            scale = _stack_noprogress(snames)
        vals = _stack(names)
        return maybe_recode(vals, scale)

    def _q4g(vals, scale) -> int:
        """Group size of a stacked q4 weight (0 for i8/float): the scale
        carries one lane per group, the values K/2 packed bytes."""
        if scale is not None and scale.ndim == vals.ndim:
            return 2 * vals.shape[-1] // scale.shape[-1]
        return 0

    def stack_qw(name_fmt: str, expect_shape) -> QWeight:
        vals, scale = stack_host(name_fmt, expect_shape)
        return QWeight(
            put(vals),
            put(scale) if scale is not None else None,
            q4group=_q4g(vals, scale),
        )

    def stack_norm(name_fmt: str) -> jax.Array:
        names = _validate(name_fmt, (cfg.dim,))
        return put(_stack(names).astype(np.float32))

    def _fused(parts, fuse, *fargs) -> QWeight:
        vals = fuse(*[p[0] for p in parts], *fargs)
        has_scale = parts[0][1] is not None
        if any((p[1] is not None) != has_scale for p in parts):
            raise ValueError("FATAL: mixed quantization across fused weights")
        scale = fuse(*[p[1] for p in parts], *fargs) if has_scale else None
        return QWeight(
            put(vals),
            put(scale) if scale is not None else None,
            q4group=_q4g(vals, scale) if has_scale else 0,
        )

    d, q, kv, h = cfg.dim, cfg.q_dim, cfg.kv_dim, cfg.hidden_dim

    layers = LayerParams(
        attn_norm=stack_norm("l.{}.attn.norm.weight"),
        # container keeps the reference's separate q/k/v and gate/up tensors;
        # they fuse host-side into the device layout (see LayerParams)
        wqkv=_fused(
            [
                stack_host("l.{}.attn.q.weight", (q, d)),
                stack_host("l.{}.attn.k.weight", (kv, d)),
                stack_host("l.{}.attn.v.weight", (kv, d)),
            ],
            fuse_qkv,
            cfg.n_kv_heads,
        ),
        wo=stack_qw("l.{}.attn.down.weight", (d, q)),
        mlp_norm=stack_norm("l.{}.mlp.norm.weight"),
        w13=None if cfg.n_experts else _fused(
            [
                stack_host("l.{}.mlp.gate.weight", (h, d)),
                stack_host("l.{}.mlp.up.weight", (h, d)),
            ],
            fuse_w13,
            ffn_chunk(h),
        ),
        w2=None if cfg.n_experts else stack_qw("l.{}.mlp.down.weight", (d, h)),
        wgate=_load_router(stack_host, put, cfg, d) if cfg.n_experts else None,
        w13e=_stack_experts_w13(stack_host, put, cfg, h) if cfg.n_experts else None,
        w2e=_stack_experts_w2(stack_host, put, cfg, d, h) if cfg.n_experts else None,
        post_attn_norm=(
            stack_norm("l.{}.attn.postnorm.weight") if cfg.post_norms else None
        ),
        post_mlp_norm=(
            stack_norm("l.{}.mlp.postnorm.weight") if cfg.post_norms else None
        ),
        q_norm=_stack_hd_norm(xf, put, cfg, "l.{}.attn.qnorm.weight") if cfg.qk_norm else None,
        k_norm=_stack_hd_norm(xf, put, cfg, "l.{}.attn.knorm.weight") if cfg.qk_norm else None,
        bqkv=(
            put(
                fuse_qkv(
                    stack_host("l.{}.attn.q.bias", (q,))[0].astype(np.float32),
                    stack_host("l.{}.attn.k.bias", (kv,))[0].astype(np.float32),
                    stack_host("l.{}.attn.v.bias", (kv,))[0].astype(np.float32),
                    cfg.n_kv_heads,
                )
            )
            if "l.0.attn.q.bias" in xf.tensors
            else None
        ),
    )

    ev, es = maybe_recode(*_load_qweight(xf, "embed.weight", (cfg.vocab_size, cfg.dim)))
    embed = QWeight(put(ev), put(es) if es is not None else None)
    _tick()

    onv, _ = _load_qweight(xf, "output.norm.weight", (cfg.dim,))
    out_norm = put(np.asarray(onv, dtype=np.float32))
    _tick()

    if cfg.tie_word_embeddings:
        wcls = embed
    else:
        cv, cs = maybe_recode(*_load_qweight(xf, "output.weight", (cfg.vocab_size, cfg.dim)))
        wcls = QWeight(put(cv), put(cs) if cs is not None else None)
    _tick()

    return ModelParams(embed=embed, layers=layers, out_norm=out_norm, wcls=wcls)
