"""HBM-resident KV cache with StreamingLLM sink + ring indexing.

The reference's signature long-context mechanism (SURVEY.md §5.7; reference
src/infer.cpp:610-613, src/model.h:10):

- ``KV_SINKS=2`` attention-sink tokens stay pinned in slots [0, 2) once
  ``pos >= max_seq_len``.
- The remaining slots form a ring:
  ``kv_pos = kv_sink + (pos - kv_sink) % (max_seq_len - kv_sink)``.
- Attention always spans ``kv_len = min(pos + 1, max_seq_len)`` slots.

Here those are pure jnp functions over **per-sequence** position vectors —
each slot of a continuous batch wraps independently.

Layout: (n_layers, batch, n_kv_heads, max_seq_len, head_dim) — **head-major**,
unlike the reference's token-major per-layer (max_seq_len, n_kv_heads *
head_dim) fp16 buffers (model.h:222-223). On TPU each (seq, head_dim) stripe
is then contiguous, so the fused decode-attention kernel streams one kv
head's entire history as a single dense HBM->VMEM block.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from xalm_tpu.models.config import KV_SINKS, ModelConfig

__all__ = ["KVCache", "ring_indices", "KV_SINKS"]


def ring_indices(pos: jax.Array, max_seq_len: int):
    """(kv_sink, kv_pos, kv_len) for per-sequence positions ``pos`` (int32).

    Exactly the reference's indexing (infer.cpp:610-613); element-wise over a
    batch of positions.
    """
    pos = jnp.asarray(pos, jnp.int32)
    wrapped = pos >= max_seq_len
    kv_sink = jnp.where(wrapped, KV_SINKS, 0).astype(jnp.int32)
    ring = max_seq_len - kv_sink
    kv_pos = kv_sink + (pos - kv_sink) % ring
    kv_len = jnp.minimum(pos + 1, max_seq_len).astype(jnp.int32)
    return kv_sink, kv_pos.astype(jnp.int32), kv_len


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    """Float KV (f16/bf16/f32) or weight-style quantized int8 KV.

    int8 mode (the BASELINE north star's "quantized KV cache") stores each
    cached row as int8 codes plus a per-row f32 scale (absmax/127), exactly
    the `i8` weight scheme: row_f32 = codes * scale. Scales live in
    (L, B, K, S) planes — 1/256th of the cache bytes at hd=128.
    """

    k: Any  # (L, B, n_kv_heads, S, head_dim)
    v: Any  # (L, B, n_kv_heads, S, head_dim)
    k_scale: Any = None  # (L, B, n_kv_heads, S) f32 — int8 caches only
    v_scale: Any = None

    @staticmethod
    def plane_shape(cfg: ModelConfig, batch: int) -> tuple[int, ...]:
        """The (L, B, K, S_phys, hd) shape of each cache plane. The
        *physical* window is padded to a multiple of 32 rows: the Pallas
        decode kernels tile the sequence axis in small row windows (8 for
        float caches, 32 for int8 — Mosaic's int8 sublane tile), and an
        arbitrary ``-T`` override (e.g. 20) must not silently drop the
        trailing rows. Logical indexing (ring, kv_len) stays at
        cfg.max_seq_len; rows >= it are never attended, and the kv_pos ==
        max_seq_len dropped-write sentinel lands in a padding row."""
        s_pad = (cfg.max_seq_len + 31) // 32 * 32
        return (cfg.n_layers, batch, cfg.n_kv_heads, s_pad, cfg.head_dim)

    @classmethod
    def init(cls, cfg: ModelConfig, batch: int, dtype=jnp.float16) -> "KVCache":
        shape = cls.plane_shape(cfg, batch)
        if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
            sshape = shape[:-1]
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    def nbytes(self) -> int:
        n = self.k.nbytes + self.v.nbytes
        if self.k_scale is not None:
            n += self.k_scale.nbytes + self.v_scale.nbytes
        return n
