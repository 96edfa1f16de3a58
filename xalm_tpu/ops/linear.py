"""Quantized matmul: y = dequant(W) @ x with per-row output scaling.

TPU-native counterpart of the reference's fused dequant-and-dot matvec
(reference src/infer.cpp:104-222, templated over weight dtype with inline
per-element dequant). Two execution paths behind one function:

- ``impl="xla"``: plain jnp dot with the dequant expressed as a cast +
  row-scale on the *output*. Because `i8`/`q8` scales are per-output-row,
  ``(x @ W^T) * scale`` is exact — the inner dot runs on raw storage values,
  so no scaled weight copy is ever materialized. Used on CPU and as the
  correctness reference.
- ``impl="pallas"``: fused kernel that streams quantized weight tiles
  HBM->VMEM and dequantizes in registers during the dot
  (xalm_tpu/ops/pallas_matmul.py) — the HBM-speed-of-light path.

``impl="auto"`` picks pallas on TPU for supported shapes, else xla.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xalm_tpu.models.params import Q8_FIXED_SCALE, QWeight

__all__ = ["qmatmul"]


def _xla_qmatmul(x: jax.Array, w: QWeight, compute_dtype, out_dtype) -> jax.Array:
    v = w.values
    nd = x.ndim
    if w.q4group:
        # packed 4-bit: materialize the dequantized slab in the compute
        # dtype (one layer at a time under the scan — prefill amortizes the
        # unpack over the whole chunk; the decode fast path is the
        # megakernel's in-VMEM unpack, ops/fused_decode.py)
        wd = w.astype_dequant(compute_dtype)
        y = jax.lax.dot_general(
            x.astype(compute_dtype),
            wd,
            (((nd - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.astype(out_dtype)
    if v.dtype == jnp.int8:
        # int8 x int8-as-compute would change numerics; cast both sides to the
        # compute dtype and accumulate in f32 on the MXU.
        y = jax.lax.dot_general(
            x.astype(compute_dtype),
            v.astype(compute_dtype),
            (((nd - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scale = w.scale if w.scale is not None else Q8_FIXED_SCALE
        y = y * scale
    else:
        y = jax.lax.dot_general(
            x.astype(compute_dtype),
            v.astype(compute_dtype),
            (((nd - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return y.astype(out_dtype)


def qmatmul(
    x: jax.Array,
    w: QWeight,
    *,
    compute_dtype=jnp.float32,
    out_dtype=jnp.float32,
    impl: str = "auto",
) -> jax.Array:
    """``x``: (..., N) activations; ``w``: logical (D, N). Returns (..., D) f32.

    Matches the reference matmul contract ``W(d,n) @ x(n) -> out(d)``
    (infer.cpp:104-111) batched over leading dims.
    """
    kw = w.values.shape[-1] * (2 if w.q4group else 1)
    if x.shape[-1] != kw:
        raise ValueError(f"qmatmul: x {x.shape} incompatible with w {w.values.shape}")
    if impl == "auto":
        impl = "xla"  # pallas path is selected explicitly by the engine once
        # shapes are known-good; see xalm_tpu/ops/pallas_matmul.py
    if impl == "xla":
        return _xla_qmatmul(x, w, compute_dtype, out_dtype)
    if impl == "pallas":
        from xalm_tpu.ops.pallas_matmul import pallas_qmatmul

        return pallas_qmatmul(x, w, out_dtype=out_dtype)
    raise ValueError(f"unknown qmatmul impl {impl!r}")
