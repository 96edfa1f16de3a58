"""Dtype registry shared by the .xalm container, converter and TPU runtime.

The reference implements a runtime ``Type`` descriptor (reference
src/types.h:337-514) plus software FP8 bit-twiddling (types.h:268-320). On TPU
none of that is needed: every dtype the engine executes has a native
``ml_dtypes`` / numpy representation that XLA understands directly, so the
registry here is a thin name <-> dtype table plus the quantization tags the
container format needs.

Container type strings (matching reference Type::parse, types.h:468-499 and
convert.py XType, convert.py:43-109):

==========  =====================  ==========================================
name        storage dtype          notes
==========  =====================  ==========================================
f32         float32
f16         float16
bf16        bfloat16
f8_e4m3     float8_e4m3fn          per-tensor cast (reference semantics)
f8_e5m2     float8_e5m2            per-tensor cast
q8          int8                   reference fixed-scale int8: value = q/100
                                   (types.h:423-424) — read-compat only
u8          uint8                  raw bytes (tokenizer.tokens)
i8          int8                   xalm_tpu extension: symmetric int8 with a
                                   per-output-row f32 scale stored in a
                                   sibling ``<name>.scale`` tensor
==========  =====================  ==========================================

``i8`` replaces the reference's magic 1/100 scale (a flagged defect,
SURVEY.md §7 "bugs not to copy") with proper per-row scales.
"""

from __future__ import annotations

import dataclasses

import ml_dtypes
import numpy as np

__all__ = ["XDType", "parse", "REGISTRY", "SCALE_SUFFIX", "scale_name", "is_scale_name"]

# Suffix for the per-row scale tensor that accompanies an `i8` weight.
SCALE_SUFFIX = ".scale"


@dataclasses.dataclass(frozen=True)
class XDType:
    """A container dtype: its name, raw storage dtype, and quantization tag."""

    name: str
    np_dtype: np.dtype
    # Fixed global dequant scale (reference q8 uses 1/100); None = no scaling
    # or external per-row scale.
    fixed_scale: float | None = None
    # True when a sibling `<name>.scale` tensor carries per-row scales.
    scaled: bool = False

    @property
    def bits(self) -> int:
        return self.np_dtype.itemsize * 8

    def nbytes(self, shape: tuple[int, ...]) -> int:
        n = 1
        for s in shape:
            n *= int(s)
        return n * self.np_dtype.itemsize


def _make_registry() -> dict[str, XDType]:
    types = [
        XDType("f32", np.dtype(np.float32)),
        XDType("f16", np.dtype(np.float16)),
        XDType("bf16", np.dtype(ml_dtypes.bfloat16)),
        XDType("f8_e4m3", np.dtype(ml_dtypes.float8_e4m3fn)),
        XDType("f8_e5m2", np.dtype(ml_dtypes.float8_e5m2)),
        XDType("q8", np.dtype(np.int8), fixed_scale=1.0 / 100.0),
        XDType("u8", np.dtype(np.uint8)),
        XDType("i8", np.dtype(np.int8), scaled=True),
    ]
    return {t.name: t for t in types}


REGISTRY: dict[str, XDType] = _make_registry()


def parse(name: str) -> XDType:
    """Look up a container type string (reference Type::parse types.h:468-499)."""
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown xalm dtype {name!r}; supported: {sorted(REGISTRY)}"
        ) from None


def scale_name(tensor_name: str) -> str:
    """Name of the per-row scale tensor accompanying an `i8` tensor."""
    return tensor_name + SCALE_SUFFIX


def is_scale_name(tensor_name: str) -> bool:
    return tensor_name.endswith(SCALE_SUFFIX)
