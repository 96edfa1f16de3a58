"""Extract the GGML IQ codebook grids from the reference as *data*.

The IQ1/IQ2/IQ3 formats decode through constant lattice codebooks (E8-derived
point sets) that are pure data — there is no algorithm to regenerate them, so
interchange-correct decoding requires carrying the tables verbatim
(reference quants.py:166-185 unpacks the same hex blobs at import time).

This script reads the reference's packed hex constants, unpacks them with the
documented 2-/3-bit-per-element scheme, and writes:

- ``xalm_tpu/data/iq_grids.npz`` — the decoded int8 grids keyed by format
- ``tests/data/iq_golden.npz`` — golden dequant vectors: random packed blocks
  run through the reference's own decoder, pinning our independent
  vectorized decoders byte-for-byte.

Run manually when regenerating; both outputs are committed.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, "/root/reference")
import quants  # noqa: E402  (reference library, imported for data extraction)

GRIDS = {
    "iq2_xxs": quants.IQ2_XXS,
    "iq2_xs": quants.IQ2_XS,
    "iq2_s": quants.IQ2_S,
    "iq3_xxs": quants.IQ3_XXS,
    "iq3_s": quants.IQ3_S,
    "iq1": quants.IQ1_S,  # IQ1_M shares the IQ1_S grid
}

FORMATS = {
    "iq1_s": quants.IQ1_S,
    "iq1_m": quants.IQ1_M,
    "iq2_xxs": quants.IQ2_XXS,
    "iq2_xs": quants.IQ2_XS,
    "iq2_s": quants.IQ2_S,
    "iq3_xxs": quants.IQ3_XXS,
    "iq3_s": quants.IQ3_S,
}


def main() -> None:
    grids = {}
    for name, cls in GRIDS.items():
        cls.init_grid()
        g = cls.grid.reshape(cls.grid_shape)
        assert g.min() >= -128 and g.max() <= 127
        grids[name] = g.astype(np.int8)
        print(f"{name}: grid {g.shape}")
    out = REPO / "xalm_tpu" / "data" / "iq_grids.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **grids)
    print(f"wrote {out} ({out.stat().st_size} bytes)")

    rng = np.random.default_rng(1234)
    golden = {}
    for name, cls in FORMATS.items():
        cls.init_grid()
        nbytes = cls.type_size
        raw = rng.integers(0, 256, size=(4, nbytes), dtype=np.uint8)
        # keep the f16 scale field finite: top exponent bits off. iq1_m
        # assembles its f16 from the top nibbles of the four trailing scale
        # u16s — the last byte's top nibble carries the f16 top nibble.
        if name == "iq1_m":
            raw[:, -1] &= 0xBF  # clear f16 exponent MSB -> always finite
        else:
            raw[:, 1] &= 0x7B
        want = cls.dequantize_blocks(raw).astype(np.float32)
        golden[f"{name}_raw"] = raw
        golden[f"{name}_want"] = want
        print(f"{name}: golden {want.shape}")
    gout = REPO / "tests" / "data" / "iq_golden.npz"
    gout.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(gout, **golden)
    print(f"wrote {gout} ({gout.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
