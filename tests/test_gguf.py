"""GGUF block-codec tests.

Round-trips for the quantizable formats, plus independent scalar decoders
(written here from the public GGML layout, element by element) used to
cross-check the vectorized dequantizers on random packed blocks.
"""

import numpy as np
import pytest

from xalm_tpu import gguf

RNG = np.random.default_rng(42)


def rel_err(a, b):
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-12)


# ---------------------------------------------------------------------------
# round-trip accuracy for quantize-capable codecs
# ---------------------------------------------------------------------------

ROUNDTRIP_TOL = {
    "bf16": 6e-3,
    "q8_0": 8e-3,
    "q5_0": 5e-2,
    "q5_1": 4e-2,
    "q4_0": 1.2e-1,
    "q4_1": 8e-2,
}


@pytest.mark.parametrize("name", sorted(ROUNDTRIP_TOL))
def test_roundtrip_error(name):
    x = RNG.standard_normal(4096).astype(np.float32)
    raw = gguf.quantize(x, name)
    assert raw.dtype == np.uint8
    assert raw.size == gguf.quant_byte_size(x.size, name)
    y = gguf.dequantize(raw, name, shape=x.shape)
    assert rel_err(x, y) < ROUNDTRIP_TOL[name]


@pytest.mark.parametrize("name", ["tq1_0", "tq2_0"])
def test_ternary_exact_on_grid(name):
    # values already on the {-d, 0, +d} grid survive the round trip exactly
    d = 0.5
    x = (RNG.integers(-1, 2, size=1024).astype(np.float32)) * d
    x[0] = d  # pin the absmax so the scale is exactly d
    y = gguf.dequantize(gguf.quantize(x, name), name, shape=x.shape)
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_q8_0_block_layout():
    # one block, hand-checkable: absmax 127 -> d = 1.0, codes = values
    x = np.arange(-16, 16, dtype=np.float32) * (127.0 / 16)
    x[0] = -127.0
    raw = gguf.quantize(x, "q8_0")
    d = raw[:2].view(np.float16)[0]
    q = raw[2:].view(np.int8)
    assert float(d) == pytest.approx(1.0, abs=1e-3)
    assert q[0] == -127
    y = gguf.dequantize(raw, "q8_0", shape=(32,))
    np.testing.assert_allclose(y, np.round(x), atol=1e-1)


def test_zero_block_is_zero():
    for name in ROUNDTRIP_TOL:
        x = np.zeros(256, np.float32)
        y = gguf.dequantize(gguf.quantize(x, name), name, shape=x.shape)
        np.testing.assert_array_equal(y, 0.0)


# ---------------------------------------------------------------------------
# scalar reference decoders for dequant-only formats
# ---------------------------------------------------------------------------


def f16(b, at):
    return float(b[at : at + 2].view(np.float16)[0])


def scalar_q4_k(b):
    """Element-by-element Q4_K decode per the public GGML layout:
    [d f16][dmin f16][12B packed 6-bit scale/min pairs][128B nibbles]."""
    d, dmin = f16(b, 0), f16(b, 2)
    sc8, mn8 = [], []
    s = b[4:16]
    for j in range(8):
        if j < 4:
            sc8.append(int(s[j]) & 63)
            mn8.append(int(s[j + 4]) & 63)
        else:
            sc8.append((int(s[j + 4]) & 0x0F) | ((int(s[j - 4]) >> 6) << 4))
            mn8.append((int(s[j + 4]) >> 4) | ((int(s[j]) >> 6) << 4))
    qs = b[16:]
    out = np.zeros(256, np.float32)
    for i in range(256):
        group = i // 32  # 8 groups of 32
        byte_pair = group // 2  # 4 chunks of 32 bytes; low nibbles then high
        idx_in = i % 32
        byte = int(qs[byte_pair * 32 + idx_in])
        nib = byte & 0x0F if group % 2 == 0 else byte >> 4
        out[i] = d * sc8[group] * nib - dmin * mn8[group]
    return out


def scalar_q6_k(b):
    """[128B ql][64B qh][16B int8 scales][d f16]."""
    ql, qh, scales = b[:128], b[128:192], b[192:208].view(np.int8)
    d = f16(b, 208)
    out = np.zeros(256, np.float32)
    for i in range(256):
        half = i // 128  # two 128-element halves
        j = i % 128
        lo_byte = int(ql[half * 64 + (j % 64)])
        lo = lo_byte & 0x0F if j < 64 else lo_byte >> 4
        hi_byte = int(qh[half * 32 + (j % 32)])
        hi = (hi_byte >> (2 * (j // 32))) & 3
        q = (lo | (hi << 4)) - 32
        out[i] = d * int(scales[i // 16]) * q
    return out


def scalar_iq4_nl(b):
    d = f16(b, 0)
    out = np.zeros(32, np.float32)
    for i in range(32):
        byte = int(b[2 + i % 16])
        code = byte & 0x0F if i < 16 else byte >> 4
        out[i] = d * int(gguf.IQ4_TABLE[code])
    return out


def scalar_q2_k(b):
    """[16B scale-nibble pairs][64B 2-bit codes][d f16][dmin f16]."""
    scales, qs = b[:16], b[16:80]
    d, dmin = f16(b, 80), f16(b, 82)
    out = np.zeros(256, np.float32)
    for i in range(256):
        g = i // 16  # 16 groups of 16
        sc = int(scales[g])
        half, rem = i // 128, i % 128
        q = (int(qs[half * 32 + rem % 32]) >> (2 * (rem // 32))) & 3
        out[i] = d * (sc & 0x0F) * q - dmin * (sc >> 4)
    return out


def scalar_q3_k(b):
    """[32B high-bit mask][64B 2-bit codes][12B 6-bit scales][d f16]."""
    hmask, qs, scales = b[:32], b[32:96], b[96:108]
    d = f16(b, 108)
    out = np.zeros(256, np.float32)
    for i in range(256):
        g = i // 16
        lo = (int(scales[g % 8]) >> (4 * (g // 8))) & 0x0F
        hi = (int(scales[8 + g % 4]) >> (2 * (g // 4))) & 3
        sc = (lo | (hi << 4)) - 32
        half, rem = i // 128, i % 128
        ql = (int(qs[half * 32 + rem % 32]) >> (2 * (rem // 32))) & 3
        hbit = (int(hmask[i % 32]) >> (i // 32)) & 1
        out[i] = d * sc * (ql - (0 if hbit else 4))
    return out


def _k_pairs(s):
    """8 (scale, min) 6-bit pairs from the 12-byte Q4_K/Q5_K field."""
    sc8, mn8 = [], []
    for j in range(8):
        if j < 4:
            sc8.append(int(s[j]) & 63)
            mn8.append(int(s[j + 4]) & 63)
        else:
            sc8.append((int(s[j + 4]) & 0x0F) | ((int(s[j - 4]) >> 6) << 4))
            mn8.append((int(s[j + 4]) >> 4) | ((int(s[j]) >> 6) << 4))
    return sc8, mn8


def scalar_q5_k(b):
    """[d f16][dmin f16][12B pairs][32B high bits][128B nibbles]."""
    d, dmin = f16(b, 0), f16(b, 2)
    sc8, mn8 = _k_pairs(b[4:16])
    qh, qs = b[16:48], b[48:176]
    out = np.zeros(256, np.float32)
    for i in range(256):
        g, j = i // 32, i % 32
        byte = int(qs[(g // 2) * 32 + j])
        lo = byte & 0x0F if g % 2 == 0 else byte >> 4
        hi = (int(qh[j]) >> g) & 1
        out[i] = d * sc8[g] * (lo | (hi << 4)) - dmin * mn8[g]
    return out


def scalar_iq4_xs(b):
    """[d f16][sh u16][sl 4B][128B nibbles], 6-bit scales, IQ4 code table."""
    d = f16(b, 0)
    sh = int(b[2]) | (int(b[3]) << 8)
    sl, qs = b[4:8], b[8:136]
    out = np.zeros(256, np.float32)
    for i in range(256):
        g, j = i // 32, i % 32
        lo = (int(sl[g // 2]) >> (4 * (g % 2))) & 0x0F
        hi = (sh >> (2 * g)) & 3
        sc = (lo | (hi << 4)) - 32
        byte = int(qs[g * 16 + j % 16])
        code = byte & 0x0F if j < 16 else byte >> 4
        out[i] = d * sc * int(gguf.IQ4_TABLE[code])
    return out


def scalar_tq1_0(b):
    """Base-3 digits five-per-byte (x 256/243): [32B x5][16B x5][4B x4][d]."""
    d = f16(b, 52)

    def trit(byte, p):
        return (((int(byte) * 3**p) % 256) * 3) // 256 - 1

    out = np.zeros(256, np.float32)
    for i in range(256):
        if i < 160:
            out[i] = d * trit(b[i % 32], i // 32)
        elif i < 240:
            out[i] = d * trit(b[32 + (i - 160) % 16], (i - 160) // 16)
        else:
            out[i] = d * trit(b[48 + (i - 240) % 4], (i - 240) // 4)
    return out


@pytest.mark.parametrize(
    "name,scalar",
    [
        ("q2_k", scalar_q2_k),
        ("q3_k", scalar_q3_k),
        ("q4_k", scalar_q4_k),
        ("q5_k", scalar_q5_k),
        ("q6_k", scalar_q6_k),
        ("iq4_nl", scalar_iq4_nl),
        ("iq4_xs", scalar_iq4_xs),
        ("tq1_0", scalar_tq1_0),
    ],
)
def test_dequant_matches_scalar_reference(name, scalar):
    block, nbytes = gguf.GGUF_SIZES[name]
    raw = RNG.integers(0, 256, size=3 * nbytes, dtype=np.uint8)
    got = gguf.dequantize(raw, name).reshape(3, block)
    for i in range(3):
        want = scalar(raw[i * nbytes : (i + 1) * nbytes])
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# IQ codebook formats: pinned to golden vectors produced by the reference's
# own decoder (tests/data/iq_golden.npz, tools/extract_iq_grids.py)
# ---------------------------------------------------------------------------

IQ_FORMATS = ["iq1_s", "iq1_m", "iq2_xxs", "iq2_xs", "iq2_s", "iq3_xxs", "iq3_s"]


@pytest.mark.parametrize("name", IQ_FORMATS)
def test_iq_codebook_matches_golden(name):
    import pathlib

    data = np.load(pathlib.Path(__file__).parent / "data" / "iq_golden.npz")
    raw, want = data[f"{name}_raw"], data[f"{name}_want"]
    got = gguf.dequantize(raw.reshape(-1), name).reshape(want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", IQ_FORMATS)
def test_iq_codebook_shapes(name):
    block, nbytes = gguf.GGUF_SIZES[name]
    raw = np.zeros(2 * nbytes, np.uint8)
    out = gguf.dequantize(raw, name)
    assert out.shape == (2 * block,)
    assert out.dtype == np.float32


def test_tq1_0_roundtrip_random_ternary():
    # every ternary pattern must survive: exercises all three packing groups
    d = 1.0
    t = RNG.integers(-1, 2, size=(4, 256)).astype(np.float32) * d
    t[:, 7] = 1.0  # pin absmax
    for row in t:
        y = gguf.dequantize(gguf.quantize(row, "tq1_0"), "tq1_0", shape=row.shape)
        np.testing.assert_allclose(y, row, atol=1e-3)
