"""Bit-packer + float-lab tests (reference convert.py:368-651, types.h:635-882)."""

import numpy as np
import pytest

from xalm_tpu import floatlab, packing, quant

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 10, 12, 16])
def test_pack_bits_roundtrip(bits):
    n = 96
    v = RNG.integers(0, 1 << bits, size=n).astype(np.uint16)
    raw = packing.pack_bits(v, bits)
    assert raw.size == packing.packed_size(n, bits)
    np.testing.assert_array_equal(packing.unpack_bits(raw, bits, n), v)


def test_pack_bits_rejects_overflow():
    with pytest.raises(ValueError):
        packing.pack_bits(np.array([8], np.uint8), 3)


def test_qi8_roundtrip():
    x = np.linspace(-1, 1, 256).astype(np.float32)
    y = packing.dequantize_qi8(packing.quantize_qi8(x))
    assert np.abs(x - y).max() <= 0.5 / 127.5 + 1e-6


@pytest.mark.parametrize(
    "qf,dqf,step",
    [
        (packing.quantize_qi4, packing.dequantize_qi4, 1 / 7.5),
        (packing.quantize_qi3, packing.dequantize_qi3, 1 / 3.5),
    ],
)
def test_qi_low_bit_roundtrip(qf, dqf, step):
    x = RNG.uniform(-1, 1, 64).astype(np.float32)
    y = dqf(qf(x), x.size)
    assert np.abs(x - y).max() <= step / 2 + 1e-6


def test_qi_clamps_out_of_range():
    y = packing.dequantize_qi4(packing.quantize_qi4(np.array([5.0, -5.0], np.float32)), 2)
    np.testing.assert_allclose(y, [1.0, -1.0], atol=1e-6)


# ---------------------------------------------------------------------------
# float lab
# ---------------------------------------------------------------------------


def test_f4_e2m1_grid():
    # standard E2M1 value set (with denormals): 0, .25, .5, .75, 1, 1.5, ... 6
    spec = floatlab.F4_E2M1
    vals = sorted(set(float(spec.decode(np.array([c]))[0]) for c in range(8)))
    assert vals == [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]
    assert spec.max_value() == 6.0


def test_zero_encodes_to_zero():
    # the reference's f4 decode had no zero (input 0 -> 0.5); ours must
    for spec in (floatlab.F4_E2M1, floatlab.F6_E3M2, floatlab.F6_E2M3):
        assert float(spec.roundtrip(np.array([0.0]))[0]) == 0.0


def test_encode_picks_nearest():
    spec = floatlab.F4_E2M1
    x = np.array([0.1, 0.3, 1.2, 2.4, 100.0, -2.6], np.float32)
    y = spec.roundtrip(x)
    np.testing.assert_allclose(y, [0.0, 0.5, 1.0, 2.0, 6.0, -3.0], atol=1e-6)


def test_roundtrip_idempotent():
    for spec in (floatlab.F4_E2M1, floatlab.F6_E3M2, floatlab.F8_E4M3):
        x = RNG.standard_normal(128).astype(np.float32)
        once = spec.roundtrip(x)
        np.testing.assert_array_equal(spec.roundtrip(once), once)


def test_f8_e4m3_matches_hardware_dtype():
    import ml_dtypes

    x = RNG.standard_normal(512).astype(np.float32) * 4
    ours = floatlab.F8_E4M3.roundtrip(x)
    hw = x.astype(ml_dtypes.float8_e4m3fn).astype(np.float32)
    # same grid; ties may round differently, so compare against half a step
    err = np.abs(ours - hw)
    step = np.abs(hw) * 2.0**-3 + 2**-9
    assert (err <= step / 2 + 1e-7).mean() > 0.99


def test_f8_e2m5_e3m4_variants():
    """The reference instantiates all four E+M==7 software-f8 splits
    (reference src/types.h:317-320); the lab names them all. E2M5/E3M4 are
    analysis-only formats: fine mantissa grids, narrow exponent range."""
    for spec, emax in ((floatlab.F8_E2M5, 4), (floatlab.F8_E3M4, 16)):
        assert spec.exp_bits + spec.man_bits == 7
        # max normal = (2 - 2^-M) * 2^(e_max - bias)
        assert spec.max_value() == (2 - 2.0 ** -spec.man_bits) * emax
        x = RNG.standard_normal(256).astype(np.float32)
        once = spec.roundtrip(x)
        np.testing.assert_array_equal(spec.roundtrip(once), once)
        # E2M5's 5-bit mantissa resolves 1/32 steps around 1.0
    assert float(floatlab.F8_E2M5.roundtrip(np.array([1.0 + 1 / 32]))[0]) == 1.0 + 1 / 32


def test_describe_lists_all_codes():
    out = floatlab.F4_E2M1.describe()
    assert len(out.splitlines()) == 1 + 16
    assert "bias=1" in out


def test_mappings_monotonic():
    f = np.linspace(0, 1, 64, endpoint=False)
    for name, (fwd, inv) in floatlab.MAPPINGS.items():
        m = fwd(f)
        assert np.all(np.diff(m) > 0), name
        assert m[0] == pytest.approx(1.0)
        np.testing.assert_allclose(inv(m), f, atol=1e-6)


def test_packed_minifloat_roundtrip():
    x = RNG.standard_normal(40).astype(np.float32)
    y4 = packing.dequantize_f4_e2m1(packing.quantize_f4_e2m1(x), x.size)
    y6 = packing.dequantize_f6_e3m2(packing.quantize_f6_e3m2(x), x.size)
    # f6 has more codes -> strictly better worst-case error on this sample
    assert np.abs(y6 - np.clip(x, -15, 15)).max() <= np.abs(y4 - np.clip(x, -3, 3)).max() + 1e-6


# ---------------------------------------------------------------------------
# quant-layer integration (simulated formats)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", quant.SIMULATED_TYPES)
def test_quant_simulated_roundtrip(name):
    x = RNG.standard_normal((8, 256)).astype(np.float32) * 0.05
    q = quant.quantize(x, name)
    assert q.values.dtype == np.float16
    assert q.packed_nbytes is not None and q.packed_nbytes < x.nbytes
    back = quant.dequantize(q, name)
    assert back.shape == x.shape
    # weights are small-valued; every scheme should land within its grid step
    assert np.abs(back - x).max() < 0.3


def test_analyze_simulated_reports_packed_bytes():
    x = RNG.standard_normal((4, 256)).astype(np.float32) * 0.02
    m = quant.analyze(x, "q4_0")
    assert m["bytes"] == 4 * 256 // 32 * 18
    assert m["cosine"] > 0.95


def test_encode_nan_uses_reserved_code():
    # formats with a NaN code: non-finite inputs round-trip to NaN, not max
    spec = floatlab.F8_E4M3
    x = np.array([np.nan, np.inf, -np.inf, 1.0], np.float32)
    y = spec.decode(spec.encode(x))
    assert np.isnan(y[:3]).all()
    assert np.isfinite(y[3])


def test_encode_nan_raises_without_nan_code():
    with pytest.raises(ValueError):
        floatlab.F4_E2M1.encode(np.array([np.nan], np.float32))
