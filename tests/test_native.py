"""Native C++ tokenizer: build, bind, and match the Python implementation."""

import numpy as np
import pytest

from tests.make_tiny_model import make_tiny_model
from xalm_tpu.convert import convert as cvt
from xalm_tpu.io import XalmFile
from xalm_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    hf = make_tiny_model(str(tmp_path_factory.mktemp("hf") / "tiny"))
    out = str(tmp_path_factory.mktemp("x") / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    with XalmFile(out) as xf:
        return Tokenizer.from_xalm(xf)


def test_native_builds(tok):
    # the baked toolchain must be present in this environment; if this fails
    # the build or binding broke (fallback would silently hide it)
    assert tok._native is not None, "native tokenizer failed to build/load"


def test_native_matches_python(tok):
    native = tok._native
    assert native is not None
    texts = [
        "hello world",
        "the quick brown fox jumps over the lazy dog",
        "héllo ☃ unicode ßtring",
        "",
        " " * 50,
        "a" * 1000,
        "What is the pass key? The pass key is 42381.",
    ]
    for text in texts:
        data = text.encode("utf-8")
        got = native.encode(data, True)
        # force the python path
        tok._native = None
        try:
            expect = tok.encode(text)
        finally:
            tok._native = native
        assert got == expect, text[:40]


def test_native_encode_speedup(tok):
    """Native encode should beat Python on long prompts (sanity, not a
    strict perf gate — CI machines vary)."""
    import time

    text = ("The grass is green. The sky is blue. " * 3000).encode()
    native = tok._native
    t_native = min(
        _timed(lambda: native.encode(text, True))[0] for _ in range(3)
    )
    n_out = native.encode(text, True)
    tok._native = None
    try:
        t_python = min(_timed(lambda: tok.encode(text))[0] for _ in range(3))
        p_out = tok.encode(text)
    finally:
        tok._native = native
    assert n_out == p_out
    # generous margin: shared CI machines jitter; native is ~10x in practice
    assert t_native < t_python * 1.5, (t_native, t_python)


def _timed(f):
    import time

    t0 = time.perf_counter()
    r = f()
    return time.perf_counter() - t0, r


# ---------------------------------------------------------------------------
# native container loader (native/loader.cpp)
# ---------------------------------------------------------------------------


def test_native_map_copy_batch(tmp_path):
    import numpy as np

    from xalm_tpu.native import NativeMap, load as load_lib

    if load_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")

    payload = np.arange(1 << 16, dtype=np.uint8)
    p = tmp_path / "blob.bin"
    p.write_bytes(payload.tobytes())
    nm = NativeMap(str(p))
    assert nm.size == payload.size

    d1 = np.empty(1000, np.uint8)
    d2 = np.empty(30000, np.uint8)
    nm.copy_batch([5, 1234], [1000, 30000], [d1, d2], n_threads=4)
    np.testing.assert_array_equal(d1, payload[5:1005])
    np.testing.assert_array_equal(d2, payload[1234:31234])

    import pytest

    with pytest.raises(ValueError):
        nm.copy_batch([nm.size - 10], [100], [np.empty(100, np.uint8)])
    with pytest.raises(ValueError):  # dest too small
        nm.copy_batch([0], [200], [np.empty(100, np.uint8)])
    assert nm.prefault(4) == int(payload[::4096].sum())
    nm.close()


def test_read_stack_matches_views(tmp_path):
    import numpy as np

    hf = make_tiny_model(str(tmp_path / "hf"))
    out = str(tmp_path / "tiny.xalm")
    assert cvt.main(["--input", hf, "--output", out, "--type", "f16"]) == 0
    xf = XalmFile(out)
    names = [n for n in xf.tensors if ".attn.q.weight" in n]
    stacked = xf.read_stack(names)
    for r, n in enumerate(names):
        np.testing.assert_array_equal(
            stacked[r].view(np.uint8), np.asarray(xf.load(n)).view(np.uint8)
        )
    xf.close()


def test_native_aligned_alloc():
    import ctypes

    from xalm_tpu.native import load as load_lib

    lib = load_lib()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    for size in (1, 63, 64, 4097):
        p = lib.xalm_alloc(size)
        assert p and p % 64 == 0  # cache-line aligned (reference buffer.h)
        lib.xalm_free(ctypes.c_void_p(p))


def test_prefault_checksum_unaligned_stripes(tmp_path):
    import numpy as np

    from xalm_tpu.native import NativeMap, load as load_lib

    if load_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    # size deliberately NOT divisible by threads*page: stripes must still
    # sample at page boundaries
    payload = np.arange(3 * 4096 + 123, dtype=np.uint64).astype(np.uint8)
    p = tmp_path / "odd.bin"
    p.write_bytes(payload.tobytes())
    nm = NativeMap(str(p))
    want = int(payload[::4096].sum())
    for n_threads in (1, 2, 3, 4, 7):
        assert nm.prefault(n_threads) == want, n_threads
    nm.close()
