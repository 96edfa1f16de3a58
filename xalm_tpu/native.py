"""ctypes binding + lazy build of the native (C++) components.

The compute path is JAX/XLA/Pallas; the *host-side* hot paths mirror the
reference's native runtime where it matters — currently the trie tokenizer
encode (native/tokenizer.cpp), which dominates passkey-mode prompt prep.

The shared library builds on first use with g++ (cached next to the
sources); every consumer falls back to the pure-Python implementation if
the toolchain or binary is unavailable, so the framework never hard-requires
a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_SRC_DIR, "libxalm_native.so")


def _build() -> str | None:
    import glob

    srcs = sorted(glob.glob(os.path.join(_SRC_DIR, "*.cpp")))
    hdrs = glob.glob(os.path.join(_SRC_DIR, "*.hpp"))
    if not srcs:
        return None
    newest = max(os.path.getmtime(p) for p in srcs + hdrs)
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= newest:
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread", *srcs, "-o", _SO_PATH],
            check=True,
            capture_output=True,
            timeout=240,
        )
        return _SO_PATH
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def load() -> ctypes.CDLL | None:
    """The native library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.xalm_tokenizer_create.restype = ctypes.c_void_p
        lib.xalm_tokenizer_create.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.xalm_tokenizer_destroy.argtypes = [ctypes.c_void_p]
        lib.xalm_tokenizer_encode.restype = ctypes.c_size_t
        lib.xalm_tokenizer_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t, ctypes.c_int32,
        ]
        lib.xalm_tokenizer_byte_fallback_start.restype = ctypes.c_int32
        lib.xalm_tokenizer_byte_fallback_start.argtypes = [ctypes.c_void_p]
        lib.xalm_tokenizer_eot_id.restype = ctypes.c_int32
        lib.xalm_tokenizer_eot_id.argtypes = [ctypes.c_void_p]
        lib.xalm_tokenizer_vocab_size.restype = ctypes.c_size_t
        lib.xalm_tokenizer_vocab_size.argtypes = [ctypes.c_void_p]
        lib.xalm_map.restype = ctypes.c_void_p
        lib.xalm_map.argtypes = [ctypes.c_char_p]
        lib.xalm_map_size.restype = ctypes.c_uint64
        lib.xalm_map_size.argtypes = [ctypes.c_void_p]
        lib.xalm_unmap.argtypes = [ctypes.c_void_p]
        lib.xalm_copy_batch.restype = ctypes.c_int32
        lib.xalm_copy_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.xalm_prefault.restype = ctypes.c_uint64
        lib.xalm_prefault.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.xalm_alloc.restype = ctypes.c_void_p
        lib.xalm_alloc.argtypes = [ctypes.c_uint64]
        lib.xalm_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


class NativeTrie:
    """Owns a native tokenizer trie; encode-only (decode stays in Python)."""

    def __init__(self, blob: bytes, bos_id: int, eos_id: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.xalm_tokenizer_create(blob, len(blob), bos_id, eos_id)
        if not self._handle:
            raise RuntimeError("native tokenizer creation failed")

    def encode(self, data: bytes, bos: bool) -> list[int]:
        cap = len(data) + 1
        out = (ctypes.c_int32 * cap)()
        n = self._lib.xalm_tokenizer_encode(
            self._handle, data, len(data), out, cap, 1 if bos else 0
        )
        return list(out[:n])

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.xalm_tokenizer_destroy(self._handle)
            self._handle = None


class NativeMap:
    """A native mmap of a container file with a thread-pool copy engine
    (native/loader.cpp; reference xalm.h:26-47 / buffer.h / task_pool.h)."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.xalm_map(os.fsencode(path))
        if not self._handle:
            raise RuntimeError(f"xalm_map failed for {path}")
        self.size = int(lib.xalm_map_size(self._handle))

    def copy_batch(self, offsets, sizes, dests, n_threads: int = 0) -> None:
        """Parallel-copy blobs at (offset, size) into numpy arrays `dests`.

        Each dest must be C-contiguous, writable, and >= size bytes.
        """
        import numpy as np

        n = len(offsets)
        if not (n == len(sizes) == len(dests)):
            raise ValueError("offsets/sizes/dests length mismatch")
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 16)
        off = (ctypes.c_uint64 * n)(*offsets)
        sz = (ctypes.c_uint64 * n)(*sizes)
        ptrs = (ctypes.c_void_p * n)()
        for i, d in enumerate(dests):
            a = np.ascontiguousarray(d)
            if a is not d:
                raise ValueError("dest arrays must be C-contiguous")
            if d.nbytes < sizes[i]:
                raise ValueError(f"dest {i} too small: {d.nbytes} < {sizes[i]}")
            ptrs[i] = d.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.xalm_copy_batch(self._handle, off, sz, ptrs, n, n_threads)
        if rc != 0:
            raise ValueError("xalm_copy_batch: offset/size out of bounds")

    def prefault(self, n_threads: int = 0) -> int:
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 16)
        return int(self._lib.xalm_prefault(self._handle, n_threads))

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.xalm_unmap(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
