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
    src = os.path.join(_SRC_DIR, "tokenizer.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", src, "-o", _SO_PATH],
            check=True,
            capture_output=True,
            timeout=120,
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
