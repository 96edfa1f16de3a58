"""Reader/writer for the ``.xalm`` frozen-weight container.

Format (wire-compatible with the reference; reader: reference
src/xalm.h:90-192, writer: reference convert.py:248-321):

- ``uint64`` little-endian prefix H = total header size in bytes, i.e. the
  absolute file offset at which the data blob starts (the prefix itself and
  any zero padding included).
- UTF-8 JSON header::

      {"xalm": {"version": 1},
       "<Arch>": {"config": {<str keys -> str values>},
                  "tensors": {name: {"type": str, "shape": [int...],
                                     "offset": int, "size": int,
                                     "hash": int}}}}

  ``offset`` is relative to the start of the data blob; the reader adds H.
- Zero padding so the data blob starts 4096-aligned (the writer pads to
  ``align(tell + 128, 4096)``, convert.py:283-296).
- Tensor byte blobs, each 32-byte aligned (convert.py:33-35).

The reference streams each tensor with seek+read into freshly allocated
buffers (xalm.h:26-47). Here we instead ``mmap`` the whole file once and hand
out zero-copy numpy views — the idiomatic host-side feeding path for
``jax.device_put``: no double buffering, the OS pages weights in as the
device transfer streams them.

xalm_tpu extension (version stays 1; extra fields are additive):
``i8`` tensors carry a sibling ``<name>.scale`` f32 tensor with per-output-row
dequant scales (see xalm_tpu.dtypes).
"""

from __future__ import annotations

import dataclasses
import json
import mmap
import os
import struct

import numpy as np

from xalm_tpu import dtypes as xdt

__all__ = ["TensorInfo", "XalmFile", "write_xalm", "SUPPORTED_ARCHS"]

# Architectures the reference accepts (xalm.h:141).
SUPPORTED_ARCHS = (
    "LlamaForCausalLM",
    "MistralForCausalLM",
    "GemmaForCausalLM",
    "Qwen2ForCausalLM",
    "MixtralForCausalLM",
    "Phi3ForCausalLM",
    "Gemma2ForCausalLM",
    "Qwen3ForCausalLM",
)

_ALIGN_TENSOR = 32
_ALIGN_DATA = 4096


def _align(offset: int, alignment: int) -> int:
    return (offset + alignment - 1) // alignment * alignment


@dataclasses.dataclass(frozen=True)
class TensorInfo:
    name: str
    dtype: xdt.XDType
    shape: tuple[int, ...]
    offset: int  # absolute file offset
    size: int  # bytes
    hash: int | None = None


class XalmFile:
    """An open, mmapped .xalm container."""

    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        with open(self.path, "rb") as f:
            prefix = f.read(8)
            if len(prefix) != 8:
                raise ValueError(f"{self.path}: truncated header")
            header_size = struct.unpack("<Q", prefix)[0]
            file_size = os.fstat(f.fileno()).st_size
            if header_size <= 8 or header_size > file_size:
                raise ValueError(
                    f"{self.path}: bad header size {header_size} for file size {file_size}"
                )
            raw = f.read(header_size - 8)
        # Header JSON is NUL-padded up to the data offset (convert.py:283-296);
        # the reference parses up to the first NUL (xalm.h:103-115).
        json_text = raw.split(b"\x00", 1)[0].decode("utf-8")
        header = json.loads(json_text)

        if header.get("xalm", {}).get("version") != 1:
            raise ValueError(f"{self.path}: xalm version mismatch: {header.get('xalm')}")

        self.arch: str | None = None
        self.config: dict = {}
        self.tensors: dict[str, TensorInfo] = {}

        for key, val in header.items():
            if key == "xalm":
                continue
            if key not in SUPPORTED_ARCHS:
                raise ValueError(f"{self.path}: unsupported model architecture: {key}")
            self.arch = key
            self.config = dict(val["config"])
            for name, meta in val["tensors"].items():
                dtype = xdt.parse(meta["type"])
                shape = tuple(int(s) for s in meta["shape"])
                if len(shape) > 4:
                    raise ValueError(f"{name}: shape exceeds 4 dimensions")
                offset = int(meta["offset"])
                size = int(meta["size"])
                if offset < 0 or size < 0 or header_size + offset + size > file_size:
                    raise ValueError(f"{name}: offset/size out of range")
                expect = dtype.nbytes(shape)
                if expect != size:
                    raise ValueError(
                        f"{name}: size {size} != dtype/shape implied {expect}"
                    )
                self.tensors[name] = TensorInfo(
                    name, dtype, shape, header_size + offset, size, meta.get("hash")
                )
        if self.arch is None:
            raise ValueError(f"{self.path}: no architecture section in header")

        self._file = open(self.path, "rb")
        self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        self._view = np.frombuffer(self._mmap, dtype=np.uint8)
        self._native = None  # lazy NativeMap for parallel materialization

    def close(self) -> None:
        # Zero-copy views handed out by load() may still be alive; dropping our
        # references lets refcounting unmap once the last view dies (mmap dups
        # the fd, so closing the file object is always safe).
        if getattr(self, "_native", None) is not None:
            self._native.close()
            self._native = None
        if getattr(self, "_mmap", None) is not None:
            self._view = None
            try:
                self._mmap.close()
            except BufferError:
                pass
            self._file.close()
            self._mmap = None

    def __enter__(self) -> "XalmFile":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __contains__(self, name: str) -> bool:
        return name in self.tensors

    def load(self, name: str) -> np.ndarray:
        """Zero-copy numpy view of a tensor's raw storage (read-only)."""
        info = self.tensors[name]
        raw = self._view[info.offset : info.offset + info.size]
        arr = raw.view(info.dtype.np_dtype).reshape(info.shape)
        return arr

    def _native_map(self):
        if self._native is None:
            from xalm_tpu.native import NativeMap

            self._native = NativeMap(self.path)
        return self._native

    def read_stack(self, names: list[str], n_threads: int = 0) -> np.ndarray:
        """Materialize same-shaped tensors directly into one stacked
        (len(names), *shape) array, rows copied by the native worker pool.
        Replaces load()+np.stack (which copies serially) on the load path.
        """
        infos = [self.tensors[n] for n in names]
        shape, dt = infos[0].shape, infos[0].dtype
        if any(i.shape != shape or i.dtype.name != dt.name for i in infos):
            raise ValueError("read_stack requires homogeneous tensors")
        out = np.empty((len(infos),) + shape, dt.np_dtype)
        try:
            nm = self._native_map()
        except (RuntimeError, ImportError):
            for r, i in enumerate(infos):
                np.copyto(out[r].view(np.uint8).reshape(-1), self._view[i.offset : i.offset + i.size])
            return out
        nm.copy_batch(
            [i.offset for i in infos],
            [i.size for i in infos],
            [out[r] for r in range(len(infos))],
            n_threads=n_threads,
        )
        return out

    def prefault(self, n_threads: int = 0) -> None:
        """Pull the whole container through the page cache in parallel
        (cold-load accelerator; no-op if the native library is unavailable)."""
        try:
            self._native_map().prefault(n_threads)
        except (RuntimeError, ImportError):
            pass

    def verify(self, name: str) -> bool:
        """Check the stored xxh3_64 content hash (convert.py:265-267).

        The reference loader ignores these; we expose them as an integrity
        check (SURVEY.md §4 item 6).
        """
        info = self.tensors[name]
        if info.hash is None:
            return True
        import xxhash

        raw = self._view[info.offset : info.offset + info.size]
        return xxhash.xxh3_64(raw.tobytes()).intdigest() == info.hash

    def format(self, histograms: bool = False) -> str:
        """Human-readable tensor listing (reference file_info::format,
        xalm.h:49-62). ``histograms=True`` adds a per-tensor value-
        distribution sparkline + min/max cell (the reference table.h's
        histogram-in-cell rendering, table.h:1-618 / stats.h:38-53) —
        this dequantizes every tensor, so it reads the whole file."""
        from xalm_tpu.obs.table import Table

        cols = ["#", "name", "type", "shape", "size"]
        if histograms:
            cols += ["distribution", "min", "max"]
        # "h" = human-readable bytes; numeric columns right-align by
        # deduction (reference table.h:28-49 deduced formats/alignment)
        tbl = Table(cols, formats={"size": "h", "min": "+.4g", "max": "+.4g"})
        for i, (name, t) in enumerate(self.tensors.items()):
            row = [i, name, t.dtype.name, "x".join(map(str, t.shape)),
                   t.size]
            if histograms:
                from xalm_tpu import quant
                from xalm_tpu.obs.stats import Histogram

                scale = None
                sname = name + ".scale"
                if t.dtype.name == "i8" and sname in self.tensors:
                    scale = self.load(sname)
                vals = np.asarray(
                    quant.dequantize(self.load(name), t.dtype.name, scale),
                    np.float32,
                ).ravel()
                sample = vals[:: max(vals.size // 65536, 1)]
                h = Histogram(sample, bins=10)
                row += [h, float(h.min), float(h.max)]  # histogram cell
            tbl.add(*row)
        return tbl.format(title=self.path)


def write_xalm(
    path: str | os.PathLike,
    arch: str,
    config: dict[str, str],
    tensors: dict[str, np.ndarray],
    compute_hashes: bool = True,
) -> None:
    """Write a .xalm container (format per reference convert.py:248-321).

    ``tensors`` maps canonical names to numpy arrays whose dtypes are in the
    registry; insertion order is preserved as the on-disk order. ``config``
    values must already be strings (the format is stringly-typed,
    convert.py:323-245).
    """
    if arch not in SUPPORTED_ARCHS:
        raise ValueError(f"unsupported arch {arch}")

    np_to_name = {t.np_dtype: t.name for t in xdt.REGISTRY.values()}
    # i8/q8 share int8 storage; callers tag via a companion dict is overkill —
    # we distinguish by scale-tensor presence.
    meta_tensors: dict[str, dict] = {}
    blobs: list[bytes] = []
    offset = 0
    for name, arr in tensors.items():
        dt = np.dtype(arr.dtype)
        if dt not in np_to_name:
            raise ValueError(f"{name}: dtype {dt} has no xalm container type")
        tname = np_to_name[dt]
        if dt == np.dtype(np.int8):
            tname = "i8" if xdt.scale_name(name) in tensors else "q8"
        blob = np.ascontiguousarray(arr).tobytes()
        offset = _align(offset, _ALIGN_TENSOR)
        entry = {
            "type": tname,
            "shape": [int(s) for s in arr.shape],
            "offset": offset,
            "size": len(blob),
        }
        if compute_hashes:
            import xxhash

            entry["hash"] = xxhash.xxh3_64(blob).intdigest()
        meta_tensors[name] = entry
        blobs.append(blob)
        offset += len(blob)

    header = {"xalm": {"version": 1}, arch: {"config": config, "tensors": meta_tensors}}
    payload = json.dumps(header).encode("utf-8")
    data_start = _align(8 + len(payload) + 128, _ALIGN_DATA)

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", data_start))
        f.write(payload)
        f.write(b"\x00" * (data_start - 8 - len(payload)))
        pos = data_start
        for blob, (name, entry) in zip(blobs, meta_tensors.items()):
            target = data_start + entry["offset"]
            if target > pos:
                f.write(b"\x00" * (target - pos))
                pos = target
            f.write(blob)
            pos += len(blob)
