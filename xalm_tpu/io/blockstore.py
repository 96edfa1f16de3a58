"""xalm v2 block store: a hash-keyed, aligned, lazily-loaded blob container.

Realizes the container design the reference sketched but never shipped
(reference src/XalmFile.h:10-204, fully commented out): typed KV blocks
addressed by an xxh3_64 key hash, 32-byte-aligned payloads, and lazy blob
loading — the index is read eagerly, bytes only when asked.

Wire format (little-endian):

    [magic  b"XBK2"] [u32 version = 2]
    [u64 index_size] [index JSON, NUL-padded to 32-aligned]
    blobs, each 32-byte aligned

    index JSON: {"blocks": [{"key": str, "khash": int, "dtype": str,
                             "shape": [int...], "offset": int, "size": int,
                             "hash": int}],
                 "meta": {<user metadata, str -> json>}}

``offset`` is relative to the start of the blob region (end of padded
index). Content hashes are xxh3_64 like the v1 weight container
(convert.py:265-267). Numpy dtypes are stored by ``np.dtype(...).str`` so
anything numpy can describe round-trips (ml_dtypes included).

Primary consumer: KV-cache persistence / session resume (runtime/session.py)
— a capability the reference lacks entirely (SURVEY.md §5.4 "no KV-cache
persistence, no session resume").
"""

from __future__ import annotations

import dataclasses
import json
import mmap
import os
import struct

import numpy as np

__all__ = ["BlockInfo", "BlockStore", "write_blocks"]

_MAGIC = b"XBK2"
_VERSION = 2
_ALIGN = 32


def _align(n: int) -> int:
    return (n + _ALIGN - 1) // _ALIGN * _ALIGN


def _khash(key: str) -> int:
    import xxhash

    return xxhash.xxh3_64(key.encode("utf-8")).intdigest()


@dataclasses.dataclass(frozen=True)
class BlockInfo:
    key: str
    khash: int
    dtype: np.dtype
    shape: tuple[int, ...]
    offset: int  # absolute file offset
    size: int
    hash: int


def write_blocks(
    path: str | os.PathLike,
    blocks: dict[str, np.ndarray],
    meta: dict | None = None,
    compute_hashes: bool = True,
) -> None:
    """Write a block store; insertion order is the on-disk order."""
    import xxhash

    entries = []
    offset = 0
    blobs: list[bytes] = []
    for key, arr in blocks.items():
        arr = np.ascontiguousarray(arr)
        blob = arr.tobytes()
        offset = _align(offset)
        entries.append(
            {
                "key": key,
                "khash": _khash(key),
                "dtype": np.dtype(arr.dtype).str,
                "shape": [int(s) for s in arr.shape],
                "offset": offset,
                "size": len(blob),
                "hash": xxhash.xxh3_64(blob).intdigest() if compute_hashes else 0,
            }
        )
        blobs.append(blob)
        offset += len(blob)

    index = json.dumps({"blocks": entries, "meta": meta or {}}).encode("utf-8")
    # pad so the blob region (16-byte header + index) starts 32-aligned
    index_size = _align(len(index) + 16) - 16
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", _VERSION))
        f.write(struct.pack("<Q", index_size))
        f.write(index)
        f.write(b"\x00" * (index_size - len(index)))
        data_start = 16 + index_size
        pos = data_start
        for blob, e in zip(blobs, entries):
            target = data_start + e["offset"]
            if target > pos:
                f.write(b"\x00" * (target - pos))
                pos = target
            f.write(blob)
            pos += len(blob)


class BlockStore:
    """Read side: eager index, lazy mmap'd blobs (XalmFile.h's contract)."""

    def __init__(self, path: str | os.PathLike):
        self.path = os.fspath(path)
        with open(self.path, "rb") as f:
            head = f.read(16)
            if len(head) != 16 or head[:4] != _MAGIC:
                raise ValueError(f"{self.path}: not an xalm v2 block store")
            version = struct.unpack("<I", head[4:8])[0]
            if version != _VERSION:
                raise ValueError(f"{self.path}: unsupported version {version}")
            index_size = struct.unpack("<Q", head[8:16])[0]
            raw = f.read(index_size)
            if len(raw) != index_size:
                raise ValueError(f"{self.path}: truncated index")
        index = json.loads(raw.split(b"\x00", 1)[0].decode("utf-8"))
        self.meta: dict = index.get("meta", {})

        data_start = 16 + index_size
        file_size = os.path.getsize(self.path)
        self.blocks: dict[str, BlockInfo] = {}
        self._by_hash: dict[int, BlockInfo] = {}
        for e in index["blocks"]:
            info = BlockInfo(
                key=e["key"],
                khash=int(e["khash"]),
                dtype=np.dtype(e["dtype"]),
                shape=tuple(int(s) for s in e["shape"]),
                offset=data_start + int(e["offset"]),
                size=int(e["size"]),
                hash=int(e["hash"]),
            )
            if info.offset % _ALIGN or info.offset + info.size > file_size:
                raise ValueError(f"{self.path}: block {info.key} out of bounds/misaligned")
            if info.khash != _khash(info.key):
                raise ValueError(f"{self.path}: block {info.key} key-hash mismatch")
            self.blocks[info.key] = info
            self._by_hash[info.khash] = info

        self._file = open(self.path, "rb")
        self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        self._view = np.frombuffer(self._mmap, dtype=np.uint8)

    def __contains__(self, key: str) -> bool:
        return key in self.blocks

    def keys(self):
        return self.blocks.keys()

    def get(self, key: str | int) -> np.ndarray:
        """Zero-copy view of a block by key (or key hash), loaded lazily."""
        info = self._by_hash[key] if isinstance(key, int) else self.blocks[key]
        raw = self._view[info.offset : info.offset + info.size]
        return raw.view(info.dtype).reshape(info.shape)

    def verify(self, key: str) -> bool:
        import xxhash

        info = self.blocks[key]
        if info.hash == 0:
            return True
        raw = self._view[info.offset : info.offset + info.size]
        return xxhash.xxh3_64(raw.tobytes()).intdigest() == info.hash

    def close(self) -> None:
        if getattr(self, "_mmap", None) is not None:
            self._view = None
            try:
                self._mmap.close()
            except BufferError:
                pass
            self._file.close()
            self._mmap = None

    def __enter__(self) -> "BlockStore":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
