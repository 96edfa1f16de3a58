"""Trie-based greedy longest-match tokenizer with byte fallback.

Behavioral rebuild of the reference tokenizer (reference src/tokenizer.{h,cpp}):

- Vocab comes from the ``tokenizer.tokens`` U8 tensor: NUL-terminated strings,
  one per token id (format doc: reference tokenizer.h:19-50).
- Byte-fallback token range detected by locating ``<0x00>``
  (tokenizer.cpp:44-50); EOT id detected by scanning for
  ``<|eot_id|>`` / ``<|end|>`` / ``<|im_end|>``.
- ``encode``: greedy longest match over a byte-trie, falling back to
  ``<0xNN>`` byte tokens (tokenizer.cpp:82-119).
- ``decode_one``: strips one leading space after BOS (sentencepiece
  convention), maps byte-fallback ids to raw bytes (tokenizer.cpp:69-80).

The trie here is byte-keyed (tokens are arbitrary byte strings after the
converter's UTF-8/GPT-2 normalization, convert side: xalm_tpu/convert).
Encoding is a host-side operation, so plain Python dict-tries are fine; a
C++ fast path can be slotted in behind the same interface.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Tokenizer"]


def _parse_id(value: str) -> int:
    # metadata ids may be "2" or "[2, 3]" (reference tokenizer.cpp:4-21)
    value = value.strip()
    if value.startswith("["):
        value = value[1:-1].split(",")[0]
    return int(value)


class Tokenizer:
    def __init__(self, tokens_blob: np.ndarray, bos_token_id: str, eos_token_id: str):
        """``tokens_blob``: the ``tokenizer.tokens`` U8 tensor; bos/eos from
        the container config (stringly-typed)."""
        self.bos_id = _parse_id(bos_token_id)
        self.eos_id = _parse_id(eos_token_id)

        blob = tokens_blob.tobytes()
        # NUL-terminated strings; a trailing NUL terminates the last token.
        self.vocab: list[bytes] = blob.split(b"\x00")
        if self.vocab and self.vocab[-1] == b"":
            self.vocab.pop()

        self.byte_fallback_start = -1
        self.eot_id = -1
        for i, tok in enumerate(self.vocab):
            if tok == b"<0x00>":
                self.byte_fallback_start = i
            elif tok in (b"<|eot_id|>", b"<|end|>", b"<|im_end|>"):
                self.eot_id = i

        # byte-keyed trie: {byte: [token_id | None, children]}
        self._trie: dict = {}
        for i, word in enumerate(self.vocab):
            if not word:
                continue
            node = self._trie
            entry = None
            for b in word:
                entry = node.setdefault(b, [None, {}])
                node = entry[1]
            entry[0] = i

        # native C++ trie fast path (xalm_tpu/native.py); encode() falls back
        # to the Python trie when the toolchain/library is unavailable
        self._native = None
        try:
            from xalm_tpu.native import NativeTrie

            self._native = NativeTrie(blob, self.bos_id, self.eos_id)
        except Exception:
            self._native = None

    @classmethod
    def from_xalm(cls, xf) -> "Tokenizer":
        return cls(
            xf.load("tokenizer.tokens"),
            xf.config["bos_token_id"],
            xf.config["eos_token_id"],
        )

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text: str | bytes, bos: bool = True) -> list[int]:
        data = text.encode("utf-8") if isinstance(text, str) else text
        if self._native is not None:
            return self._native.encode(data, bos)
        out: list[int] = [self.bos_id] if bos else []
        i = 0
        n = len(data)
        while i < n:
            node = self._trie
            best_id, best_len = -1, 0
            l = 0
            while i + l < n:
                entry = node.get(data[i + l])
                if entry is None:
                    break
                l += 1
                if entry[0] is not None:
                    best_id, best_len = entry[0], l
                node = entry[1]
            if best_id < 0:
                # byte fallback (tokenizer.cpp:104-110)
                if self.byte_fallback_start >= 0:
                    out.append(data[i] + self.byte_fallback_start)
                i += 1
            else:
                out.append(best_id)
                i += best_len
        return out

    def decode_one(self, prev_token: int, token: int) -> bytes:
        piece = self.vocab[token]
        if prev_token == self.bos_id and piece.startswith(b" "):
            return piece[1:]
        if (
            self.byte_fallback_start >= 0
            and token >= self.byte_fallback_start
            and token - self.byte_fallback_start < 256
        ):
            return bytes([token - self.byte_fallback_start])
        return piece

    def decode(self, tokens: list[int]) -> str:
        prev = -1
        out = b""
        for t in tokens:
            if t == self.bos_id:
                prev = t
                continue
            out += self.decode_one(prev, t)
            prev = t
        return out.decode("utf-8", errors="replace")

    def is_stop(self, token: int) -> bool:
        return token == self.eos_id or token == self.eot_id

    def encoding_to_debug_string(self, encoding: list[int]) -> str:
        """Token-by-token dump (reference tokenizer.cpp:121-133)."""
        parts = []
        for t in encoding:
            if t == self.bos_id:
                parts.append(f"[<s>:{t}]")
            elif t == self.eos_id:
                parts.append(f"[</s>:{t}]")
            else:
                parts.append(f"[{self.vocab[t].decode('utf-8', 'replace')}:{t}]")
        return "".join(parts)
