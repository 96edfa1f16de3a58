"""Decode-session persistence: save/resume the KV cache mid-generation.

A capability gap called out in SURVEY.md §5.4 — the reference has "no
KV-cache persistence, no session resume"; its planned v2 container
(XalmFile.h) pointed here. Built on the xalm v2 block store
(io/blockstore.py): one block per cache plane plus a metadata record tying
the session to its model config so a resume against the wrong checkpoint
fails loudly instead of decoding garbage.

Saved state: K/V planes (in their storage dtype), per-sequence absolute
positions, and the token history already emitted (so the harness can
re-print context and keep feeding the sampler).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from xalm_tpu.models.config import ModelConfig
from xalm_tpu.io.blockstore import BlockStore, write_blocks
from xalm_tpu.runtime.cache import KVCache

__all__ = ["Session", "save_session", "load_session"]

_FINGERPRINT_KEYS = (
    "dim",
    "hidden_dim",
    "head_dim",
    "n_layers",
    "n_heads",
    "n_kv_heads",
    "vocab_size",
    "max_seq_len",
)


def _fingerprint(cfg: ModelConfig) -> dict:
    return {k: int(getattr(cfg, k)) for k in _FINGERPRINT_KEYS}


@dataclasses.dataclass
class Session:
    cache: KVCache
    pos: np.ndarray  # (B,) absolute next position per sequence
    tokens: list[list[int]]  # emitted token ids per sequence


def save_session(path: str, cfg: ModelConfig, session: Session) -> None:
    tok_lens = np.array([len(t) for t in session.tokens], np.int32)
    flat = np.array([t for seq in session.tokens for t in seq], np.int32)
    blocks = {
        "kv.k": np.asarray(session.cache.k),
        "kv.v": np.asarray(session.cache.v),
        "pos": np.asarray(session.pos, np.int32),
        "tokens.lens": tok_lens,
        "tokens.flat": flat,
    }
    if session.cache.quantized:
        blocks["kv.k_scale"] = np.asarray(session.cache.k_scale)
        blocks["kv.v_scale"] = np.asarray(session.cache.v_scale)
    write_blocks(
        path,
        blocks,
        meta={"kind": "xalm-session", "config": _fingerprint(cfg)},
    )


def load_session(path: str, cfg: ModelConfig) -> Session:
    with BlockStore(path) as bs:
        if bs.meta.get("kind") != "xalm-session":
            raise ValueError(f"{path}: not a session file")
        fp = bs.meta.get("config", {})
        want = _fingerprint(cfg)
        if fp != want:
            diff = {k: (fp.get(k), want[k]) for k in want if fp.get(k) != want[k]}
            raise ValueError(f"{path}: session/model config mismatch: {diff}")
        # physical plane shapes must match what the current runtime would
        # allocate (the padded window grew from 8- to 32-row tiles once;
        # a stale session must fail loudly, not mis-tile the kernels)
        expect = KVCache.plane_shape(cfg, int(bs.get("pos").shape[0]))
        got_shape = tuple(bs.blocks["kv.k"].shape)
        if got_shape != expect:
            raise ValueError(
                f"{path}: stale session cache layout {got_shape} != "
                f"{expect} (re-create the session)"
            )
        k = np.copy(bs.get("kv.k"))
        v = np.copy(bs.get("kv.v"))
        ks = np.copy(bs.get("kv.k_scale")) if "kv.k_scale" in bs else None
        vs = np.copy(bs.get("kv.v_scale")) if "kv.v_scale" in bs else None
        pos = np.copy(bs.get("pos"))
        lens = bs.get("tokens.lens")
        flat = bs.get("tokens.flat")
        tokens, at = [], 0
        for n in lens:
            tokens.append([int(t) for t in flat[at : at + n]])
            at += int(n)
    cache = KVCache(
        k=jnp.asarray(k),
        v=jnp.asarray(v),
        k_scale=jnp.asarray(ks) if ks is not None else None,
        v_scale=jnp.asarray(vs) if vs is not None else None,
    )
    return Session(cache=cache, pos=pos, tokens=tokens)
