"""Independent numpy oracle for the per-token decode algorithm.

A deliberately naive, loop-heavy reimplementation of the reference's hot path
semantics (SURVEY.md §2/§5.7: reference infer.cpp:365-638) used to cross-check
the JAX forward — especially the StreamingLLM sink+ring KV cache indexing and
sink re-rotation, which are hard to eyeball in vectorized code.

Written from the behavioral spec, shares no code with either implementation.
"""

from __future__ import annotations

import numpy as np

KV_SINKS = 2


def rope_inplace(vec: np.ndarray, head_dim: int, pos: int, theta: float, rotary_dim: int):
    """Interleaved-pair rotation of a flat (n*head_dim,) vector."""
    d = vec.shape[0]
    for i in range(0, d, 2):
        j_head = i % head_dim
        freq = 0.0 if j_head >= rotary_dim else theta ** (-(j_head / rotary_dim))
        val = pos * freq
        fcr, fci = np.cos(val), np.sin(val)
        v0, v1 = vec[i], vec[i + 1]
        vec[i] = v0 * fcr - v1 * fci
        vec[i + 1] = v0 * fci + v1 * fcr


class NumpyOracle:
    """f32 weights, f16 KV cache, one token per forward — reference semantics."""

    def __init__(self, weights: dict[str, np.ndarray], cfg):
        self.w = {k: np.asarray(v, np.float32) for k, v in weights.items()}
        self.cfg = cfg
        S = cfg.max_seq_len
        self.key_cache = np.zeros((cfg.n_layers, S, cfg.kv_dim), np.float16)
        self.value_cache = np.zeros((cfg.n_layers, S, cfg.kv_dim), np.float16)

    def forward(self, token: int, pos: int) -> np.ndarray:
        cfg = self.cfg
        S = cfg.max_seq_len
        kv_sink = KV_SINKS if pos >= S else 0
        kv_pos = kv_sink + (pos - kv_sink) % (S - kv_sink)
        kv_len = min(pos + 1, S)
        hd = cfg.head_dim

        x = self.w["embed.weight"][token].copy()
        for l in range(cfg.n_layers):
            p = f"l.{l}."
            # attention block
            xb = self._rmsnorm(x, self.w[p + "attn.norm.weight"])
            q = self.w[p + "attn.q.weight"] @ xb
            k = self.w[p + "attn.k.weight"] @ xb
            v = self.w[p + "attn.v.weight"] @ xb
            rope_inplace(q, hd, pos, cfg.rope_theta, cfg.rotary_dim)
            rope_inplace(k, hd, pos, cfg.rope_theta, cfg.rotary_dim)
            self.key_cache[l, kv_pos] = k
            self.value_cache[l, kv_pos] = v
            # sink re-rotation: +1 position per step (infer.cpp:416-431)
            for r in range(kv_sink):
                sk = self.key_cache[l, r].astype(np.float32)
                rope_inplace(sk, hd, 1, cfg.rope_theta, cfg.rotary_dim)
                self.key_cache[l, r] = sk
            # GQA attention over kv_len ring slots
            kb = self.key_cache[l, :kv_len].astype(np.float32).reshape(kv_len, cfg.n_kv_heads, hd)
            vb = self.value_cache[l, :kv_len].astype(np.float32).reshape(kv_len, cfg.n_kv_heads, hd)
            qh = q.reshape(cfg.n_heads, hd)
            out = np.zeros((cfg.n_heads, hd), np.float32)
            gpk = cfg.n_heads // cfg.n_kv_heads
            for h in range(cfg.n_heads):
                kvh = h // gpk
                scores = kb[:, kvh] @ qh[h] / np.sqrt(hd)
                scores -= scores.max()
                att = np.exp(scores)
                att /= att.sum()
                out[h] = att @ vb[:, kvh]
            x = x + self.w[p + "attn.down.weight"] @ out.reshape(-1)
            # GLU FFN
            xb = self._rmsnorm(x, self.w[p + "mlp.norm.weight"])
            g = self.w[p + "mlp.gate.weight"] @ xb
            u = self.w[p + "mlp.up.weight"] @ xb
            act = g / (1.0 + np.exp(-g))  # silu
            x = x + self.w[p + "mlp.down.weight"] @ (act * u)

        xn = self._rmsnorm(x, self.w["output.norm.weight"])
        return self.w["output.weight"] @ xn

    def _rmsnorm(self, x: np.ndarray, w: np.ndarray) -> np.ndarray:
        ms = np.mean(x * x)
        return x / np.sqrt(ms + self.cfg.norm_eps) * w
