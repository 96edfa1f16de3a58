"""Normalized model hyperparameters.

Mirrors the reference ``Config::from_xalm`` (reference src/model.h:25-91)
including its defaults (norm_eps 1e-5, act gelu, norm rmsnorm, qkv_clip off)
and the max_seq_len clamp to 4096 with a ``context`` override (model.h:54-59)
— the clamp stands in for Mistral's sliding window and bounds the KV ring.
"""

from __future__ import annotations

import dataclasses
import math

__all__ = ["ModelConfig", "KV_SINKS"]

# StreamingLLM attention-sink count (reference src/model.h:10).
KV_SINKS = 2

_MAX_SEQ_LEN_CLAMP = 4096


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    dim: int
    hidden_dim: int
    head_dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    vocab_size: int
    max_seq_len: int
    rope_theta: float
    rotary_dim: int
    norm_eps: float = 1e-5
    act: str = "gelu"  # gelu | silu
    norm_type: str = "rmsnorm"
    qkv_clip: float = math.inf  # inf = no clipping
    tie_word_embeddings: bool = False
    # residual-stream scale applied once after the embed lookup. 1.0 for
    # Llama/Mistral; sqrt(dim) for Gemma (HF modeling_gemma normalizer) —
    # the converter writes it so the runtime stays family-agnostic.
    embed_scale: float = 1.0
    # sparse mixture-of-experts FFN (Mixtral): total experts per layer and
    # how many each token routes to; 0 = dense GLU FFN
    n_experts: int = 0
    n_experts_active: int = 0
    # Gemma-2 logit softcapping: x -> tanh(x/c)*c on attention scores /
    # final logits (0 = off). Gemma-2 also carries post-attention and
    # post-feedforward norms (optional LayerParams fields) and folds its
    # query_pre_attn_scalar into the q weights at conversion.
    attn_softcap: float = 0.0
    logit_softcap: float = 0.0
    post_norms: bool = False
    # Qwen3-style per-head q/k RMS norms applied before rope
    qk_norm: bool = False
    # rope frequency rescaling for long-context checkpoints (Llama 3.x):
    # "none" | "linear" | "llama3" (see llama.rope_freqs)
    rope_scaling: str = "none"
    rope_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 0

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    @property
    def group_size(self) -> int:
        return self.n_heads // self.n_kv_heads

    def __post_init__(self):
        if self.n_heads % self.n_kv_heads != 0:
            raise ValueError("n_heads must be a multiple of n_kv_heads")
        if self.rotary_dim % 2 != 0 or self.rotary_dim > self.head_dim:
            raise ValueError("rotary_dim must be even and <= head_dim")
        if self.act not in ("gelu", "silu"):
            raise ValueError(f"unsupported act {self.act}")
        if self.norm_type != "rmsnorm":
            raise ValueError(f"unsupported norm_type {self.norm_type}")
        if self.rope_scaling not in ("none", "linear", "llama3"):
            raise ValueError(f"unsupported rope_scaling {self.rope_scaling}")
        if self.rope_scaling == "llama3" and self.rope_original_max_pos <= 0:
            raise ValueError("llama3 rope_scaling needs rope_original_max_pos")
        if self.n_experts and not 0 < self.n_experts_active <= self.n_experts:
            raise ValueError("n_experts_active must be in (0, n_experts]")

    @classmethod
    def from_metadata(cls, metadata: dict, context: int = 0) -> "ModelConfig":
        """Parse the stringly-typed .xalm config (reference model.h:44-90)."""
        max_seq_len = min(int(metadata["max_seq_len"]), _MAX_SEQ_LEN_CLAMP)
        if context:
            max_seq_len = context
        return cls(
            dim=int(metadata["dim"]),
            hidden_dim=int(metadata["hidden_dim"]),
            head_dim=int(metadata["head_dim"]),
            n_layers=int(metadata["n_layers"]),
            n_heads=int(metadata["n_heads"]),
            n_kv_heads=int(metadata["n_kv_heads"]),
            vocab_size=int(metadata["vocab_size"]),
            max_seq_len=max_seq_len,
            rope_theta=float(metadata["rope_theta"]),
            rotary_dim=int(metadata["rotary_dim"]),
            norm_eps=float(metadata.get("norm_eps", "1e-5")),
            act=metadata.get("act_type", "gelu"),
            norm_type=metadata.get("norm_type", "rmsnorm"),
            qkv_clip=float(metadata["qkv_clip"]) if "qkv_clip" in metadata else math.inf,
            tie_word_embeddings=metadata.get("tie_word_embeddings") == "True",
            embed_scale=float(metadata.get("embed_scale", "1.0")),
            n_experts=int(metadata.get("n_experts", "0")),
            n_experts_active=int(metadata.get("n_experts_active", "0")),
            attn_softcap=float(metadata.get("attn_softcap", "0.0")),
            logit_softcap=float(metadata.get("logit_softcap", "0.0")),
            post_norms=metadata.get("post_norms") == "True",
            qk_norm=metadata.get("qk_norm") == "True",
            rope_scaling=metadata.get("rope_scaling", "none"),
            rope_factor=float(metadata.get("rope_factor", "1.0")),
            rope_low_freq_factor=float(metadata.get("rope_low_freq_factor", "1.0")),
            rope_high_freq_factor=float(metadata.get("rope_high_freq_factor", "4.0")),
            rope_original_max_pos=int(metadata.get("rope_original_max_pos", "0")),
        )
