"""Generate a tiny random Mistral-family HF checkpoint for tests/fixtures.

Writes config.json, tokenizer.json (sentencepiece-style with byte fallback)
and model.safetensors into a directory. Deterministic (seed 42, the
reference's fixture convention — reference tensor.cpp:94).

Usage: python tests/make_tiny_model.py [dest_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


TINY_CONFIG = {
    "architectures": ["MistralForCausalLM"],
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 384,
    "max_position_embeddings": 256,
    "sliding_window": 256,
    "rope_theta": 10000.0,
    "rms_norm_eps": 1e-5,
    "hidden_act": "silu",
    "tie_word_embeddings": False,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
    "model_type": "mistral",
}


def make_tokenizer_json() -> dict:
    """A sentencepiece-style vocab with byte fallback: 3 specials + 256 byte
    tokens + a handful of word pieces (format consumed by reference
    convert.py:338-366 / tokenizer.cpp:33-66)."""
    vocab: dict[str, int] = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[f"<0x{b:02X}>"] = 3 + b
    words = [
        "▁hello", "▁world", "▁the", "▁quick", "▁brown",
        "▁fox", "▁jumps", "▁over", "▁lazy", "▁dog",
        "▁pass", "▁key", "▁is", "▁a", "▁of",
        "he", "llo", "wor", "ld", "ing", "er", "an", "the", "qu", "ick",
        "s", "e", "t", "o", "n", "1", "2", "3", "4", "5", "6", "7", "8", "9", "0",
        ".", ",", "?", "▁", "▁I", "▁you", "▁to", "▁and",
        "▁in", "▁that", "▁it", "▁on", "▁what", "▁The",
    ]
    next_id = 259
    for w in words:
        if w not in vocab:
            vocab[w] = next_id
            next_id += 1
    assert next_id <= TINY_CONFIG["vocab_size"]
    return {
        "model": {"type": "BPE", "vocab": vocab, "byte_fallback": True},
        "added_tokens": [
            {"id": 0, "content": "<unk>"},
            {"id": 1, "content": "<s>"},
            {"id": 2, "content": "</s>"},
        ],
    }


def make_weights(config: dict, seed: int = 42) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    dim = config["hidden_size"]
    hidden = config["intermediate_size"]
    n_heads = config["num_attention_heads"]
    n_kv = config["num_key_value_heads"]
    hd = config["head_dim"]
    vocab = config["vocab_size"]

    def w(*shape, scale=0.05):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    phi3 = config.get("model_type") == "phi3"
    tensors: dict[str, np.ndarray] = {
        "model.embed_tokens.weight": w(vocab, dim, scale=0.1),
        "model.norm.weight": np.abs(w(dim, scale=0.2)) + 0.8,
        "lm_head.weight": w(vocab, dim, scale=0.1),
    }
    if config.get("tie_word_embeddings"):
        del tensors["lm_head.weight"]  # HF omits the head when tied
    for i in range(config["num_hidden_layers"]):
        p = f"model.layers.{i}."
        tensors[p + "input_layernorm.weight"] = np.abs(w(dim, scale=0.2)) + 0.8
        if phi3:  # HF Phi-3 stores qkv fused: rows [q | k | v]
            tensors[p + "self_attn.qkv_proj.weight"] = w((n_heads + 2 * n_kv) * hd, dim)
        else:
            tensors[p + "self_attn.q_proj.weight"] = w(n_heads * hd, dim)
            tensors[p + "self_attn.k_proj.weight"] = w(n_kv * hd, dim)
            tensors[p + "self_attn.v_proj.weight"] = w(n_kv * hd, dim)
        if config.get("model_type") == "qwen3":  # per-head q/k norms
            tensors[p + "self_attn.q_norm.weight"] = np.abs(w(hd, scale=0.2)) + 0.8
            tensors[p + "self_attn.k_norm.weight"] = np.abs(w(hd, scale=0.2)) + 0.8
        if config.get("model_type") == "qwen2":  # HF Qwen2 has q/k/v bias
            tensors[p + "self_attn.q_proj.bias"] = w(n_heads * hd, scale=0.2)
            tensors[p + "self_attn.k_proj.bias"] = w(n_kv * hd, scale=0.2)
            tensors[p + "self_attn.v_proj.bias"] = w(n_kv * hd, scale=0.2)
        tensors[p + "self_attn.o_proj.weight"] = w(dim, n_heads * hd)
        tensors[p + "post_attention_layernorm.weight"] = np.abs(w(dim, scale=0.2)) + 0.8
        if config.get("model_type") == "gemma2":  # 4 norms per layer
            tensors[p + "pre_feedforward_layernorm.weight"] = np.abs(w(dim, scale=0.2)) + 0.8
            tensors[p + "post_feedforward_layernorm.weight"] = np.abs(w(dim, scale=0.2)) + 0.8
        if config.get("model_type") == "mixtral":
            e_cnt = config["num_local_experts"]
            tensors[p + "block_sparse_moe.gate.weight"] = w(e_cnt, dim, scale=0.3)
            for e in range(e_cnt):
                q = p + f"block_sparse_moe.experts.{e}."
                tensors[q + "w1.weight"] = w(hidden, dim)
                tensors[q + "w2.weight"] = w(dim, hidden)
                tensors[q + "w3.weight"] = w(hidden, dim)
        elif phi3:  # fused gate/up: rows [gate | up]
            tensors[p + "mlp.gate_up_proj.weight"] = w(2 * hidden, dim)
            tensors[p + "mlp.down_proj.weight"] = w(dim, hidden)
        else:
            tensors[p + "mlp.gate_proj.weight"] = w(hidden, dim)
            tensors[p + "mlp.down_proj.weight"] = w(dim, hidden)
            tensors[p + "mlp.up_proj.weight"] = w(hidden, dim)
    return tensors


def make_tiny_model(dest: str, config_overrides: dict | None = None, seed: int = 42) -> str:
    import safetensors.numpy

    config = dict(TINY_CONFIG)
    if config_overrides:
        config.update(config_overrides)
    os.makedirs(dest, exist_ok=True)
    with open(os.path.join(dest, "config.json"), "w") as f:
        json.dump(config, f, indent=1)
    with open(os.path.join(dest, "tokenizer.json"), "w") as f:
        json.dump(make_tokenizer_json(), f, indent=1)
    safetensors.numpy.save_file(make_weights(config, seed), os.path.join(dest, "model.safetensors"))
    return dest


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_hf"
    make_tiny_model(dest)
    print(f"wrote tiny model to {dest}")
