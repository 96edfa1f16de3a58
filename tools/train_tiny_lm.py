#!/usr/bin/env python
"""Train a small-but-real Mistral-architecture LM on local text, export HF.

This environment has zero egress, so no public checkpoint can be fetched
(the BASELINE quality gate wants a *real* model, not random weights). This
script produces one locally: a ~40M-parameter Mistral-family model trained
on the Python sources installed on this machine, exported as a standard HF
checkpoint directory (config.json / tokenizer.json / model.safetensors)
that the converter ingests exactly like a downloaded model. The quality
gate (tools/eval_real_model.py) then measures ppl across container dtypes
and runs the wrapped-passkey workload on it.

Design choices for *consistency with the inference engine*:
- the training forward reuses llama.rmsnorm / apply_rope / attention, so
  train-time and inference-time math agree to rounding;
- tokenization uses the xalm trie tokenizer over the trained BPE vocab (the
  converter's own load_tokens path), so train/eval token streams match;
- q/k projections are exported through the inverse of the converter's
  permute_reverse, so the HF checkpoint uses the canonical HF rotate-half
  layout (verified round-trip in-script) and transformers can load it.

Usage: python tools/train_tiny_lm.py --out /root/models/xalm-mini [--steps N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_BASE_CONFIG = {
    "architectures": ["MistralForCausalLM"],
    "head_dim": 64,
    "vocab_size": 8192,
    "max_position_embeddings": 512,
    "sliding_window": 512,
    "rope_theta": 10000.0,
    "rms_norm_eps": 1e-5,
    "hidden_act": "silu",
    "tie_word_embeddings": False,
    "bos_token_id": 1,
    "eos_token_id": 2,
    "torch_dtype": "float32",
    "model_type": "mistral",
}

# Three trained-model presets (all share the tokenizer/corpus pipeline):
#   mini  — the original ~40M quality-gate model (round 3/4 RESULTS.md)
#   base  — wider gate: hidden 1024 makes K/2 = 512, so q4 GROUP-512
#           quality is finally *measurable* (VERDICT r4 item 1a); ~89M
#   draft — ~12M draft for two-model speculative decoding; MUST be trained
#           with --tokenizer <base>/tokenizer.json so vocab ids match
PRESETS = {
    "mini": {
        "hidden_size": 512, "intermediate_size": 2048,
        "num_hidden_layers": 8, "num_attention_heads": 8,
        "num_key_value_heads": 4,
    },
    "base": {
        "hidden_size": 1024, "intermediate_size": 3072,
        "num_hidden_layers": 6, "num_attention_heads": 16,
        "num_key_value_heads": 4,
    },
    "draft": {
        "hidden_size": 256, "intermediate_size": 1024,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2,
    },
}

SEQ = 512
BATCH = 24
STEPS_PER_DISPATCH = 20


# --------------------------------------------------------------------- data


def gather_corpus(max_bytes: int = 100_000_000) -> bytes:
    """Concatenate locally installed Python sources + repo docs."""
    roots = [
        Path("/usr/local/lib/python3.12"),
        Path("/opt/venv/lib/python3.12/site-packages/numpy"),
        Path("/opt/venv/lib/python3.12/site-packages/jax"),
        Path("/opt/venv/lib/python3.12/site-packages/scipy"),
        Path("/opt/venv/lib/python3.12/site-packages/pandas"),
        Path("/opt/venv/lib/python3.12/site-packages/torch"),
        REPO / "docs",
    ]
    parts: list[bytes] = []
    total = 0
    for root in roots:
        if not root.exists():
            continue
        for p in sorted(root.rglob("*.py")) + sorted(root.rglob("*.md")):
            try:
                b = p.read_bytes()
            except OSError:
                continue
            if len(b) < 256:
                continue
            parts.append(b + b"\n\n")
            total += len(b)
            if total > max_bytes:
                return b"".join(parts)
    return b"".join(parts)


def train_tokenizer(corpus: bytes, path: Path, vocab_size: int) -> None:
    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers import models, pre_tokenizers, trainers

    tok = HFTokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    text = corpus.decode("utf-8", errors="replace")
    step = 1 << 20
    tok.train_from_iterator(
        (text[i : i + step] for i in range(0, len(text), step)), trainer
    )
    tok.save(str(path))


def xalm_tokenizer(tokenizer_json: Path, vocab_size: int):
    from xalm_tpu.convert.convert import load_tokens, tokens_tensor
    from xalm_tpu.tokenizer import Tokenizer

    blob = tokens_tensor(load_tokens(str(tokenizer_json), vocab_size))
    return Tokenizer(blob, "1", "2")


RECALL_MIX = 0.2  # fraction of training rows carrying a recall pattern


def build_passkey_pool(tok, rng, n: int = 2048, seq: int = SEQ):
    """Rows in the EXACT harness passkey format (harness.main PASSKEY_*,
    reference main.cpp:293-309): prefix, junk sentences, the hidden
    "The pass key is K..." info at a varying depth, junk, then the quiz
    suffix and the answer. An English quiz format is out of distribution
    for a Python-corpus model — round-3 probes MISSED for exactly that
    reason — so the retrieval gate's format is taught explicitly; the
    *skill* (copying digits across up to a full window of junk) is still
    learned, not memorized, since keys and depths are random per row."""
    from xalm_tpu.harness.main import (
        PASSKEY_JUNK,
        PASSKEY_PREFIX,
        PASSKEY_SUFFIX,
    )

    junk = tok.encode(PASSKEY_JUNK, bos=False)
    prefix = tok.encode(PASSKEY_PREFIX, bos=False)
    pool = np.zeros((n, seq), np.int32)
    for i in range(n):
        key = int(rng.integers(1, 50001))
        info = tok.encode(
            f" The pass key is {key}. Remember it. {key} is the pass key.",
            bos=False,
        )
        ans = tok.encode(
            PASSKEY_SUFFIX + f" {key}. The pass key is {key}.", bos=False
        )
        budget = seq - len(prefix) - len(info) - len(ans)
        n_junk = budget // len(junk) + 1
        # info depth varies: right after the prefix to just before the quiz
        a = int(rng.integers(0, n_junk + 1))
        row = prefix + junk * a + info + junk * (n_junk - a) + ans
        # trim from the FRONT (answer + info stay in-window), pad with junk
        row = row[-seq:] if len(row) >= seq else (junk * seq)[: seq - len(row)] + row
        pool[i] = np.asarray(row[:seq], np.int32)
    return pool


def build_recall_pool(tok, train_ids: np.ndarray, rng, n: int = 2048, seq: int = SEQ):
    """Synthetic key-recall rows: ``NAME = <digits>`` ... real-corpus filler
    ... ``print(NAME)\\nNAME = <digits>``. Mixing these in teaches the
    induction behavior the retrieval gate probes (reference run_passkey,
    main.cpp:270-352) — a 40M model learns the copy circuit readily, but
    only if the pattern is in distribution. Filler comes from the corpus so
    the rows stay on-distribution; key distance varies from ~20 tokens to
    nearly the full window."""
    names = ["PASS_KEY", "KEY", "SECRET", "value_a", "token_id", "MAGIC", "x_key"]
    pool = np.zeros((n, seq), np.int32)
    for i in range(n):
        name = names[int(rng.integers(len(names)))]
        key = str(int(rng.integers(1, 100000)))
        head = tok.encode(f"{name} = {key}\n", bos=False)
        tail = tok.encode(f"\nprint({name})\n{name} = {key}", bos=False)
        budget = seq - len(head) - len(tail)
        # distance between write and read varies per row
        fill_len = int(rng.integers(16, budget + 1))
        s = int(rng.integers(0, len(train_ids) - budget - 1))
        filler = train_ids[s : s + fill_len].tolist()
        row = head + filler + tail
        lead = train_ids[s + fill_len : s + fill_len + (seq - len(row))].tolist()
        row = row + lead  # pad with corpus continuation to exactly seq
        pool[i] = np.asarray(row[:seq], np.int32)
    return pool


# -------------------------------------------------------------------- model


def init_params(key, cfg: dict):
    import jax
    import jax.numpy as jnp

    d, h = cfg["hidden_size"], cfg["intermediate_size"]
    nh, nkv, hd = cfg["num_attention_heads"], cfg["num_key_value_heads"], cfg["head_dim"]
    v, L = cfg["vocab_size"], cfg["num_hidden_layers"]
    q_dim, kv_dim = nh * hd, nkv * hd
    ks = jax.random.split(key, 10)

    def w(k, *shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale)

    out_scale = 0.02 / (2 * L) ** 0.5
    return {
        "embed": w(ks[0], v, d, scale=0.02),
        "wcls": w(ks[1], v, d, scale=0.02),
        "out_norm": jnp.ones((d,), jnp.float32),
        "attn_norm": jnp.ones((L, d), jnp.float32),
        "mlp_norm": jnp.ones((L, d), jnp.float32),
        "wq": w(ks[2], L, q_dim, d),
        "wk": w(ks[3], L, kv_dim, d),
        "wv": w(ks[4], L, kv_dim, d),
        "wo": w(ks[5], L, d, q_dim, scale=out_scale),
        "w1": w(ks[6], L, h, d),
        "w3": w(ks[7], L, h, d),
        "w2": w(ks[8], L, d, h, scale=out_scale),
    }


def make_train_step(cfg: dict):
    import jax
    import jax.numpy as jnp

    from xalm_tpu.models.config import ModelConfig
    from xalm_tpu.models.llama import apply_rope, attention, rmsnorm, rope_freqs

    d = cfg["hidden_size"]
    nh, nkv, hd = cfg["num_attention_heads"], cfg["num_key_value_heads"], cfg["head_dim"]
    eps = cfg["rms_norm_eps"]
    mcfg = ModelConfig(
        dim=d, hidden_dim=cfg["intermediate_size"], head_dim=hd,
        n_layers=cfg["num_hidden_layers"], n_heads=nh, n_kv_heads=nkv,
        vocab_size=cfg["vocab_size"], max_seq_len=SEQ,
        rope_theta=cfg["rope_theta"], rotary_dim=hd, act="silu",
    )
    freqs = rope_freqs(mcfg)

    def mm(x, w):
        # bf16 MXU inputs, f32 accumulation (matches the inference engine)
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def forward(params, tokens):  # (B, T) -> (B, T, V) logits
        b, t = tokens.shape
        pos = jnp.arange(t, dtype=jnp.int32)[None].repeat(b, 0)
        kv_len = pos + 1  # causal
        x = params["embed"][tokens]

        def layer(x, lp):
            xb = rmsnorm(x, lp["attn_norm"], eps)
            q = mm(xb, lp["wq"]).reshape(b, t, nh, hd)
            k = mm(xb, lp["wk"]).reshape(b, t, nkv, hd)
            v = mm(xb, lp["wv"]).reshape(b, t, nkv, hd)
            q = apply_rope(q, pos, freqs)
            k = apply_rope(k, pos, freqs)
            att = attention(
                q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                kv_len, mcfg, compute_dtype=jnp.bfloat16,
            )
            x = x + mm(att, lp["wo"])
            xb = rmsnorm(x, lp["mlp_norm"], eps)
            glu = jax.nn.silu(mm(xb, lp["w1"])) * mm(xb, lp["w3"])
            return x + mm(glu, lp["w2"]), None

        stacked = {
            k: params[k]
            for k in ("attn_norm", "mlp_norm", "wq", "wk", "wv", "wo", "w1", "w3", "w2")
        }
        x, _ = jax.lax.scan(layer, x, stacked)
        xn = rmsnorm(x, params["out_norm"], eps)
        return mm(xn, params["wcls"])

    def loss_fn(params, tokens):
        logits = forward(params, tokens)  # predict tokens[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    return forward, loss_fn


# -------------------------------------------------------------------- export


def permute_forward(w: np.ndarray, heads: int, rotary_dim: int) -> np.ndarray:
    """Interleaved-rope rows -> HF rotate-half layout (exact inverse of
    convert.permute_reverse, asserted below)."""
    head_dim = w.shape[0] // heads
    w = w.reshape(heads, head_dim, *w.shape[1:])
    wr = w[:, :rotary_dim]
    wk = w[:, rotary_dim:]
    wr = wr.reshape(heads, rotary_dim // 2, 2, *w.shape[2:])
    wr = wr.swapaxes(1, 2).reshape(heads, rotary_dim, *w.shape[2:])
    return np.concatenate([wr, wk], axis=1).reshape(heads * head_dim, *w.shape[2:])


def export_hf(params, cfg: dict, dest: Path) -> None:
    import safetensors.numpy

    from xalm_tpu.convert.convert import permute_reverse

    nh, nkv, hd = cfg["num_attention_heads"], cfg["num_key_value_heads"], cfg["head_dim"]
    p = {k: np.asarray(v, np.float32) for k, v in params.items()}
    tensors = {
        "model.embed_tokens.weight": p["embed"],
        "model.norm.weight": p["out_norm"],
        "lm_head.weight": p["wcls"],
    }
    for i in range(cfg["num_hidden_layers"]):
        pre = f"model.layers.{i}."
        wq = permute_forward(p["wq"][i], nh, hd)
        wk = permute_forward(p["wk"][i], nkv, hd)
        # round-trip check: the converter must recover the trained layout
        np.testing.assert_array_equal(permute_reverse(wq, nh, hd), p["wq"][i])
        np.testing.assert_array_equal(permute_reverse(wk, nkv, hd), p["wk"][i])
        tensors[pre + "input_layernorm.weight"] = p["attn_norm"][i]
        tensors[pre + "self_attn.q_proj.weight"] = wq
        tensors[pre + "self_attn.k_proj.weight"] = wk
        tensors[pre + "self_attn.v_proj.weight"] = p["wv"][i]
        tensors[pre + "self_attn.o_proj.weight"] = p["wo"][i]
        tensors[pre + "post_attention_layernorm.weight"] = p["mlp_norm"][i]
        tensors[pre + "mlp.gate_proj.weight"] = p["w1"][i]
        tensors[pre + "mlp.up_proj.weight"] = p["w3"][i]
        tensors[pre + "mlp.down_proj.weight"] = p["w2"][i]
    safetensors.numpy.save_file(tensors, dest / "model.safetensors")
    with open(dest / "config.json", "w") as f:
        json.dump(cfg, f, indent=1)


# --------------------------------------------------------------------- main


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mini", choices=sorted(PRESETS))
    ap.add_argument("--out", default=None,
                    help="export dir (default /root/repo/models/xalm-<preset>)")
    ap.add_argument("--tokenizer", default=None,
                    help="reuse an existing tokenizer.json (REQUIRED for the "
                    "draft preset: spec decoding needs target-identical vocab)")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    CONFIG = dict(_BASE_CONFIG, **PRESETS[args.preset])
    dest = Path(args.out or f"/root/repo/models/xalm-{args.preset}")
    dest.mkdir(parents=True, exist_ok=True)
    if args.tokenizer:
        import shutil

        if not (dest / "tokenizer.json").exists():
            shutil.copy(args.tokenizer, dest / "tokenizer.json")

    import jax
    import jax.numpy as jnp
    import optax

    from xalm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"devices: {jax.devices()}", flush=True)

    t0 = time.time()
    corpus = gather_corpus()
    print(f"corpus: {len(corpus) / 1e6:.1f} MB ({time.time() - t0:.0f}s)", flush=True)

    tj = dest / "tokenizer.json"
    if not tj.exists():
        t0 = time.time()
        train_tokenizer(corpus, tj, CONFIG["vocab_size"])
        print(f"tokenizer trained ({time.time() - t0:.0f}s)", flush=True)
    tok = xalm_tokenizer(tj, CONFIG["vocab_size"])

    ids_path = dest / "corpus_ids.npy"
    if ids_path.exists():
        ids = np.load(ids_path)
    else:
        t0 = time.time()
        ids = np.asarray(tok.encode(corpus, bos=False), np.int32)
        np.save(ids_path, ids)
        print(
            f"tokenized: {len(ids) / 1e6:.1f}M tokens "
            f"({len(corpus) / max(len(ids), 1):.2f} bytes/token, "
            f"{time.time() - t0:.0f}s)",
            flush=True,
        )
    # held-out tail for the quality gate (never trained on)
    heldout = ids[-200_000:]
    np.save(dest / "heldout_ids.npy", heldout)
    train_ids = ids[: -len(heldout)]

    forward, loss_fn = make_train_step(CONFIG)
    params = init_params(jax.random.PRNGKey(args.seed), CONFIG)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    print(f"params: {n_params / 1e6:.1f}M", flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, max(args.steps // 10, 1)),
        decay_steps=args.steps, end_value=args.lr * 0.1
    )
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)

    @jax.jit
    def multi_step(params, opt_state, batches):  # (K, B, T)
        def one(carry, tokens):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(one, (params, opt_state), batches)
        return params, opt_state, losses

    rng = np.random.default_rng(args.seed)
    n_tok = len(train_ids)
    t0 = time.time()
    recall_pool = np.concatenate(
        [build_recall_pool(tok, train_ids, rng), build_passkey_pool(tok, rng)]
    )
    print(f"recall pool: {len(recall_pool)} rows (python + passkey formats), "
          f"mix {RECALL_MIX:.0%}", flush=True)
    done = 0
    while done < args.steps:
        k = min(STEPS_PER_DISPATCH, args.steps - done)
        starts = rng.integers(0, n_tok - SEQ - 1, size=(k, BATCH))
        batches = np.stack(
            [
                np.stack([train_ids[s : s + SEQ] for s in row])
                for row in starts
            ]
        ).astype(np.int32)
        # retrieval-friendly mixing: some rows carry a key-recall pattern
        mix = rng.random((k, BATCH)) < RECALL_MIX
        picks = rng.integers(0, len(recall_pool), size=(k, BATCH))
        batches = np.where(mix[:, :, None], recall_pool[picks], batches)
        params, opt_state, losses = multi_step(params, opt_state, jnp.asarray(batches))
        done += k
        if done % 200 == 0 or done == args.steps:
            lo = float(np.asarray(losses)[-1])
            tok_s = done * BATCH * SEQ / (time.time() - t0)
            print(
                f"step {done}/{args.steps} loss {lo:.3f} ppl {np.exp(lo):.1f} "
                f"({tok_s / 1e3:.0f}k tok/s)",
                flush=True,
            )

    export_hf(jax.device_get(params), CONFIG, dest)
    (dest / "corpus_ids.npy").unlink(missing_ok=True)
    print(f"exported HF checkpoint to {dest}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
