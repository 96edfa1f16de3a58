#!/usr/bin/env python
"""Headline benchmark: Mistral-7B int8 weight-only single-chip decode tok/s.

int8 (per-row scales) is the performance-representative 8-bit weight format
on v5e: the MXU consumes s8 natively, while fp8 has no hardware path and
dequantizes through XLA (see ops/pallas_matmul.supported_weight_dtype).
The reference ships int8 too (its fixed-scale Q8, types.h:423-424).

Matches the reference's measurement regime (reference README.md:7-14 /
main.cpp:105-127): greedy decode throughput at 4k sliding-window context,
reported against the published baseline (yalm CUDA on RTX 4090, FP16:
63.8 tok/s — BASELINE.md) and the chip's HBM roofline.

Weights are random at real 7B shapes (throughput is value-independent; see
xalm_tpu/utils/synthetic.py). Decode runs as a device-side scan so dispatch
latency is off the measured path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra context goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax

# Persistent compilation cache: repeated bench runs (driver + tuning) skip
# recompiling unchanged programs. The r2 'warmup regression' (183 s -> 1057 s
# for the SAME bench) turned out to be remote-compile-service latency
# variance, not program growth: a trivial 97-step scan compiled in 77 s one
# run and >900 s another (tools/compile_probe.py); the pure-XLA decode path
# (zero Pallas kernels) warmed up in 360 s vs the full path's 250-460 s. The
# cache removes the local-compile share and keeps repeat runs cheap.
from xalm_tpu.utils.compile_cache import cache_stats, enable_compile_cache

_CACHE_DIR = enable_compile_cache()


def log_cache_state(tag: str) -> None:
    """State which compile regime this run's numbers came from (a cold
    remote-compile warmup can cost 100-500 s; a warm one seconds — the two
    must never be conflated in recorded artifacts)."""
    st = cache_stats()
    regime = "WARM (all programs from cache)" if st["misses"] == 0 else (
        f"COLD ({st['misses']} fresh compiles paid)")
    print(
        f"compile cache [{tag}]: dir={_CACHE_DIR} | "
        f"{st['hits']} hits / {st['misses']} misses "
        f"of {st['requests']} cacheable compiles -> {regime}",
        file=sys.stderr, flush=True,
    )

import jax.numpy as jnp
import numpy as np

from xalm_tpu.runtime.engine import Engine
from xalm_tpu.utils.synthetic import MISTRAL_7B, synthetic_params

BASELINE_TOK_S = 63.8  # yalm FP16 @ RTX 4090, ~120-token generations
BASELINE_LONG_TOK_S = 58.7  # same setup, ~4800-token generations (wrapped)
V5E_HBM_GB_S = 819.0  # TPU v5e HBM speed of light


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _probe_devices(timeout_s: float = 180.0):
    """Device init through the axon tunnel can hang indefinitely when the
    tunnel is down; a hung bench is worse than a failed one (it blocks the
    harness that invoked it). Probe in a watchdog thread and fail fast."""
    import threading

    box = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001
            box["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        log(f"FATAL: jax device init did not complete in {timeout_s:.0f}s "
            f"(TPU tunnel down?) — aborting instead of hanging")
        os._exit(3)
    if "error" in box:
        log(f"FATAL: jax device init failed: {box['error']}")
        os._exit(3)
    return box["devices"]


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96, help="decode steps to time")
    ap.add_argument("--warmup", type=int, default=16)
    ap.add_argument("--dtype", default="q4",
                    choices=["f8_e4m3", "f8_e5m2", "i8", "bf16", "f16", "q4"],
                    help="container weight format. DEFAULT q4: the packed-"
                    "4-bit body is the shipped decode configuration — at "
                    "its headline group (512) the quality gate measures "
                    "delta-ppl +0.023 (~0.1 stderr, RESULTS.md q4 section "
                    "on the 1024-wide gate model); i8 remains the 8-bit "
                    "reference config")
    ap.add_argument("--q4-group", type=int, default=512,
                    help="q4: weights per scale group along the contraction "
                    "(128-multiple; smaller = better quality, more scale "
                    "bytes). Body-only — the head stays i8 (quality-gated). "
                    "Both 128 and 512 hold delta-ppl within noise on the "
                    "gate model (RESULTS.md)")
    ap.add_argument("--layers", type=int, default=0, help="override n_layers (debug)")
    ap.add_argument("--moe", action="store_true",
                    help="sparse-MoE decode: Mixtral-8x7B geometry (8 experts, "
                    "top-2) truncated to fit one chip (default 8 layers, "
                    "~12 GB i8). Measures the gathered sparse expert path — "
                    "decode streams k/E of the expert bytes "
                    "(models/llama.py gathered decode; XALM_NO_MOE_GATHER=1 "
                    "for the dense-masked A/B)")
    ap.add_argument("--mini", action="store_true",
                    help="tiny synthetic config (debug: smoke the bench flow "
                    "end-to-end on CPU/interpret without 7B shapes)")
    ap.add_argument("--batch", type=int, default=1,
                    help="decode batch size (serving-throughput mode; tok/s is aggregate)")
    ap.add_argument("--compute", default="auto", choices=["auto", "f32", "bf16"],
                    help="matmul compute dtype (auto: bf16 on TPU — prefill is MXU-bound)")
    ap.add_argument("--kv", default="auto", choices=["auto", "f16", "bf16", "i8"],
                    help="kv cache dtype (i8 = quantized, halves KV bytes)")
    ap.add_argument("--prefill", type=int, default=0,
                    help="measure prefill instead: hydrate N prompt tokens, report tok/s")
    ap.add_argument("--long", type=int, nargs="?", const=4800, default=0,
                    metavar="N",
                    help="TRUE long-generation leg: actually generate ~N "
                    "tokens through chunked decode_scan (host chunking, "
                    "donation, ring wrap all included) and report average "
                    "tok/s — the reference's ~4800-token benchmark row "
                    "(reference README.md:14, main.cpp:105-115), not the "
                    "--wrap steady-state proxy")
    ap.add_argument("--wrap", action="store_true",
                    help="long-generation regime (reference's ~4800-token "
                    "row): advance past the sliding window first, then time "
                    "decode at full kv_len with sink re-rotation active")
    ap.add_argument("--a8", action="store_true",
                    help="W8A8 prefill: per-token int8 activations (s8xs8 "
                    "MXU at 2x bf16 rate; quality-gated, see RESULTS.md)")
    ap.add_argument("--a8-decode", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="W8A8 decode: per-row int8 activations through "
                    "every megakernel dot (s8xs8 MXU, no per-tile weight "
                    "convert). DEFAULT ON for i8/q4 — the fastest "
                    "quality-PASSING 8-bit config (RESULTS.md W8A8 row, "
                    "delta-ppl within noise); --no-a8-decode reverts to "
                    "bf16 activations")
    ap.add_argument("--wcls", default="i8", choices=["keep", "i8"],
                    help="i8 (default): recode the bf16 classifier head to "
                    "i8 per-row at load — halves its 262 MB decode stream, "
                    "keeps the whole step 8-bit, delta-ppl +0.001 on the "
                    "real checkpoint (RESULTS.md). keep: boosted bf16 head "
                    "(the converter's default container layout)")
    ap.add_argument("--spec-verify", type=int, default=0, metavar="K",
                    help="measure the speculative-decoding verify cost: time "
                    "a (K+1)-token verify chunk vs the 1-token decode step "
                    "and report the breakeven draft acceptance "
                    "(runtime/spec.py)")
    ap.add_argument("--fp8", default="recode", choices=["keep", "recode"],
                    help="fp8 weights: recode to i8 at load (the TPU fast "
                    "path; v5e has no fp8 MXU) or keep true fp8 (XLA "
                    "convert+dot)")
    args = ap.parse_args()

    dt = {
        "f8_e4m3": jnp.float8_e4m3fn,
        "f8_e5m2": jnp.float8_e5m2,
        "i8": jnp.int8,
        "bf16": jnp.bfloat16,
        "f16": jnp.float16,
        "q4": jnp.int8,  # synthesized i8, recoded to packed 4-bit below
    }[args.dtype]
    if args.a8_decode is None:
        # default: the fastest quality-passing 8-bit decode config
        # (RESULTS.md W8A8 row) for i8; q4 requires it (s8xs8 dots only)
        args.a8_decode = args.dtype in ("i8", "q4")
        if args.a8_decode:
            log(f"{args.dtype}: W8A8 decode ON by default (quality-gated, "
                "RESULTS.md; --no-a8-decode for bf16 activations)")
    elif args.dtype == "q4" and not args.a8_decode:
        args.a8_decode = True  # the q4 megakernel runs s8xs8 dots only
        log("q4 implies --a8-decode (the packed body feeds s8xs8 MXU dots)")

    cfg = MISTRAL_7B
    if args.mini:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, dim=256, hidden_dim=512, head_dim=64, rotary_dim=64,
            n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=2048,
            max_seq_len=512,
        )
    if args.moe:
        import dataclasses

        # Mixtral-8x7B geometry (HF config: Mistral dims + 8 experts top-2),
        # truncated in depth so the expert stacks fit one v5e's 16 GB HBM
        # (full 32-layer Mixtral is ~47 GB at i8 — a 4-chip tp/ep target,
        # see parallel/shardings expert parallelism). Per-layer byte model
        # is unchanged by depth, so the gathered-stream rate generalizes.
        cfg = dataclasses.replace(
            cfg, n_experts=8, n_experts_active=2,
            n_layers=args.layers or 8,
        )
    elif args.layers:
        import dataclasses

        cfg = dataclasses.replace(cfg, n_layers=args.layers)

    if args.dtype == "q4":
        # group must divide K/2 of every body matmul (debug shapes: --mini
        # dims cap it at 128; the 7B default 512 passes untouched)
        ks = (cfg.dim, cfg.q_dim, cfg.hidden_dim)
        g = args.q4_group
        while g > 128 and any((k // 2) % g for k in ks):
            g //= 2
        if g != args.q4_group:
            log(f"q4 group clamped {args.q4_group} -> {g} for these dims")
            args.q4_group = g

    dev = _probe_devices()[0]
    log(f"device: {dev} | backend: {jax.default_backend()}")
    name = "Mixtral-8x7B" if args.moe else "Mistral-7B"
    log(f"building synthetic {name} ({cfg.n_layers} layers) {args.dtype} params...")
    t0 = time.time()
    params = synthetic_params(
        cfg, weight_dtype=dt,
        # q4 bodies draw packed directly (recoding a drawn i8 stack holds
        # old+new copies — OOM at MoE expert scale); the real recode path
        # is covered by from_xalm(q4_group=) tests and the --type q4 loader
        q4_group=args.q4_group if args.dtype == "q4" else 0,
    )
    if args.dtype.startswith("f8") and args.fp8 == "recode":
        from xalm_tpu.models.params import recode_params_fp8

        params = recode_params_fp8(params)
        log("fp8 weights recoded to i8 + per-row scales at load (--fp8 keep to disable)")
    if args.dtype == "q4":
        log(f"body weights packed 4-bit (group {args.q4_group}; head stays i8)")
    jax.block_until_ready(jax.tree.leaves(params))
    kv_dt = {"auto": "auto", "f16": jnp.float16, "bf16": jnp.bfloat16, "i8": jnp.int8}[args.kv]
    # head recode only joins the 8-bit regimes: a bf16/f16 run must stream
    # the container's own boosted head to stay a clean dtype comparison
    wcls_i8 = args.wcls == "i8" and (
        args.dtype in ("i8", "q4")
        or (args.dtype.startswith("f8") and args.fp8 == "recode")
    )

    def build_engine(fused: bool) -> Engine:
        return Engine(
            cfg, params, None, kv_dtype=kv_dt,
            compute_dtype={"auto": "auto", "f32": jnp.float32, "bf16": jnp.bfloat16}[args.compute],
            a8_prefill=args.a8,
            a8_decode=args.a8_decode,
            wcls_i8=wcls_i8,
            fused_step=fused,
        )

    eng = build_engine(fused=True)
    if wcls_i8:
        log("classifier head recoded to i8 per-row (--wcls keep to disable)")
    weight_gb = params.nbytes() / 1e9
    log(f"params resident: {weight_gb:.2f} GB (built in {time.time() - t0:.1f}s)")

    if args.prefill:
        n = args.prefill
        ids = [1 + (i % (cfg.vocab_size - 2)) for i in range(n)]
        cache = eng.new_cache(1)
        def force(c):
            # tiny real readback — block_until_ready alone is unreliable
            # through the axon tunnel
            return np.asarray(c.k[0, 0, 0, :2, :2])

        t0 = time.time()
        _, cache, _ = eng.prefill(ids, cache, logits_mode="none")
        force(cache)
        log(f"prefill warmup+compile({n} tokens): {time.time() - t0:.1f}s")
        # distinct prompt from the warmup call: the tunnel memoizes
        # identical dispatches (CLAUDE.md)
        ids2 = [(t + 3) % (cfg.vocab_size - 2) + 1 for t in ids]
        t0 = time.perf_counter()
        _, cache, _ = eng.prefill(ids2, eng.new_cache(1), logits_mode="none")
        force(cache)
        dt_s = time.perf_counter() - t0
        tok_s = n / dt_s
        log(f"prefill: {n} tokens in {dt_s:.3f}s -> {tok_s:.1f} tok/s (MXU-bound hydrate)")
        # sustained: 3 DISTINCT prompts queued back-to-back, one readback —
        # amortizes the per-call host/tunnel overhead a serving loop wouldn't
        # pay. Prompts differ per call so the tunnel's memoization of
        # identical dispatches (CLAUDE.md) can't fake the number.
        caches = [eng.new_cache(1) for _ in range(3)]
        prompts = [[(t + 7 * i) % (cfg.vocab_size - 2) + 1 for t in ids] for i in range(3)]
        t0 = time.perf_counter()
        last = None
        for c, p_ids in zip(caches, prompts):
            _, last, _ = eng.prefill(p_ids, c, logits_mode="none")
        force(last)
        sus = 3 * n / (time.perf_counter() - t0)
        log(f"prefill sustained (3 prompts): {sus:.1f} tok/s")
        print(json.dumps({
            "metric": f"mistral7b_{args.dtype}_prefill_tok_s_per_chip",
            "value": round(tok_s, 1),
            "unit": "tok/s",
            "vs_baseline": None,
        }))
        return 0

    if args.spec_verify:
        # speculative decoding economics on this chip: a verify chunk
        # streams the weights ONCE for k+1 candidate tokens (like decode)
        # but pays prefill-style compute + a per-call host dispatch. With
        # acceptance a, spec emits (a+1) tokens per verify vs 1 per decode
        # step -> breakeven a* = t_verify/t_decode - 1.
        k = args.spec_verify
        from xalm_tpu.runtime.spec import _verify_fn

        cache = eng.new_cache(1)
        prompt = np.arange(1, 17, dtype=np.int32)[None]
        _, cache = eng.step(prompt, np.zeros((1,), np.int32), cache, logits_mode="none")
        pos = prompt.shape[1]
        # decode baseline: scanned steps (the serving decode path)
        t0 = time.time()
        toks, cache = eng.decode_scan(
            np.array([5], np.int32), np.array([pos], np.int32), cache, args.steps
        )
        np.asarray(toks)
        pos += args.steps
        log(f"decode compile+warmup: {time.time() - t0:.1f}s")
        t0 = time.perf_counter()
        toks, cache = eng.decode_scan(
            np.asarray(toks)[:, -1].copy(), np.array([pos], np.int32), cache, args.steps
        )
        np.asarray(toks)
        pos += args.steps
        t_dec = (time.perf_counter() - t0) / args.steps
        # verify chunks: per-call readback (the host must see the greedy
        # tokens to build the next chunk — that dispatch cost is real)
        verify = _verify_fn(eng)
        chunk = np.arange(1, k + 2, dtype=np.int32)[None]
        t0 = time.time()
        g, cache = verify(eng.params, jnp.asarray(chunk), np.array([pos], np.int32), cache)
        np.asarray(g)
        log(f"verify compile+warmup: {time.time() - t0:.1f}s")
        n_calls = 24
        t0 = time.perf_counter()
        for i in range(n_calls):
            # distinct tokens per call (tunnel memoization, CLAUDE.md);
            # advancing pos stays pre-wrap like generate_spec's gate
            c = (chunk + 3 * i + 1) % (cfg.vocab_size - 2) + 1
            g, cache = verify(eng.params, jnp.asarray(c), np.array([pos], np.int32), cache)
            np.asarray(g)
            pos += 2  # a+1 with a=1: arbitrary pre-wrap advance
        t_ver = (time.perf_counter() - t0) / n_calls
        ratio = t_ver / t_dec
        # acceptance: read the most recent spec_probe artifact when present
        # (tools/hw_campaign.sh writes /tmp/hw_campaign/spec_probe.json);
        # otherwise fall back to the last recorded run (66.7 % in-window at
        # k=7, tools/spec_probe.py, RESULTS.md) and label it as such
        acc, acc_src = 0.667, "fallback: RESULTS.md run"
        probe_json = Path("/tmp/hw_campaign/spec_probe.json")
        if probe_json.exists():
            try:
                probe = json.loads(probe_json.read_text())
                acc = float(probe["accept_rate"])
                acc_src = f"measured, {probe_json} (k={probe.get('k')})"
            except (ValueError, KeyError) as e:
                log(f"spec_probe.json unreadable ({e}); using fallback acceptance")
        log(
            f"decode step {t_dec * 1e3:.2f} ms | verify({k + 1} tokens) "
            f"{t_ver * 1e3:.2f} ms | ratio {ratio:.2f} -> breakeven "
            f"acceptance {max(ratio - 1, 0):.2f} drafts/verify "
            f"({max(ratio - 1, 0) / k * 100:.0f}% of k={k}); real-text "
            f"acceptance {acc * 100:.0f}% ({acc_src}) -> "
            f"projected speedup {((acc * k + 1) / ratio):.2f}x on that workload"
        )
        print(json.dumps({
            "metric": f"spec_verify_cost_ratio_k{k}",
            "value": round(ratio, 3),
            "unit": "verify/decode step time",
            "vs_baseline": None,
        }))
        return 0

    b = max(args.batch, 1)
    log(f"decode path: {eng.decode_path(b)}")
    cache = eng.new_cache(b)
    log(
        f"kv cache: {cache.nbytes() / 1e9:.2f} GB "
        f"{jnp.dtype(eng.kv_dtype).name} @ {cfg.max_seq_len} window x batch {b}"
    )

    # short prompt hydrate per sequence (reference benches ~120-token
    # generations from short prompts, README.md:9); batched sequences step
    # through the same chunked path via eng.step
    prompt = np.tile(np.arange(1, 17, dtype=np.int32)[None], (b, 1))
    t0 = time.time()
    if args.moe and not args.mini:
        # hydrate token-by-token: a t>1 MoE chunk runs the dense-masked
        # expert einsum, whose (b, t, E, 2h) activation transient is ~15 GB
        # at these shapes — t=1 steps ride the gathered sparse path instead
        for i in range(prompt.shape[1]):
            logits, cache = eng.step(
                prompt[:, i : i + 1], np.full((b,), i, np.int32), cache,
                logits_mode="last" if i == prompt.shape[1] - 1 else "none",
            )
    else:
        logits, cache = eng.step(prompt, np.zeros((b,), np.int32), cache, logits_mode="last")
    tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
    jax.block_until_ready(tok0)
    pos = prompt.shape[1]
    log(f"prefill({prompt.shape[1]} tokens x{b}): {time.time() - t0:.1f}s (incl. compile)")

    # warmup: compile the scan-decode graph (same step count as the timed run
    # so exactly one program is compiled). The megakernel decode path is the
    # first thing that lowers through real Mosaic here; if it fails to
    # compile (or faults) on this backend, fall back to the proven per-layer
    # kernel path rather than losing the bench — the fallback is reported.
    t0 = time.time()
    posv = np.full((b,), pos, np.int32)
    try:
        toks, cache = eng.decode_scan(tok0, posv, cache, args.steps)
        toks = np.asarray(toks)
    except Exception as e:  # noqa: BLE001 — any lowering/runtime fault
        log(f"megakernel decode path FAILED on this backend; falling back to "
            f"per-layer kernels (XALM_NO_MEGAKERNEL). Error: {type(e).__name__}: "
            f"{str(e)[:500]}")
        os.environ["XALM_NO_MEGAKERNEL"] = "1"
        eng = build_engine(fused=False)
        cache = eng.new_cache(b)
        logits, cache = eng.step(
            prompt, np.zeros((b,), np.int32), cache, logits_mode="last"
        )
        tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = prompt.shape[1]
        posv = np.full((b,), pos, np.int32)
        toks, cache = eng.decode_scan(tok0, posv, cache, args.steps)
        toks = np.asarray(toks)
    log(f"decode compile+warmup({args.steps} steps): {time.time() - t0:.1f}s")
    log_cache_state("post-warmup")
    pos += args.steps

    if args.long:
        # one real multi-thousand-token generation, wall-clocked end to end
        # from the first post-warmup token: every decode_scan dispatch, host
        # chunk turnaround, cache donation, and the ring wrap near the end
        # (window 4096 < 4800) are inside the timed region — the honest
        # average the reference's long row reports
        n_chunks = -(-args.long // args.steps)
        n_gen = n_chunks * args.steps
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            toks, cache = eng.decode_scan(
                toks[:, -1].copy(), np.full((b,), pos, np.int32), cache, args.steps
            )
            toks = np.asarray(toks)
            pos += args.steps
        dt = time.perf_counter() - t0
        tok_s = n_gen * b / dt
        log(
            f"long generation: {n_gen} tokens x{b} in {dt:.1f}s -> "
            f"{tok_s:.2f} tok/s avg (prompt {prompt.shape[1]}, window "
            f"{cfg.max_seq_len}, wrapped for the last "
            f"{max(prompt.shape[1] + n_gen - cfg.max_seq_len, 0)} tokens)"
        )
        print(json.dumps({
            "metric": f"mistral7b_{args.dtype}_decode_tok_s_long{n_gen}"
            + (f"_b{args.batch}" if args.batch > 1 else ""),
            "value": round(tok_s, 2),
            "unit": "tok/s",
            "vs_baseline": round(tok_s / BASELINE_LONG_TOK_S, 3),
        }))
        log_cache_state("end of run")
        return 0

    if args.wrap:
        # run (untimed) until the ring wraps: the timed steps below then
        # measure the steady long-generation state — full-window kv reads
        # plus per-step sink re-rotation (reference's ~4800-token regime)
        t0 = time.time()
        while pos < cfg.max_seq_len + 64:
            toks, cache = eng.decode_scan(
                toks[:, -1].copy(), np.full((b,), pos, np.int32), cache, args.steps
            )
            toks = np.asarray(toks)
            pos += args.steps
        log(f"advanced past the window to pos {pos} ({time.time() - t0:.1f}s)")

    # timed runs (np.asarray forces a real host readback — block_until_ready
    # alone is unreliable through the axon tunnel). Best of 2: the first
    # post-warmup call can carry a one-time donation/relayout cost.
    dt_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        toks, cache = eng.decode_scan(toks[:, -1].copy(), np.full((b,), pos, np.int32), cache, args.steps)
        toks = np.asarray(toks)
        dt_s = min(dt_s, time.perf_counter() - t0)
        pos += args.steps
    tok_s = args.steps * b / dt_s

    # per-STEP bytes: weights stream once per step regardless of batch; KV
    # traffic scales with the batch
    per_seq = eng.active_bytes(pos + args.steps // 2)
    kv_part = per_seq - eng._per_token_weight_bytes
    active = eng._per_token_weight_bytes + b * kv_part
    achieved_gb_s = active * (tok_s / b) / 1e9
    roofline_tok_s = b * V5E_HBM_GB_S * 1e9 / active
    log(
        f"decode: {args.steps} steps in {dt_s:.3f}s -> {tok_s:.2f} tok/s | "
        f"active bytes/tok {active / 1e9:.2f} GB -> achieved {achieved_gb_s:.0f} GB/s "
        f"({achieved_gb_s / V5E_HBM_GB_S * 100:.0f}% of v5e roofline; "
        f"roofline {roofline_tok_s:.1f} tok/s)"
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"mixtral8x7b_l{cfg.n_layers}_moe" if args.moe else "mistral7b"
                )
                + f"_{args.dtype}_decode_tok_s_per_chip"
                + ("_wrapped" if args.wrap else "")
                + (f"_b{args.batch}" if args.batch > 1 else ""),
                "value": round(tok_s, 2),
                "unit": "tok/s",
                # the reference never runs MoE (loads Llama/Mistral only,
                # reference src/xalm.h:141) — no baseline row exists for it
                "vs_baseline": None if args.moe else round(
                    tok_s / (BASELINE_LONG_TOK_S if args.wrap else BASELINE_TOK_S), 3
                ),
            }
        )
    )
    log_cache_state("end of run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
