#!/usr/bin/env python
"""Serving benchmark: the continuous batcher under load at 7B shapes.

bench.py --batch measures raw aggregate decode; this drives the actual
serving layer (admission, budgeted incremental prefill interleaved with
decode segments, retirement) and reports what an operator cares about:
aggregate generated tok/s, queue wait, time-to-first-token, and per-token
latency percentiles.

Usage: python tools/serve_bench.py [--requests 24] [--max-batch 8]
       [--prompt 128] [--gen 96] [--kv i8]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=128, help="mean prompt tokens")
    ap.add_argument("--gen", type=int, default=96, help="max new tokens per request")
    ap.add_argument("--kv", default="bf16", choices=["bf16", "i8"])
    ap.add_argument("--q4", type=int, default=0, metavar="GROUP",
                    help="serve the packed-4-bit body (group size, e.g. "
                    "512): the shipped single-stream decode format under "
                    "the continuous batcher")
    ap.add_argument("--segment", type=int, default=None)
    ap.add_argument("--sampled-frac", type=float, default=0.0,
                    help="fraction of requests using temperature 0.8 + "
                    "top_p 0.95 (the mixed-batch per-row sampled scan)")
    ap.add_argument("--logprobs-frac", type=float, default=0.0,
                    help="fraction of requests collecting logprobs=3")
    ap.add_argument("--shared-prefix", type=int, default=0, metavar="N",
                    help="prepend the same N-token system prompt to every "
                    "request (measures automatic prefix caching)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xalm_tpu.runtime.engine import Engine
    from xalm_tpu.serve.batching import ContinuousBatcher, Request
    from xalm_tpu.utils.compile_cache import cache_stats, enable_compile_cache
    from xalm_tpu.utils.synthetic import MISTRAL_7B, synthetic_params

    enable_compile_cache()

    cfg = MISTRAL_7B
    print(f"backend: {jax.default_backend()} | building 7B i8 params...", file=sys.stderr, flush=True)
    params = synthetic_params(
        cfg, weight_dtype=jnp.int8, q4_group=args.q4,
    )
    jax.block_until_ready(jax.tree.leaves(params))
    kv = jnp.bfloat16 if args.kv == "bf16" else jnp.int8
    eng = Engine(cfg, params, None, kv_dtype=kv, a8_decode=bool(args.q4))

    rng = np.random.default_rng(0)
    batcher = ContinuousBatcher(eng, max_batch=args.max_batch, segment=args.segment)
    shared = rng.integers(3, cfg.vocab_size - 2, size=args.shared_prefix).tolist()
    reqs = []
    for i in range(args.requests):
        plen = int(rng.integers(args.prompt // 2, args.prompt * 2))
        ids = shared + rng.integers(3, cfg.vocab_size - 2, size=plen).tolist()
        sampled = rng.random() < args.sampled_frac
        reqs.append(Request(
            prompt_ids=ids, max_new_tokens=args.gen, stop_on_eos=False,
            temperature=0.8 if sampled else 0.0,
            top_p=0.95 if sampled else 1.0,
            seed=i,
            logprobs=3 if rng.random() < args.logprobs_frac else 0,
        ))

    # warm every program the run can hit — prefill buckets, probe, greedy
    # scan, sampled scans ± logprobs, first-token draw — BEFORE the timed
    # window. The old warmup submitted tiny GREEDY requests only, so
    # sampled/logprob programs loaded lazily inside live ticks (~45 s
    # spread across TTFT at 7B on this remote-attach link).
    wu = batcher.warmup(
        sampled=args.sampled_frac > 0,
        logprobs=args.logprobs_frac > 0,
    )
    print(f"warmup/compile (batcher.warmup): {wu:.1f}s", file=sys.stderr, flush=True)
    batcher.completed.clear()
    batcher.decoded_tokens = 0
    batcher.decode_steps = 0

    for r in reqs:
        batcher.submit(r)
    t0 = time.perf_counter()
    batcher.run()
    wall = time.perf_counter() - t0
    if batcher.prefix_hits:
        print(
            f"prefix caching: {batcher.prefix_hits} hits, "
            f"{batcher.prefix_tokens_saved} prompt tokens skipped",
            file=sys.stderr, flush=True,
        )

    gen_tokens = sum(len(r.out_tokens) for r in reqs)
    prompt_tokens = sum(len(r.prompt_ids) for r in reqs)
    stats = batcher.latency_stats()
    print(
        f"{args.requests} requests (~{prompt_tokens} prompt + {gen_tokens} generated tokens) "
        f"in {wall:.1f}s | slots {args.max_batch} | kv {args.kv}",
        file=sys.stderr,
    )
    for k, v in stats.items():
        print(f"  {k}: {v:.3f}" if isinstance(v, float) else f"  {k}: {v}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"mistral7b{'_q4' if args.q4 else ''}_serve_tok_s"
                f"_b{args.max_batch}_kv{args.kv}",
                "value": round(gen_tokens / wall, 1),
                "unit": "tok/s",
                "vs_baseline": None,
                "ttft_p50_s": round(stats.get("ttft_p50_s", 0), 3),
                "ttft_p95_s": round(stats.get("ttft_p95_s", 0), 3),
                "tok_latency_p50_s": round(stats.get("tok_latency_p50_s", 0), 4),
                "processed_tok_s": round((prompt_tokens + gen_tokens) / wall, 1),
            }
        )
    )
    st = cache_stats()
    print(f"compile cache: {st['hits']} hits / {st['misses']} misses "
          f"of {st['requests']} cacheable compiles", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
