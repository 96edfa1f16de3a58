#!/usr/bin/env python
"""Time the decode-scan COMPILE (the bench warmup) without building params.

The r2 bench reported 1057 s of decode compile+warmup vs 183 s in r1 — this
probe isolates where that time goes: params/cache exist only as
ShapeDtypeStructs (jax.eval_shape), so `Engine._decode_scan.lower().compile()`
measures tracing + XLA/Mosaic compilation alone, with no 110 s synthetic
build and no device stepping.

Usage:
  python tools/compile_probe.py [--steps 96] [--kv bf16|i8] [--tiers N]
                                [--cache DIR]  # persistent compilation cache
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "i8"])
    ap.add_argument("--dtype", default="i8", choices=["i8", "bf16"])
    ap.add_argument("--tiers", type=int, default=0,
                    help="override the flash-attention context-tier count "
                    "(0 = leave as-is; 1 = no lax.switch)")
    ap.add_argument("--cache", default="",
                    help="jax_compilation_cache_dir (persistent cache probe)")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    if args.tiers:
        # the real code path honors this knob (pallas_attention._n_tiers);
        # set it before the engine traces anything
        import os

        os.environ["XALM_ATTN_TIERS"] = str(args.tiers)

    from xalm_tpu.runtime.cache import KVCache
    from xalm_tpu.runtime.engine import Engine
    from xalm_tpu.utils.synthetic import MISTRAL_7B, synthetic_params

    cfg = MISTRAL_7B
    wdt = {"i8": jnp.int8, "bf16": jnp.bfloat16}[args.dtype]
    kdt = {"bf16": jnp.bfloat16, "i8": jnp.int8}[args.kv]

    t0 = time.time()
    params_abs = jax.eval_shape(lambda: synthetic_params(cfg, weight_dtype=wdt))
    cache_abs = jax.eval_shape(lambda: KVCache.init(cfg, args.batch, kdt))
    eng = Engine(cfg, params_abs, None, kv_dtype=kdt)
    b = args.batch
    tok_abs = jax.ShapeDtypeStruct((b,), jnp.int32)
    pos_abs = jax.ShapeDtypeStruct((b,), jnp.int32)
    print(f"abstract setup: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    lowered = eng._decode_scan.lower(
        params_abs, tok_abs, pos_abs, cache_abs, args.steps, None
    )
    t_lower = time.time() - t0
    print(f"trace+lower: {t_lower:.1f}s", flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"backend compile: {t_compile:.1f}s", flush=True)
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"  peak temp {getattr(mem, 'temp_size_in_bytes', 0)/1e6:.0f} MB")
    print(
        f"TOTAL lower+compile: {t_lower + t_compile:.1f}s "
        f"(steps={args.steps} kv={args.kv} tiers={args.tiers or 'default'} "
        f"cache={'on' if args.cache else 'off'})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
