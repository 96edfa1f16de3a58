#!/usr/bin/env python
"""Megakernel hardware ablation + tuning sweep (VERDICT r3 next-round #1).

Builds the synthetic 7B i8 params ONCE, then compiles+times the scanned
decode for a list of megakernel variants:

  - probe ablations (XALM_MK_PROBE=noattn|noffn|nologit) — correctness-
    breaking kernel variants that isolate where step time goes,
  - tile/pool-size settings (_TILE_A/_TILE_B/_NBUF_CAP patched on the
    module between traces — each variant is its own Engine, so its own
    trace and its own compiled program),
  - the per-layer fallback (XALM_NO_MEGAKERNEL) as the control.

Usage:
  python tools/mk_sweep.py base noattn noffn nologit perlayer
  python tools/mk_sweep.py 'ta=512' 'nbuf=19' 'ta=128+nbuf=16' 'tb=512'
  python tools/mk_sweep.py --kv i8 base noattn   # quantized-KV variants

Variant grammar: '+'-joined tokens from
  base | perlayer | noattn | noffn | nologit | noattn,noffn,...
  ta=N | tb=N | nbuf=N
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from xalm_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

V5E_HBM_GB_S = 819.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def parse_variant(spec: str):
    """-> (ta, tb, nbuf, probe_csv, fused, bpipe)"""
    ta, tb, nbuf, probes, fused, bpipe = 256, 128, 8, [], True, True
    for tok in spec.split("+"):
        tok = tok.strip()
        if tok in ("", "base"):
            continue
        if tok == "perlayer":
            fused = False
        elif tok == "nobpipe":
            bpipe = False
        elif tok.startswith("ta="):
            ta = int(tok[3:])
        elif tok.startswith("tb="):
            tb = int(tok[3:])
        elif tok.startswith("nbuf="):
            nbuf = int(tok[5:])
        else:
            probes.extend(p for p in tok.split(",") if p)
    return ta, tb, nbuf, ",".join(probes), fused, bpipe


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+")
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "i8"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="i8", choices=["i8", "q4"],
                    help="q4: packed-4-bit body (implies a8 decode), for "
                    "sweeping the q4 megakernel's exposure map")
    ap.add_argument("--q4-group", type=int, default=512)
    args = ap.parse_args()

    from xalm_tpu.runtime.engine import Engine
    from xalm_tpu.models.params import recode_wcls_i8
    from xalm_tpu.utils.synthetic import MISTRAL_7B, synthetic_params
    import xalm_tpu.ops.fused_decode as fd

    cfg = MISTRAL_7B
    dev = jax.devices()[0]
    log(f"device: {dev} | backend: {jax.default_backend()}")
    t0 = time.time()
    params = recode_wcls_i8(synthetic_params(
        cfg, weight_dtype=jnp.int8,
        q4_group=args.q4_group if args.dtype == "q4" else 0,
    ))
    jax.block_until_ready(jax.tree.leaves(params))
    log(f"params resident: {params.nbytes() / 1e9:.2f} GB "
        f"(built in {time.time() - t0:.1f}s)")
    kv_dt = jnp.bfloat16 if args.kv == "bf16" else jnp.int8
    b = args.batch

    results = []
    for spec in args.variants:
        ta, tb, nbuf, probe, fused, bpipe = parse_variant(spec)
        fd._TILE_A, fd._TILE_B, fd._NBUF_CAP = ta, tb, nbuf
        fd._B_PIPE = bpipe
        os.environ["XALM_MK_PROBE"] = probe
        if not fused:
            os.environ["XALM_NO_MEGAKERNEL"] = "1"
        else:
            os.environ.pop("XALM_NO_MEGAKERNEL", None)
        log(f"--- variant {spec!r}: TA={ta} TB={tb} NBUF={nbuf} "
            f"probe={probe!r} fused={fused} bpipe={bpipe}")
        try:
            eng = Engine(cfg, params, None, kv_dtype=kv_dt, fused_step=fused,
                         a8_decode=args.dtype == "q4")
            cache = eng.new_cache(b)
            prompt = np.tile(np.arange(1, 17, dtype=np.int32)[None], (b, 1))
            logits, cache = eng.step(
                prompt, np.zeros((b,), np.int32), cache, logits_mode="last"
            )
            tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
            pos = prompt.shape[1]
            t0 = time.time()
            toks, cache = eng.decode_scan(
                tok0, np.full((b,), pos, np.int32), cache, args.steps
            )
            toks = np.asarray(toks)
            log(f"  compile+warmup: {time.time() - t0:.1f}s")
            pos += args.steps
            dt_s = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                toks, cache = eng.decode_scan(
                    toks[:, -1].copy(), np.full((b,), pos, np.int32),
                    cache, args.steps,
                )
                toks = np.asarray(toks)
                dt_s = min(dt_s, time.perf_counter() - t0)
                pos += args.steps
            tok_s = args.steps * b / dt_s
            per_seq = eng.active_bytes(pos + args.steps // 2)
            kv_part = per_seq - eng._per_token_weight_bytes
            active = eng._per_token_weight_bytes + b * kv_part
            gbs = active * (tok_s / b) / 1e9
            ms = dt_s / args.steps * 1e3
            log(f"  {spec:28s} {tok_s:7.2f} tok/s | {ms:6.3f} ms/step | "
                f"{gbs:5.0f} GB/s ({gbs / V5E_HBM_GB_S * 100:.0f}% roofline)")
            results.append((spec, tok_s, ms, gbs))
            del cache, eng
            gc.collect()
        except Exception as e:  # noqa: BLE001 — sweep survives a bad variant
            log(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")
            results.append((spec, None, None, None))
            gc.collect()

    log("\n=== sweep summary ===")
    for spec, tok_s, ms, gbs in results:
        if tok_s is None:
            log(f"{spec:32s} FAILED")
        else:
            log(f"{spec:32s} {tok_s:7.2f} tok/s  {ms:6.3f} ms/step  {gbs:5.0f} GB/s")
    import json

    print(json.dumps([
        {"variant": s, "tok_s": t, "ms_step": m, "gb_s": g}
        for s, t, m, g in results
    ]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
