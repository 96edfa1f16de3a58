#!/usr/bin/env python
"""Pre-deploy multi-chip compile check: build the sharded decode/prefill
step for a named TPU topology with the REAL XLA:TPU compiler (no chips
needed) and report the optimized executable's collective structure.

Usage:
  python tools/aot_compile.py --topology v5e:2x4 --tp 4 [--dp 2]
      [--preset 7b|tiny] [--t 128] [--matmul xla|pallas] [--kv i8]

Exit code 0 = the full multi-chip program compiles for that part; the
printed table is the comm structure docs/SCALING.md's model is pinned to
(tests/test_scaling_model.py::test_aot_tpu_collectives).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--preset", default="tiny", choices=["tiny", "7b"])
    ap.add_argument("--t", type=int, default=1, help="tokens per step (1=decode)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--matmul", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--kv", default="bf16", choices=["bf16", "i8"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from xalm_tpu.models.config import ModelConfig
    from xalm_tpu.parallel.aot import (
        abstract_engine,
        collective_stats,
        compile_step,
        topology_mesh,
    )

    if args.preset == "7b":
        from xalm_tpu.utils.synthetic import MISTRAL_7B as cfg
    else:
        cfg = ModelConfig(
            dim=2048, hidden_dim=5632, head_dim=128, n_layers=4, n_heads=16,
            n_kv_heads=8, vocab_size=32000, max_seq_len=1024, rope_theta=1e4,
            rotary_dim=128, norm_eps=1e-5, act="silu", tie_word_embeddings=False,
        )

    mesh = topology_mesh(args.topology, dp=args.dp, tp=args.tp)
    print(f"topology {args.topology}: mesh dp={args.dp} tp={args.tp}", flush=True)
    eng = abstract_engine(
        cfg, mesh,
        matmul_impl=args.matmul,
        kv_dtype=jnp.int8 if args.kv == "i8" else jnp.bfloat16,
    )
    t0 = time.time()
    compiled = compile_step(eng, batch=args.batch, t=args.t)
    dt = time.time() - t0
    stats = collective_stats(compiled)
    mem = compiled.memory_analysis()
    print(f"compiled in {dt:.1f}s ({'decode' if args.t == 1 else f'prefill x{args.t}'})")
    if mem is not None:
        print(
            f"per-chip memory: args {mem.argument_size_in_bytes / 1e9:.3f} GB | "
            f"output {mem.output_size_in_bytes / 1e9:.3f} GB | "
            f"temp {mem.temp_size_in_bytes / 1e6:.1f} MB"
        )
    print(json.dumps({"topology": args.topology, "dp": args.dp, "tp": args.tp,
                      "t": args.t, "collectives": stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
