#!/usr/bin/env python
"""Hardware numerics gate: tiny-model prefill+decode on the real TPU vs CPU.

pytest pins the CPU backend (tests/conftest.py), so kernel lowering bugs
that only appear on real hardware (tiling, aliasing, revisiting semantics)
escape the suite. This script runs the same chunked prefill (the flash
prefill kernel) + greedy decode through >=2 ring wraps on both backends
(separate subprocesses — the jax platform latches once per process) and
compares logits/argmax step by step across:

- batch B in {1, 4} (every b<=8 decode runs the whole-step megakernel,
  ops/fused_decode.py — manual DMA + inline flash through real Mosaic,
  with B=4 covering its batched-row attention/ring phase; explicit
  fused_step=False legs keep the per-layer batch-vectorized (kh, nsb)
  flash-decode grid gated too, since batch>8 serving still uses it),
- kv cache dtype in {bf16, int8-quantized},
- a ShardedEngine leg on a (dp=1, tp=1) mesh — shard_map + psum + the
  Pallas kernels lowering through real Mosaic (the sharded path otherwise
  only ever runs in interpret mode on the CPU test mesh),
- a tp-local-shapes leg: a 1-kv-head, half-vocab config — the exact local
  array shapes a tp=2 shard of the 2-kv-head config would hand the kernels.

Usage: python tools/check_tpu.py  (exits non-zero on any divergence)
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys

import numpy as np

PREFILL, STEPS, WINDOW = 8, 40, 16  # 8 + 40 = 3 ring wraps


def run(backend: str | None):
    """Prefill + decode per (B, kv) config; returns (resolved backend name,
    {config: (STEPS, B, vocab) f32 logits})."""
    import jax

    if backend:
        jax.config.update("jax_platforms", backend)
    from xalm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from xalm_tpu.models.config import ModelConfig
    from xalm_tpu.runtime.engine import Engine
    from xalm_tpu.utils.synthetic import synthetic_params

    cfg = ModelConfig(
        dim=256, hidden_dim=1024, head_dim=128, n_layers=2, n_heads=4,
        n_kv_heads=2, vocab_size=512, max_seq_len=WINDOW,
        rope_theta=10000.0, rotary_dim=128, act="silu",
    )
    # seeded weights are identical across backends (drawn on-device from the
    # same key; int8 codes are exact either way)
    params = synthetic_params(cfg, weight_dtype=jnp.int8, embed_dtype=jnp.bfloat16)
    rng = np.random.default_rng(7)
    out = {}
    def drive(eng, b, vocab, tag):
        prompt = rng.integers(3, vocab - 2, size=(b, PREFILL)).astype(np.int32)
        toks = rng.integers(3, vocab - 2, size=(b, STEPS)).astype(np.int32)
        cache = eng.new_cache(b)
        # chunked prefill (T>1): the fused flash-prefill kernel + DUS
        # writes on TPU
        _, cache = eng.step(prompt, np.zeros(b, np.int32), cache, logits_mode="none")
        logits = []
        for i in range(STEPS):
            lg, cache = eng.decode(
                toks[:, i], np.full(b, PREFILL + i, np.int32), cache
            )
            logits.append(np.asarray(lg))
        out[tag] = np.stack(logits).astype(np.float32)

    for b in (1, 4):
        for name, kv in (("bf16", jnp.bfloat16), ("i8", jnp.int8)):
            eng = Engine(cfg, params, None, kv_dtype=kv, compute_dtype=jnp.float32)
            drive(eng, b, cfg.vocab_size, f"b{b}/kv={name}")

    # --- per-layer kernel path at B=4: the megakernel now captures every
    # b<=8 decode, but batch>8 serving still runs the per-layer batched
    # (kh, nsb) flash-decode grid — keep it hardware-gated explicitly
    for name, kv in (("bf16", jnp.bfloat16), ("i8", jnp.int8)):
        eng = Engine(
            cfg, params, None, kv_dtype=kv, compute_dtype=jnp.float32,
            fused_step=False,
        )
        drive(eng, 4, cfg.vocab_size, f"b4-perlayer/kv={name}")

    # --- megakernel phase 5: i8 classifier fold + in-kernel greedy argmax
    # (the bench default --wcls i8 path; new Mosaic surface: wcls tiles on
    # the shared pool-A stream, lane-iota argmax, (1, 128) token output)
    eng = Engine(
        cfg, params, None, kv_dtype=jnp.bfloat16, compute_dtype=jnp.float32,
        wcls_i8=True,
    )
    drive(eng, 1, cfg.vocab_size, "mk-wcls/kv=bf16")
    cache = eng.new_cache(1)
    prompt = rng.integers(3, cfg.vocab_size - 2, size=(1, PREFILL)).astype(np.int32)
    _, cache = eng.step(prompt, np.zeros(1, np.int32), cache, logits_mode="none")
    scan_toks, _ = eng.decode_scan(
        prompt[:, -1], np.full(1, PREFILL, np.int32), cache, STEPS
    )
    out["tokens/mk-wcls"] = np.asarray(scan_toks).astype(np.float32)

    # --- i8-KV megakernel with sb < S: the scale-plane flash DMAs then
    # slice the LANE (S) dim at dynamic 512-multiples (the 7B shape). The
    # WINDOW=16 legs have sb == S where that slice is whole-dim and the
    # dynamic case never lowers.
    import dataclasses

    cfg_long = dataclasses.replace(cfg, max_seq_len=1024)
    params_long = synthetic_params(cfg_long, weight_dtype=jnp.int8, embed_dtype=jnp.bfloat16)
    eng = Engine(cfg_long, params_long, None, kv_dtype=jnp.int8, compute_dtype=jnp.float32)
    prompt = rng.integers(3, cfg_long.vocab_size - 2, size=(1, PREFILL)).astype(np.int32)
    toks = rng.integers(3, cfg_long.vocab_size - 2, size=(1, 8)).astype(np.int32)
    cache = eng.new_cache(1)
    _, cache = eng.step(prompt, np.zeros(1, np.int32), cache, logits_mode="none")
    logits = []
    for i in range(8):
        lg, cache = eng.decode(toks[:, i], np.full(1, PREFILL + i, np.int32), cache)
        logits.append(np.asarray(lg))
    out["longwin/kv=i8"] = np.stack(logits).astype(np.float32)

    # --- ShardedEngine: shard_map + psum + Pallas through the real backend
    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine

    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    for name, kv in (("bf16", jnp.bfloat16), ("i8", jnp.int8)):
        eng = ShardedEngine(
            cfg, params, None, mesh, kv_dtype=kv, compute_dtype=jnp.float32
        )
        drive(eng, 1, cfg.vocab_size, f"sharded/kv={name}")

    # --- tp-local shapes: what a tp=2 shard of cfg hands the kernels
    # (half the kv heads, half the q heads, half the vocab)
    cfg_loc = dataclasses.replace(cfg, n_heads=2, n_kv_heads=1, vocab_size=256)
    params_loc = synthetic_params(cfg_loc, weight_dtype=jnp.int8, embed_dtype=jnp.bfloat16)
    for name, kv in (("bf16", jnp.bfloat16), ("i8", jnp.int8)):
        eng = Engine(cfg_loc, params_loc, None, kv_dtype=kv, compute_dtype=jnp.float32)
        drive(eng, 1, cfg_loc.vocab_size, f"tplocal/kv={name}")

    # --- speculative-decoding verify chunk (runtime/spec.py): the k+1-token
    # chunk forward with logits_mode="all" must agree position-by-position
    # with sequential 1-token decode (prefill-kernel vs decode-kernel
    # numerics — the property spec decode's greedy-exactness rests on)
    eng = Engine(cfg, params, None, kv_dtype=jnp.bfloat16, compute_dtype=jnp.float32)
    prompt = rng.integers(3, cfg.vocab_size - 2, size=(1, PREFILL)).astype(np.int32)
    chunk = rng.integers(3, cfg.vocab_size - 2, size=(1, 8)).astype(np.int32)
    cache = eng.new_cache(1)
    _, cache = eng.step(prompt, np.zeros(1, np.int32), cache, logits_mode="none")
    lg_chunk, _ = eng.step(
        chunk, np.full(1, PREFILL, np.int32), cache, logits_mode="all"
    )
    cache2 = eng.new_cache(1)
    _, cache2 = eng.step(prompt, np.zeros(1, np.int32), cache2, logits_mode="none")
    lg_steps = []
    for i in range(8):
        lg, cache2 = eng.decode(chunk[:, i], np.full(1, PREFILL + i, np.int32), cache2)
        lg_steps.append(np.asarray(lg))
    out["specverify/chunk"] = np.asarray(lg_chunk)[0].astype(np.float32)
    out["specverify/steps"] = np.stack(lg_steps)[:, 0].astype(np.float32)
    return jax.default_backend(), out


def _subprocess_run(backend: str | None) -> "tuple[str, dict[str, np.ndarray]]":
    code = (
        "import pickle, sys; sys.path.insert(0, '.');"
        "import tools.check_tpu as m;"
        f"sys.stdout.buffer.write(pickle.dumps(m.run({backend!r})))"
    )
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr.decode()[-2000:])
        raise RuntimeError(f"{backend or 'default'} run crashed")
    return pickle.loads(p.stdout)


def main() -> int:
    cpu_backend, cpu = _subprocess_run("cpu")
    tpu_backend, tpu = _subprocess_run(None)  # default backend: TPU when present
    if tpu_backend == "cpu":
        # a CPU-vs-CPU comparison passes vacuously — refuse to mislead
        print("FAIL: no TPU backend available (default run resolved to cpu)", file=sys.stderr)
        return 2
    print(f"backends: {cpu_backend} vs {tpu_backend}")
    rc = 0
    for name in cpu:
        c, t = cpu[name], tpu[name]
        if name.startswith("tokens/"):
            # greedy scan token ids (in-kernel argmax). A near-tie flip
            # mid-scan cascades (each token feeds the next), so full-length
            # exact match is too strict across backends; a lowering bug
            # shows up as immediate garbage instead. Gate: first 8 exact.
            flat_c, flat_t = c.ravel(), t.ravel()
            div = int(np.argmax(flat_c != flat_t)) if (flat_c != flat_t).any() else len(flat_c)
            print(f"[{name}] greedy tokens agree through step {div}/{len(flat_c)}")
            if div < 8:
                print(f"FAIL: greedy scan tokens diverge at step {div} ({name})", file=sys.stderr)
                rc = 1
            continue
        agree = float((c.argmax(-1) == t.argmax(-1)).mean())
        err = float(np.abs(c - t).max() / (np.abs(c).max() + 1e-9))
        print(f"[{name}] argmax agreement: {agree * 100:.1f}% | max rel logit delta: {err:.3e}")
        if agree < 0.95 or err > 5e-2:
            print(f"FAIL: TPU numerics diverge from CPU ({name})", file=sys.stderr)
            rc = 1
    # intra-TPU: the spec verify chunk must agree with sequential decode at
    # every position (greedy-exactness of runtime/spec.py rests on this)
    c8, s8 = tpu["specverify/chunk"], tpu["specverify/steps"]
    agree = float((c8.argmax(-1) == s8.argmax(-1)).mean())
    err = float(np.abs(c8 - s8).max() / (np.abs(c8).max() + 1e-9))
    print(f"[specverify chunk-vs-steps on {tpu_backend}] argmax agreement: "
          f"{agree * 100:.1f}% | max rel logit delta: {err:.3e}")
    if agree < 0.95 or err > 5e-2:
        print("FAIL: spec verify chunk diverges from sequential decode", file=sys.stderr)
        rc = 1
    print("TPU numerics OK" if rc == 0 else "TPU numerics FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
