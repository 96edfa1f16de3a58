"""CLI harness: completion | perplexity | passkey workloads.

Same surface as the reference CLI (reference src/main.cpp:14-44, 381-549):

    python -m xalm_tpu.harness.main <checkpoint.xalm> [options]
      -d [cpu,tpu]    device (default: whatever jax selected)
      -m [completion,passkey,perplexity]   mode (default completion)
      -T <int>        sliding window context length (0 - max)
      -i <string>     input prompt
      -f <filepath>   input file with prompt
      -n <int>        completion: steps (default 256, 0 = max_seq_len);
                      passkey: junk lines (default 250)
      -l <int>        passkey position (-1 - random)
      -t <dtype>      kv cache dtype: f16 (default) | bf16 | f32
      --compute <d>   matmul compute dtype: auto (default; bf16 on TPU) | f32 | bf16
      --profile       print the host profiler table at exit

Defects of the reference parser intentionally not reproduced (SURVEY.md §7):
help text claiming the default device is cuda while code defaults cpu, and
``-n`` silently aliasing num_steps and n_junk across modes (here the single
``-n`` flag is documented per-mode, matching observed behavior).

Stats semantics match the reference: tok/s, s/tok, hydrate time, achieved
GB/s against the active-bytes model (main.cpp:83-85, 118-127), perplexity ±
stderr (main.cpp:257-267).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

import numpy as np


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="xalm",
        description="TPU-native quantized LLM inference (xalm_tpu)",
    )
    p.add_argument("checkpoint", help=".xalm model file")
    p.add_argument("-d", dest="device", default="", choices=["", "cpu", "tpu"], help="device")
    p.add_argument(
        "-m", dest="mode", default="completion",
        choices=["completion", "c", "passkey", "perplexity"], help="run mode",
    )
    p.add_argument("-T", dest="context", type=int, default=0, help="context window (0 - max)")
    p.add_argument("-i", dest="prompt", default=None, help="input prompt")
    p.add_argument("-f", dest="prompt_file", default=None, help="input file with prompt")
    p.add_argument("-n", dest="num", type=int, default=None,
                   help="completion: steps (default 256; 0 = max_seq_len); passkey: junk lines (default 250)")
    p.add_argument("-l", dest="passkey_pos", type=int, default=-1, help="passkey position (-1 - random)")
    p.add_argument("-t", dest="kv_dtype", default="f16", choices=["f16", "bf16", "f32", "i8"],
                   help="kv cache dtype (i8 = quantized with per-row scales)")
    p.add_argument("--compute", default="auto", choices=["auto", "f32", "bf16"], help="matmul compute dtype (auto: bf16 on TPU)")
    p.add_argument("--matmul", default="auto", choices=["auto", "xla", "pallas"], help="matmul kernel impl")
    p.add_argument("--wcls-i8", action="store_true",
                   help="recode the boosted classifier head to i8 per-row at "
                   "load (extension; quality-gated in RESULTS.md)")
    p.add_argument("--q4", type=int, default=0, metavar="GROUP",
                   help="pack the body weights to 4-bit at load with GROUP "
                   "weights per scale (128-multiple, e.g. 128): halves the "
                   "decode weight stream through the megakernel's in-VMEM "
                   "unpack (extension; quality-gated in RESULTS.md)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="sampling temperature (0 = greedy, the reference's only mode)")
    p.add_argument("--top-k", type=int, default=0, help="top-k filter (0 = off)")
    p.add_argument("--top-p", type=float, default=1.0, help="nucleus filter (1 = off)")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="speculative decoding with K drafts per verify"
                        " chunk (try 7; greedy-exact, wrap-safe; see"
                        " runtime/spec.py)")
    p.add_argument("--draft", metavar="DRAFT.xalm", default=None,
                   help="with --spec: draft with this (smaller) model"
                        " instead of n-gram lookup (must share the"
                        " tokenizer/vocab)")
    p.add_argument("--profile", action="store_true", help="print profiler report at exit")
    p.add_argument("--seed", type=int, default=None, help="seed for passkey randomness")
    p.add_argument(
        "--session", default=None, metavar="PATH",
        help="completion: resume from PATH if it exists, save the KV cache + "
        "token history there afterwards (xalm v2 block store)",
    )
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel ways (device mesh)")
    p.add_argument("--dp", type=int, default=1, help="data-parallel ways (device mesh)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (layer-sharded capacity "
                        "mode; composes with --tp, exclusive with --dp)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port (or XALM_COORDINATOR)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count (or XALM_NUM_PROCESSES)")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process id (or XALM_PROCESS_ID)")
    return p


def _get_prompt(args) -> str:
    if args.prompt is not None and args.prompt_file is not None:
        raise SystemExit("error: choose one of -i or -f")
    if args.prompt_file is not None:
        with open(args.prompt_file) as f:
            return f.read()
    if args.prompt is not None:
        return args.prompt
    raise SystemExit("error: provide a prompt with -i or -f")


def _load_engine(args):
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from xalm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if args.coordinator or "XALM_COORDINATOR" in os.environ:
        # multi-host: join the jax.distributed runtime before devices init
        from xalm_tpu.parallel.multihost import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)
    import jax.numpy as jnp

    from xalm_tpu.obs.profiler import profile
    from xalm_tpu.runtime.engine import Engine

    dt = {"f16": jnp.float16, "bf16": jnp.bfloat16, "f32": jnp.float32, "i8": jnp.int8, "auto": "auto"}
    print(f"loading model {args.checkpoint}")
    if args.q4 and (args.tp > 1 or args.dp > 1 or args.pp > 1):
        raise SystemExit("error: --q4 is single-device (the sharded engines "
                         "stream i8; shard-aware 4-bit packing is future work)")
    with profile("model load"):
        if args.pp > 1:
            if args.dp > 1:
                raise SystemExit("error: --pp composes with --tp, not --dp")
            from xalm_tpu.parallel.pipeline import PipelinedEngine, make_pp_mesh

            mesh = make_pp_mesh(args.pp, tp=args.tp)
            print(f"mesh: pp={args.pp} x tp={args.tp} over {len(jax.devices())} devices")
            eng = PipelinedEngine.from_xalm(
                args.checkpoint,
                mesh,
                context=args.context,
                kv_dtype=dt[args.kv_dtype],
                compute_dtype=dt[args.compute],
            )
        elif args.tp * args.dp > 1:
            from xalm_tpu.parallel.mesh import make_mesh
            from xalm_tpu.parallel.sharded_engine import ShardedEngine

            mesh = make_mesh(dp=args.dp, tp=args.tp)
            print(f"mesh: dp={args.dp} x tp={args.tp} over {len(jax.devices())} devices")
            eng = ShardedEngine.from_xalm(
                args.checkpoint,
                mesh,
                context=args.context,
                kv_dtype=dt[args.kv_dtype],
                compute_dtype=dt[args.compute],
                matmul_impl=args.matmul,
            )
        else:
            eng = Engine.from_xalm(
                args.checkpoint,
                context=args.context,
                kv_dtype=dt[args.kv_dtype],
                compute_dtype=dt[args.compute],
                matmul_impl=args.matmul,
                wcls_i8=args.wcls_i8,
                q4_group=args.q4,
            )
    cfg = eng.cfg
    print(
        f"{cfg.n_layers} layers | dim {cfg.dim} | {cfg.n_heads} heads "
        f"({cfg.n_kv_heads} kv) | window {cfg.max_seq_len} | vocab {cfg.vocab_size}"
    )
    print(f"active bytes with full context window: {eng.active_bytes(cfg.max_seq_len):,}")
    return eng


def run_completion(args) -> int:
    """Reference run_completion (main.cpp:44-128)."""
    eng = _load_engine(args)
    tok = eng.tokenizer
    if tok is None:
        raise SystemExit("error: model has no tokenizer.tokens tensor")
    prompt = _get_prompt(args)
    num_steps = 256 if args.num is None else args.num
    if num_steps == 0:
        num_steps = eng.cfg.max_seq_len

    t0 = time.perf_counter()
    ids = tok.encode(prompt)
    enc_s = time.perf_counter() - t0
    print(
        f"Encoding stats: ({len(ids)} tokens, throughput: {len(ids)/max(enc_s,1e-9):.4g} tok/s, "
        f"latency: {enc_s/max(len(ids),1):.4g} s/tok, total: {enc_s:.4g}s)"
    )

    resume = None
    if args.session and os.path.exists(args.session):
        from xalm_tpu.runtime.session import load_session

        resume = load_session(args.session, eng.cfg)
        print(f"resumed session {args.session}: {len(resume.tokens[0])} tokens at pos {int(resume.pos[0])}")
        # continuation: no BOS, context is already in the cache
        ids = tok.encode(prompt, bos=False)

    prev = ids[0] if ids else tok.bos_id
    printed = [prev]

    def on_token(t):
        nonlocal prev
        sys.stdout.write(tok.decode_one(prev, t).decode("utf-8", "replace"))
        sys.stdout.flush()
        prev = t

    sys.stdout.write(prompt)
    if args.session:
        out, stats, sess = eng.generate(ids, num_steps, on_token=on_token, resume=resume, return_session=True)
        from xalm_tpu.runtime.session import save_session

        save_session(args.session, eng.cfg, sess)
        print(f"\nsaved session to {args.session} ({len(sess.tokens[0])} tokens)", end="")
    elif args.spec:
        from xalm_tpu.runtime.spec import generate_spec

        draft_eng = None
        if args.draft:
            from xalm_tpu.runtime.engine import Engine as _E

            draft_eng = _E.from_xalm(args.draft, progress=False)
        out, stats = generate_spec(
            eng, ids, num_steps, k=args.spec, on_token=on_token,
            draft_engine=draft_eng,
        )
    elif args.temperature > 0:
        out, stats = eng.generate(
            ids, num_steps, on_token=on_token, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p, seed=args.seed,
        )
    else:
        out, stats = eng.generate(ids, num_steps, on_token=on_token)
    print()
    print(
        f"Generation stats:\n"
        f"  prompt: {stats.prompt_tokens} tokens, hydrate: {stats.prefill_s:.4g}s\n"
        f"  {stats.generated_tokens} tokens, throughput: {stats.tok_per_s:.5g} tok/s, "
        f"latency: {stats.decode_s/max(stats.generated_tokens,1):.5g} s/tok\n"
        f"  bandwidth: {stats.bandwidth_gb_s:.5g} GB/s (vs active bytes model)\n"
        f"  decode path: {eng.decode_path(1)}"
    )
    if stats.spec_proposed:
        print(
            f"  speculation: {stats.spec_accepted}/{stats.spec_proposed} drafts accepted "
            f"({100.0 * stats.spec_accepted / stats.spec_proposed:.1f}%)"
        )
    return 0


def run_perplexity(args) -> int:
    """Reference run_perplexity (main.cpp:198-268)."""
    eng = _load_engine(args)
    tok = eng.tokenizer
    prompt = _get_prompt(args)
    ids = tok.encode(prompt)
    print(f"perplexity over {len(ids)} tokens...")
    t0 = time.perf_counter()
    ppl, err, n = eng.perplexity(ids)
    dt = time.perf_counter() - t0
    bw = sum(eng.active_bytes(p) for p in range(n)) / dt / 1e9
    print(
        f"perplexity: {ppl:.4f} ± {err:.4f} over {n} tokens\n"
        f"  throughput: {n/dt:.4g} tok/s, bandwidth: {bw:.4g} GB/s"
    )
    return 0


PASSKEY_PREFIX = (
    "There is an important info hidden inside a lot of irrelevant text. "
    "Find it and memorize them. I will quiz you about the important information there."
)
PASSKEY_SUFFIX = " What is the pass key? The pass key is"
PASSKEY_JUNK = (
    " The grass is green. The sky is blue. The sun is yellow. "
    "Here we go. There and back again."
)


def build_passkey_prompt(n_junk: int, pos: int, passkey: int) -> str:
    """Synthetic long-context retrieval prompt (reference main.cpp:293-309)."""
    parts = [PASSKEY_PREFIX]
    for i in range(n_junk):
        if i == pos:
            parts.append(
                f" The pass key is {passkey}. Remember it. {passkey} is the pass key."
            )
        parts.append(PASSKEY_JUNK)
    parts.append(PASSKEY_SUFFIX)
    return "".join(parts)


def run_passkey(args) -> int:
    """Reference run_passkey (main.cpp:270-352): long-context retrieval while
    the sliding-window KV ring wraps."""
    eng = _load_engine(args)
    tok = eng.tokenizer
    if args.seed is not None:
        random.seed(args.seed)
    n_junk = 250 if args.num is None else args.num
    passkey = random.randint(1, 50000)
    pos = args.passkey_pos if args.passkey_pos != -1 else random.randrange(n_junk)
    prompt = build_passkey_prompt(n_junk, pos, passkey)

    ids = tok.encode(prompt)
    print(
        f"Passkey test:\n  prompt: {len(ids)} tokens\n  passkey: {passkey}\n"
        f"  passkey position: {pos}/{n_junk}\n  context window: {eng.cfg.max_seq_len}"
    )
    t0 = time.perf_counter()
    # <=16 greedy steps (reference MAX_GENERATION_STEPS)
    out, stats = eng.generate(ids, 16)
    dt = time.perf_counter() - t0
    text = tok.decode(out)
    print(f"  model answer: {text.strip()!r}")
    ok = str(passkey) in text
    print(f"  retrieval: {'OK' if ok else 'FAILED'}  ({dt:.1f}s total, "
          f"hydrate {stats.prefill_s:.1f}s, {stats.tok_per_s:.3g} tok/s decode)")
    return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    from xalm_tpu.obs.console import SystemUsage

    proc_t0, proc_r0 = SystemUsage._now()
    args = _build_parser().parse_args(argv)
    mode = {"c": "completion"}.get(args.mode, args.mode)
    try:
        if mode == "completion":
            rc = run_completion(args)
        elif mode == "perplexity":
            rc = run_perplexity(args)
        else:
            rc = run_passkey(args)
    except (FileNotFoundError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if args.profile:
        from xalm_tpu.obs.profiler import report

        print(report())
        # whole-process resource table (reference profiler.h:76-178 /
        # main.cpp:538-546 end-of-run reporting)
        print(SystemUsage.measure(proc_t0, proc_r0).format(title="process usage"))
    return rc


if __name__ == "__main__":
    sys.exit(main())
