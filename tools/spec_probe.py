"""Speculative-decoding realism probe on the locally-trained real model.

Measures what prompt-lookup speculation (runtime/spec.py) actually buys on
real text: greedy-exactness vs Engine.generate, draft acceptance rate, and
the *weight-stream reuse factor* — emitted tokens per device call. On a
bandwidth-bound decoder every device call streams the full weight set
(reference model.cpp:12-35), so reuse is the honest hardware-independent
speedup bound: projected decode tok/s ~= reuse x the plain decode rate.

Prompts are held-out code/text windows (models/xalm-mini/heldout_ids.npy —
never trained on), continued for --gen tokens each. Runs on CPU or TPU;
the acceptance/reuse numbers are device-independent (greedy tokens only).

Usage: python tools/spec_probe.py [--model models/xalm-mini] [--cpu]
       [--prompts 16] [--ctx 192] [--gen 64] [--k 7] [--json out.json]
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
    ap.add_argument("--model", default="models/xalm-mini")
    ap.add_argument("--work", default="/tmp/xalm_spec_probe")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--prompts", type=int, default=16)
    ap.add_argument("--ctx", type=int, default=192, help="prompt tokens per window")
    ap.add_argument("--gen", type=int, default=64, help="tokens generated per prompt")
    ap.add_argument("--k", type=int, default=7, help="drafts per verify chunk")
    ap.add_argument("--json", default=None, help="also write a JSON summary here")
    ap.add_argument("--draft", action="store_true",
                    help="draft-model mode: the model drafts for itself via "
                    "a second engine (two-model speculation plumbing)")
    ap.add_argument("--draft-model", default=None, metavar="DIR",
                    help="HF dir of a REAL smaller draft (e.g. "
                    "models/xalm-draft, trained with the target's tokenizer):"
                    " genuine two-model speculation with acceptance < 100%%")
    ap.add_argument("--context", type=int, default=0,
                    help="override the window (e.g. 128 with ctx 192: the "
                    "ring wraps, exercising wrap-safe verify-then-commit)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from xalm_tpu.convert import convert as cvt
    from xalm_tpu.runtime.engine import Engine
    from xalm_tpu.runtime.spec import generate_spec
    from xalm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model_dir = str(Path(args.model).resolve())
    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    xalm = work / (Path(model_dir).name + "_i8.xalm")
    if not xalm.exists():
        rc = cvt.main(["--input", model_dir, "--output", str(xalm), "--type", "i8"])
        assert rc == 0
    eng = Engine.from_xalm(str(xalm), context=args.context)
    draft_eng = None
    if args.draft_model:
        # genuine two-model speculation: a real, smaller checkpoint drafts
        # (must share the target's tokenizer — tools/train_tiny_lm.py
        # --preset draft --tokenizer <target>/tokenizer.json)
        ddir = str(Path(args.draft_model).resolve())
        dxalm = work / (Path(ddir).name + "_i8.xalm")
        if not dxalm.exists():
            rc = cvt.main(["--input", ddir, "--output", str(dxalm), "--type", "i8"])
            assert rc == 0
        draft_eng = Engine.from_xalm(str(dxalm), context=args.context)
    elif args.draft:
        # second engine over the SAME params: separate cache/jit, no extra
        # weight memory — the self-draft plumbing check
        eng2 = Engine(eng.cfg, eng.params, eng.tokenizer)
        draft_eng = eng2

    heldout = np.load(Path(model_dir) / "heldout_ids.npy")
    stride = (len(heldout) - args.ctx - 1) // args.prompts
    segment = 16 if jax.default_backend() == "tpu" else 1

    tot_emitted = 0
    tot_calls = 0  # device calls during spec decode (verify + fallback)
    tot_prop = tot_acc = 0
    mismatches = 0
    t_spec = t_plain = 0.0
    plain_calls = 0
    for i in range(args.prompts):
        prompt = heldout[i * stride : i * stride + args.ctx].tolist()
        t0 = time.perf_counter()
        ref, _ = eng.generate(prompt, args.gen, stop_on_eos=False, segment=segment)
        t_plain += time.perf_counter() - t0
        plain_calls += -(-len(ref) // segment)
        t0 = time.perf_counter()
        out, st = generate_spec(
            eng, prompt, args.gen, k=args.k, stop_on_eos=False,
            segment=segment, draft_engine=draft_eng,
        )
        t_spec += time.perf_counter() - t0
        if out != ref:
            mismatches += 1
            d = next(j for j, (a, b) in enumerate(zip(out, ref)) if a != b)
            # tie diagnostic: compare the two candidates' logits at the
            # divergence under the plain stepped forward
            cache = eng.new_cache(1)
            ctx = prompt + ref[:d]
            logits, cache, _ = eng.prefill(ctx, cache, logits_mode="last")
            lg = np.asarray(logits, np.float32)[0]
            print(
                f"  prompt {i}: MISMATCH at gen pos {d}: spec={out[d]} "
                f"ref={ref[d]} | stepped logits: spec {lg[out[d]]:.6f} vs "
                f"ref {lg[ref[d]]:.6f} (delta {lg[out[d]] - lg[ref[d]]:+.2e})",
                flush=True,
            )
        n_verify = st.spec_proposed // args.k
        # fallback segments emitted the tokens speculation didn't
        n_fallback = -(-max(len(out) - (st.spec_accepted + n_verify), 0) // segment)
        tot_calls += n_verify + n_fallback
        tot_emitted += len(out)
        tot_prop += st.spec_proposed
        tot_acc += st.spec_accepted
        print(
            f"prompt {i}: {len(out)} tok, {n_verify} verifies, "
            f"{st.spec_accepted}/{st.spec_proposed} drafts accepted",
            flush=True,
        )

    acc = tot_acc / max(tot_prop, 1)
    reuse = tot_emitted / max(tot_calls, 1)
    summary = {
        "prompts": args.prompts,
        "gen_per_prompt": args.gen,
        "k": args.k,
        "accept_rate": round(acc, 4),
        "tokens_per_call": round(reuse, 3),
        "exact_vs_generate": mismatches == 0,
        "spec_s": round(t_spec, 2),
        "plain_s": round(t_plain, 2),
        "backend": jax.default_backend(),
        "mode": ("real-draft:" + Path(args.draft_model).name) if args.draft_model
        else ("draft-model" if args.draft else "ngram"),
        "context": args.context,
    }
    print(
        f"\nacceptance {100 * acc:.1f}% | weight-stream reuse {reuse:.2f} "
        f"tokens/device-call (projected bandwidth-bound speedup bound) | "
        f"greedy-exact: {mismatches == 0} ({mismatches} mismatches)"
    )
    print(json.dumps(summary))
    if args.json:
        Path(args.json).write_text(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
