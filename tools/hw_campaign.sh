#!/usr/bin/env bash
# Hardware campaign: run the full blocked-on-TPU checklist in order, one TPU
# process at a time, logging each step under /tmp/hw_campaign/.
#
# Usage:  bash tools/hw_campaign.sh [start_step]
# Steps (in order; pass a number to resume from there):
#   1  tunnel smoke (jax.devices)
#   2  megakernel probe at --layers 4 (fast signal: v2 vs per-layer)
#   3  headline bench (i8 decode, megakernel)        -> bench_headline.log
#   4  headline with XALM_NO_MEGAKERNEL (fallback #) -> bench_fallback.log
#   5  retrain the 40M real model (new recall mix)   -> train.log
#   6  eval_real_model -> RESULTS.md                 -> eval.log
#   7  check_tpu.py full gate                        -> check_tpu.log
#   8  serve_bench (packed prefill TTFT)             -> serve.log
#   9  bench variants (kv i8 / batch 8 / prefill+a8 / fp8 / wrap)
#
# Every step runs under `timeout`; a failed step logs and continues (the
# campaign is for gathering evidence, not gating).
set -u
LOGDIR=/tmp/hw_campaign
mkdir -p "$LOGDIR"
cd /root/repo
export XALM_COMPILE_CACHE=${XALM_COMPILE_CACHE:-/root/.cache/xalm_jax_cache}
START=${1:-1}

run_step() { # num name timeout_s cmd...
  local num=$1 name=$2 tmo=$3; shift 3
  [ "$num" -lt "$START" ] && return 0
  echo "=== step $num: $name ($(date -u +%H:%M:%S)) ==="
  ( timeout "$tmo" "$@" ) >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "--- step $num rc=$rc ($(date -u +%H:%M:%S)); tail:"
  tail -5 "$LOGDIR/$name.log"
  return 0
}

run_step 1 tunnel_smoke 120 python -c "import jax; print(jax.devices())"
# gate on the tunnel only when step 1 actually ran (resumes skip it)
if [ "$START" -le 1 ]; then
  grep -q TPU "$LOGDIR/tunnel_smoke.log" 2>/dev/null || { echo "TUNNEL DOWN — aborting"; exit 1; }
fi

run_step 2 mk_probe_l4 1800 python bench.py --layers 4 --steps 32 --warmup 4
run_step 3 bench_headline 3600 python bench.py
run_step 4 bench_fallback 3600 env XALM_NO_MEGAKERNEL=1 python bench.py

run_step 5 train 7200 python tools/train_tiny_lm.py --preset base
run_step 5 train_draft 3600 python tools/train_tiny_lm.py --preset draft \
  --tokenizer models/xalm-base/tokenizer.json
run_step 6 eval 5400 python tools/eval_real_model.py --model models/xalm-base
run_step 6 spec_probe 3600 python tools/spec_probe.py --model models/xalm-base --json /tmp/hw_campaign/spec_probe.json
run_step 6 spec_wrap 3600 python tools/spec_probe.py --model models/xalm-base --context 128 --json /tmp/hw_campaign/spec_wrap.json
run_step 6 spec_draft 3600 python tools/spec_probe.py --model models/xalm-base \
  --draft-model models/xalm-draft --json /tmp/hw_campaign/spec_draft.json
run_step 7 check_tpu 5400 python tools/check_tpu.py
run_step 8 serve 3600 python tools/serve_bench.py
run_step 8 serve_mixed 3600 python tools/serve_bench.py --sampled-frac 0.5 --logprobs-frac 0.25
run_step 8 serve_prefix 3600 python tools/serve_bench.py --shared-prefix 256

run_step 9 bench_bf16act 3600 python bench.py --no-a8-decode
run_step 9 bench_q4 3600 python bench.py --dtype q4
run_step 9 bench_q4_g128 3600 python bench.py --dtype q4 --q4-group 128
run_step 9 bench_kv_i8 3600 python bench.py --kv i8
run_step 10 bench_b8 3600 python bench.py --batch 8 --kv i8
run_step 11 bench_prefill 3600 python bench.py --prefill 2048
run_step 11 bench_prefill_a8 3600 python bench.py --prefill 2048 --a8
run_step 12 bench_fp8 3600 python bench.py --dtype f8_e4m3
run_step 13 bench_wrap 3600 python bench.py --wrap
run_step 14 bench_spec_verify 3600 python bench.py --spec-verify 7
run_step 15 bench_moe 3600 python bench.py --moe
run_step 15 bench_moe_dense 3600 env XALM_NO_MOE_GATHER=1 python bench.py --moe
run_step 15 bench_moe_q4 3600 python bench.py --moe --dtype q4
run_step 15 bench_q4_perlayer 3600 env XALM_NO_MEGAKERNEL=1 python bench.py --dtype q4
run_step 16 bench_long 7200 python bench.py --long
run_step 16 bench_long_kvi8 7200 python bench.py --kv i8 --long
run_step 16 bench_long_i8 7200 python bench.py --dtype i8 --long
run_step 17 aot_v5e 1800 python tools/aot_compile.py --topology v5e:2x4 --tp 4 --preset 7b --kv i8 --matmul pallas
run_step 18 serve_q4 3600 python tools/serve_bench.py --q4 512
echo "=== campaign done $(date -u) ==="
