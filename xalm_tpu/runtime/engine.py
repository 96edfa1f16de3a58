"""Inference engine: load a .xalm model, jit the step functions, run workloads.

Replaces the reference's Model/InferenceState pair (reference src/model.h,
src/infer.cpp:604-638) with functional jitted steps:

- ``prefill``: whole prompt chunks in one batched MXU pass per chunk
  (the reference hydrates one token at a time, main.cpp:93-101 — on TPU that
  wastes the systolic array; chunking is the idiomatic replacement).
- ``decode``: one token per sequence per call, KV cache donated so XLA
  updates it in place in HBM.
- ``generate`` / ``perplexity``: the run_completion / run_perplexity
  workloads (reference main.cpp:44-128, 198-268) including throughput and
  achieved-bandwidth accounting against the active-bytes model
  (reference model.cpp:12-35).

Chunk contract (see models/llama.py): T>1 calls never wrap the KV ring; the
engine switches to T=1 stepping once pos reaches the window.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from xalm_tpu.io import XalmFile
from xalm_tpu.models.config import ModelConfig
from xalm_tpu.models.llama import forward
from xalm_tpu.models.params import ModelParams, load_params
from xalm_tpu.runtime.cache import KVCache
from xalm_tpu.sampler import sample_argmax, token_logprobs
from xalm_tpu.tokenizer import Tokenizer

__all__ = ["Engine", "GenerationStats"]

_CHUNK_BUCKETS = (16, 32, 64, 128, 256, 512)


def _bucket(n: int) -> int:
    for b in _CHUNK_BUCKETS:
        if n <= b:
            return b
    return _CHUNK_BUCKETS[-1]


@dataclasses.dataclass
class GenerationStats:
    prompt_tokens: int = 0
    generated_tokens: int = 0
    prefill_s: float = 0.0
    decode_s: float = 0.0
    active_bytes: int = 0  # cumulative bytes touched during decode
    spec_proposed: int = 0  # draft tokens offered to verify (runtime/spec.py)
    spec_accepted: int = 0  # draft tokens accepted

    @property
    def tok_per_s(self) -> float:
        return self.generated_tokens / self.decode_s if self.decode_s > 0 else 0.0

    @property
    def bandwidth_gb_s(self) -> float:
        return self.active_bytes / self.decode_s / 1e9 if self.decode_s > 0 else 0.0


class Engine:
    # jitted fast-path helpers built by Engine.__init__ (ShardedEngine builds
    # shard_map equivalents); a subclass that leaves these None falls back to
    # the portable per-chunk / per-token paths in prefill()/perplexity()
    _prefill_chunks = None
    _ppl_scan = None
    _sample_scan = None  # stochastic decode scan (both engines build one)
    _sample_scan_rows = None  # per-row keyed variant (continuous batching)
    chat_template = None  # jinja template carried from the container, if any

    def __init__(
        self,
        cfg: ModelConfig,
        params: ModelParams,
        tokenizer: Tokenizer | None = None,
        *,
        kv_dtype="auto",
        compute_dtype="auto",
        matmul_impl: str = "auto",
        a8_prefill: bool = False,
        a8_decode: bool = False,
        fused_step: bool | str = "auto",
        wcls_i8: bool = False,
    ):
        if wcls_i8:
            from xalm_tpu.models.params import recode_wcls_i8

            params = recode_wcls_i8(params)
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        if kv_dtype == "auto":
            # Mosaic has no f16: the fused attention kernel needs a bf16
            # cache on TPU. CPU/golden paths keep the reference's f16.
            kv_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float16
        self.kv_dtype = kv_dtype
        if compute_dtype == "auto":
            # bf16 matmul inputs on TPU: 4x the MXU peak for prefill, and the
            # decode Pallas kernels already compute in bf16 internally.
            # Softmax, residuals, norms, and accumulation stay f32 either way.
            # CPU/golden paths keep full f32.
            compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype
        if matmul_impl == "auto":
            # fused pallas dequant+matmul on TPU; XLA dots elsewhere (the
            # forward itself falls back to xla for large-M prefill chunks)
            matmul_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.matmul_impl = matmul_impl

        self.fused_step = fused_step

        self.a8_decode = a8_decode

        def _fwd(params, tokens, pos, cache, valid, *, logits_mode):
            return forward(
                params,
                cfg,
                tokens,
                pos,
                cache,
                valid,
                logits_mode=logits_mode,
                compute_dtype=compute_dtype,
                matmul_impl=matmul_impl,
                a8_prefill=a8_prefill,
                a8_decode=a8_decode,
                fused_step=fused_step,
            )

        # cache (arg 3) donated: decode updates it in place in HBM.
        self._fwd = jax.jit(_fwd, static_argnames=("logits_mode",), donate_argnums=(3,))
        # unjitted forward: runtime/spec.py composes device-side argmax on top
        self._fwd_raw = _fwd

        def _decode_scan(params, token0, pos0, cache, n_steps: int, valid):
            """n_steps of greedy decode entirely on device — one dispatch for
            the whole generation (the reference's per-token host loop costs
            nothing on CPU but would gate TPU tok/s on dispatch latency,
            SURVEY.md §7 'hard parts').

            ``valid``: (B,) bool or None. Inactive rows (a serving slot that
            is free or mid-prefill) must not write: their junk decode would
            otherwise advance through the ring and — once past the window —
            clobber live slots and re-rotate sinks."""

            def step(carry, _):
                # the WHOLE cache pytree rides the carry (scale planes
                # included for quantized caches — dropping them silently
                # corrupts int8 decode)
                token, p, c = carry
                nxt, c = forward(
                    params,
                    cfg,
                    token[:, None],
                    p,
                    c,
                    None if valid is None else valid[:, None],
                    # greedy token mode: with the full megakernel folds the
                    # argmax happens in-kernel; other paths argmax in XLA
                    logits_mode="token",
                    compute_dtype=compute_dtype,
                    matmul_impl=self.matmul_impl,
                    a8_decode=a8_decode,
                    fused_step=fused_step,
                )
                return (nxt, p + 1, c), nxt

            (tok, p, cache), tokens = jax.lax.scan(
                step, (token0, pos0, cache), None, length=n_steps
            )
            return tokens.T, cache  # (B, n_steps)

        self._decode_scan = jax.jit(
            _decode_scan, static_argnames=("n_steps",), donate_argnums=(3,)
        )

        def _sample_scan(
            params, token0, pos0, cache, key0,
            n_steps: int, temperature: float, top_k: int, top_p: float, valid
        ):
            """Stochastic decode scan (beyond-parity: the reference samples
            greedily only). Sampling params are static — one compiled
            program per sampling config."""
            from xalm_tpu.sampler import sample

            def step(carry, _):
                token, p, c, key = carry
                logits, c = forward(
                    params, cfg, token[:, None], p, c,
                    None if valid is None else valid[:, None],
                    logits_mode="last",
                    compute_dtype=compute_dtype,
                    matmul_impl=self.matmul_impl,
                    a8_decode=a8_decode,
                    fused_step=fused_step,
                )
                key, sub = jax.random.split(key)
                nxt = sample(
                    logits, sub, temperature=temperature, top_k=top_k, top_p=top_p
                )
                return (nxt, p + 1, c, key), nxt

            (tok, p, cache, _), tokens = jax.lax.scan(
                step, (token0, pos0, cache, key0), None, length=n_steps
            )
            return tokens.T, cache  # (B, n_steps)

        self._sample_scan = jax.jit(
            _sample_scan,
            static_argnames=("n_steps", "temperature", "top_k", "top_p"),
            donate_argnums=(3,),
        )

        def _sample_scan_rows(
            params, token0, pos0, cache, keys0, temps, top_ps, n_steps: int,
            valid, want_lp: bool = False,
        ):
            """Per-row sampled decode scan for mixed serving batches
            (serve/batching.py): each row carries its own PRNG key,
            temperature, and top_p as traced vectors — greedy rows ride
            temperature 0. Also emits per-token logprobs of the raw
            (pre-temperature) distribution plus the top-5 alternatives
            (the OpenAI ``logprobs`` surface). Returns
            (tokens (B, n), lps (B, n), top5 lps (B, n, 5),
            top5 ids (B, n, 5), final keys, cache)."""
            from xalm_tpu.sampler import sample_rows, split_rows

            def step(carry, _):
                token, p, c, keys = carry
                logits, c = forward(
                    params, cfg, token[:, None], p, c,
                    None if valid is None else valid[:, None],
                    logits_mode="last",
                    compute_dtype=compute_dtype,
                    matmul_impl=self.matmul_impl,
                    a8_decode=a8_decode,
                    fused_step=fused_step,
                )
                subs, newk = split_rows(keys)
                # only active rows consume randomness: a slot mid-prefill
                # must reach its first sampled token with the key state its
                # seed implies, independent of co-batched ticks
                keys = newk if valid is None else jnp.where(valid[:, None], newk, keys)
                if not want_lp:
                    # no logprobs requested anywhere in the batch: skip the
                    # logprob gathers and the extra outputs
                    nxt = sample_rows(logits, subs, temps, top_ps)
                    return (nxt, p + 1, c, keys), nxt
                # fused epilogue: the sampler's shared top-K extraction
                # yields the raw top-5 + chosen-token logprobs directly —
                # no separate vocab-wide log_softmax/top_k per step
                nxt, lp, topv, topi = sample_rows(
                    logits, subs, temps, top_ps, return_logprobs=True
                )
                return (nxt, p + 1, c, keys), (nxt, lp, topv, topi)

            (tok, p, cache, keys), outs = jax.lax.scan(
                step, (token0, pos0, cache, keys0), None, length=n_steps
            )
            if not want_lp:
                return outs.T, keys, cache
            tokens, lps, topv, topi = outs
            return (
                tokens.T, lps.T, topv.swapaxes(0, 1), topi.swapaxes(0, 1),
                keys, cache,
            )

        self._sample_scan_rows = jax.jit(
            _sample_scan_rows,
            static_argnames=("n_steps", "want_lp"),
            donate_argnums=(3,),
        )

        def _prefill_chunks(params, tokens_c, pos0, cache):
            """Hydrate C full chunks in ONE dispatch: a lax.scan over chunk
            blocks (C, B, T). Dispatch latency is per-call, not per-chunk —
            measured ~10 ms/call through this host's device tunnel, which was
            ~16% of a 2048-token prefill as 4 separate calls."""

            def body(carry, toks):
                p, c = carry
                _, c = forward(
                    params,
                    cfg,
                    toks,
                    p,
                    c,
                    None,
                    logits_mode="none",
                    compute_dtype=compute_dtype,
                    matmul_impl=self.matmul_impl,
                    a8_prefill=a8_prefill,
                )
                return (p + toks.shape[-1], c), None

            (_, cache), _ = jax.lax.scan(body, (pos0, cache), tokens_c)
            return cache

        self._prefill_chunks = jax.jit(_prefill_chunks, donate_argnums=(3,))

        def _ppl_scan(params, toks, tgts, pos0, cache):
            """Teacher-forced log-prob scan for the wrapped perplexity tail:
            feed toks[:, i] at pos0+i, accumulate log p(tgts[:, i]) — one
            dispatch per segment instead of per token (the reference's
            per-token loop, main.cpp:198-268, is free on CPU; on TPU it
            costs a dispatch round-trip per token)."""

            def step(carry, inp):
                p, c = carry
                t, tgt = inp
                logits, c = forward(
                    params,
                    cfg,
                    t[:, None],
                    p,
                    c,
                    logits_mode="last",
                    compute_dtype=compute_dtype,
                    matmul_impl=self.matmul_impl,
                    a8_decode=a8_decode,
                    fused_step=fused_step,
                )
                lp = token_logprobs(logits, tgt)
                return (p + 1, c), lp

            (_, cache), lps = jax.lax.scan(
                step, (pos0, cache), (toks.T, tgts.T)
            )
            return lps.T, cache  # (B, K)

        self._ppl_scan = jax.jit(_ppl_scan, donate_argnums=(4,))

    # ------------------------------------------------------------------ load

    @classmethod
    def from_xalm(
        cls,
        path: str,
        *,
        context: int = 0,
        kv_dtype="auto",
        compute_dtype="auto",
        matmul_impl: str = "auto",
        fp8_mode: str = "auto",
        a8_prefill: bool = False,
        a8_decode: bool = False,
        q4_group: int = 0,
        fused_step: bool | str = "auto",
        wcls_i8: bool = False,
        progress: bool = True,
    ) -> "Engine":
        from xalm_tpu.models.params import load_units
        from xalm_tpu.obs.console import ProgressBar

        xf = XalmFile(path)
        cfg = ModelConfig.from_metadata(xf.config, context)
        xf.prefault()  # parallel cold-cache readahead (native/loader.cpp)
        if progress:
            # layer-loading progress with wall/user/sys summary
            # (reference model.cpp:87-108 / console.h:86-238)
            with ProgressBar("loading weights", total=load_units(cfg)) as bar:
                params = load_params(xf, cfg, fp8_mode=fp8_mode, progress=bar.advance)
        else:
            params = load_params(xf, cfg, fp8_mode=fp8_mode)
        tokenizer = Tokenizer.from_xalm(xf) if "tokenizer.tokens" in xf else None
        chat_template = xf.config.get("chat_template")
        xf.close()
        if q4_group:
            # load-time body recode to packed 4-bit (same opt-in shape as
            # wcls_i8): halves the decode weight stream; requires int8
            # activations in the megakernel, so a8_decode is implied
            from xalm_tpu.models.params import recode_params_q4

            params = recode_params_q4(params, group=q4_group)
            a8_decode = True
        eng = cls(
            cfg,
            params,
            tokenizer,
            kv_dtype=kv_dtype,
            compute_dtype=compute_dtype,
            matmul_impl=matmul_impl,
            a8_prefill=a8_prefill,
            a8_decode=a8_decode,
            fused_step=fused_step,
            wcls_i8=wcls_i8,
        )
        eng.chat_template = chat_template
        return eng

    # ----------------------------------------------------------------- steps

    def new_cache(self, batch: int = 1) -> KVCache:
        return KVCache.init(self.cfg, batch, self.kv_dtype)

    def decode_path(self, batch: int = 1) -> str:
        """Which implementation a (batch, T=1) decode step runs on this
        backend: 'megakernel' (whole-step fused pallas_call), 'perlayer'
        (per-op pallas kernels), or 'xla'. Shape-only — mirrors the gates
        in models/llama.forward — so fallbacks are visible up front in
        bench/harness/serving stats instead of silently costing tok/s."""
        if self.matmul_impl != "pallas":
            return "xla"
        from xalm_tpu.ops.fused_decode import fused_step_supported

        shape = KVCache.plane_shape(self.cfg, batch)
        quant = jnp.dtype(self.kv_dtype) == jnp.dtype(jnp.int8)
        k = jax.ShapeDtypeStruct(shape, self.kv_dtype)
        ks = jax.ShapeDtypeStruct(shape[:-1], jnp.float32) if quant else None
        if self.fused_step == "auto":
            from xalm_tpu.ops.fused_decode import measured_fused_preferred

            fused_req = measured_fused_preferred(batch, quant)
        else:
            fused_req = bool(self.fused_step)
        if fused_req and fused_step_supported(
            self.cfg, self.params, k, batch, 1, ks, a8=self.a8_decode
        ):
            return "megakernel"
        if self.params.layers.wqkv.q4group and (
            batch >= 256 or not self.a8_decode
        ):
            # packed 4-bit streams through the per-layer kernel only under
            # the a8 opt-in (its dots are s8 x s8) and below the decode M
            # cap; otherwise it dequantizes through XLA
            return "xla"
        return "perlayer"

    def step(self, tokens, pos, cache: KVCache, valid=None, logits_mode="last"):
        """Raw jitted forward on device arrays. tokens (B,T), pos (B,)."""
        tokens = jnp.asarray(tokens, jnp.int32)
        pos = jnp.asarray(pos, jnp.int32)
        return self._fwd(self.params, tokens, pos, cache, valid, logits_mode=logits_mode)

    def decode_scan(self, tokens, pos, cache: KVCache, n_steps: int, valid=None):
        """Greedy-decode n_steps on device. tokens (B,), pos (B,) ->
        (generated (B, n_steps) int32, cache). ``valid``: (B,) bool mask —
        False rows neither write the cache nor rotate sinks."""
        return self._decode_scan(
            self.params,
            jnp.asarray(tokens, jnp.int32),
            jnp.asarray(pos, jnp.int32),
            cache,
            n_steps,
            None if valid is None else jnp.asarray(valid, bool),
        )

    def decode(self, tokens, pos, cache: KVCache):
        """One decode step: tokens (B,), pos (B,) -> logits (B, vocab)."""
        tokens = jnp.asarray(tokens, jnp.int32)[:, None]
        return self.step(tokens, pos, cache, logits_mode="last")

    def prefill(self, token_ids: list[int], cache: KVCache, logits_mode="last", start_pos: int = 0):
        """Feed a single prompt (batch 1) through chunked prefill.

        Returns (logits-for-last-token | per-token logits list, cache, pos).
        Uses bucketed chunk shapes (bounded compile count) with masked
        padding; switches to T=1 stepping once the ring would wrap.
        ``start_pos`` continues an existing sequence (session resume).
        """
        s = self.cfg.max_seq_len
        n = start_pos + len(token_ids)
        pos = start_pos
        logits = None
        all_logits = []
        # leading full chunks in one scanned dispatch ("none" logits); the
        # tail (and "all" mode) goes through the per-chunk loop below
        ch = _CHUNK_BUCKETS[-1]
        if logits_mode != "all" and self._prefill_chunks is not None:
            c_full = min((n - pos - 1) // ch, max((s - pos) // ch, 0))
            if c_full >= 2:
                toks = np.asarray(
                    token_ids[: c_full * ch], np.int32
                ).reshape(c_full, 1, ch)
                cache = self._prefill_chunks(
                    self.params, jnp.asarray(toks), np.array([pos], np.int32), cache
                )
                pos += c_full * ch
        while pos < n:
            remaining = n - pos
            if pos + 1 > s - 1 and remaining > 1:
                t = 1  # ring about to wrap: per-token stepping from here on
            else:
                t = min(remaining, _CHUNK_BUCKETS[-1], max(s - pos, 1))
            bucket = _bucket(t) if t > 1 else 1
            # never let a (padded) bucket cross the ring boundary
            if t > 1 and pos + bucket > s:
                bucket = t
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :t] = token_ids[pos - start_pos : pos - start_pos + t]
            valid = np.zeros((1, bucket), bool)
            valid[0, :t] = True
            is_last = pos + t >= n
            if logits_mode == "all":
                mode = "all"
            elif is_last and logits_mode == "last":
                # padded chunks compute all positions so the last *valid*
                # token's logits can be selected
                mode = "last" if t == bucket else "all"
            else:
                mode = "none"
            # full chunks skip the valid mask entirely: the write path can
            # then use blind in-place slice updates (no read-modify-write)
            varg = jnp.asarray(valid) if t != bucket else None
            out, cache = self.step(
                padded,
                np.array([pos], np.int32),
                cache,
                varg,
                logits_mode=mode,
            )
            if logits_mode == "all":
                all_logits.append(np.asarray(out)[0, :t])
            elif is_last and logits_mode == "last":
                logits = out if mode == "last" else out[:, t - 1]
            pos += t
        if logits_mode == "all":
            return np.concatenate(all_logits, axis=0), cache, pos
        return logits, cache, pos

    # ------------------------------------------------------------- workloads

    def generate(
        self,
        prompt_ids: list[int],
        max_new_tokens: int,
        *,
        on_token=None,
        stop_on_eos: bool = True,
        segment: int | None = None,
        resume=None,
        return_session: bool = False,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int | None = None,
    ):
        """Greedy completion (reference run_completion, main.cpp:44-128).

        ``temperature > 0`` switches to stochastic decoding (temperature ->
        top-k -> top-p filtering, sampler.sample; beyond-parity — the
        reference is greedy-only). ``seed`` makes it reproducible.

        On TPU, tokens are generated in device-side scan segments (default
        16) so per-call dispatch latency amortizes; EOS is checked between
        segments (greedy output is identical to per-token stepping).

        ``resume``: a runtime.session.Session to continue (its pending last
        token is re-hydrated ahead of ``prompt_ids``). With
        ``return_session=True`` returns (out, stats, Session) for saving.
        """
        if segment is None:
            # 16 balances dispatch amortization (~10 ms/call through the
            # device tunnel ~= 6% at 94 tok/s) against interactive streaming
            # burstiness: on_token sees ~170 ms batches instead of ~350 ms at
            # the old 32 (the reference prints per token, main.cpp:105-115)
            segment = 16 if jax.default_backend() == "tpu" else 1
        stats = GenerationStats(prompt_tokens=len(prompt_ids))
        if resume is None:
            cache = self.new_cache(1)
            start, history = 0, []
            new_tokens = list(prompt_ids)
        else:
            cache = resume.cache
            start = int(np.asarray(resume.pos)[0])
            history = list(resume.tokens[0])
            new_tokens = list(prompt_ids)
            # the saved pending token's KV was never written — hydrate it
            # ahead of the new prompt (see Session docstring)
            prompt_ids = [history[-1]] + new_tokens

        sampling = temperature > 0.0
        if sampling and self._sample_scan is None:
            raise NotImplementedError(
                "stochastic sampling is not wired into this engine subclass; "
                "use temperature=0 (greedy)"
            )
        key = jax.random.PRNGKey(0 if seed is None else seed) if sampling else None

        t0 = time.perf_counter()
        logits, cache, pos = self.prefill(prompt_ids, cache, logits_mode="last", start_pos=start)
        if sampling:
            from xalm_tpu.sampler import sample

            key, sub = jax.random.split(key)
            token = int(np.asarray(
                sample(logits, sub, temperature=temperature, top_k=top_k, top_p=top_p)
            )[0])
        else:
            token = int(np.asarray(sample_argmax(logits))[0])
        stats.prefill_s = time.perf_counter() - t0

        out: list[int] = []
        t0 = time.perf_counter()

        def emit(t) -> bool:
            out.append(t)
            if on_token is not None:
                on_token(t)
            return stop_on_eos and self.tokenizer is not None and self.tokenizer.is_stop(t)

        stopped = emit(token)
        while not stopped and len(out) < max_new_tokens:
            # Session correctness: a segment scan overshoots past EOS/limit,
            # writing junk KV. Pre-wrap that's harmless (resume overwrites
            # those rows before kv_len reaches them), but once the ring wraps
            # the overshoot clobbers the oldest *live* window rows. Clamping
            # the scan to the remaining budget removes limit-overshoot
            # entirely; only EOS overshoot remains, so drop to per-token
            # stepping near/after the wrap only when EOS can stop us early.
            seg_n = segment
            if return_session:
                # clamp to the remaining budget (each distinct n_steps is a
                # separate compiled program — only pay that when saving)
                seg_n = min(segment, max_new_tokens - len(out))
                if (
                    stop_on_eos
                    and self.tokenizer is not None  # emit can't stop otherwise
                    and pos + seg_n > self.cfg.max_seq_len
                ):
                    seg_n = 1
            if sampling:
                key, sub = jax.random.split(key)
                seg, cache = self._sample_scan(
                    self.params, np.array([token], np.int32),
                    np.array([pos], np.int32), cache, sub,
                    n_steps=seg_n, temperature=temperature, top_k=top_k,
                    top_p=top_p, valid=None,
                )
                seg = np.asarray(seg)[0].tolist()
            elif seg_n > 1:
                seg, cache = self.decode_scan(
                    np.array([token], np.int32), np.array([pos], np.int32), cache, seg_n
                )
                seg = np.asarray(seg)[0].tolist()
            else:
                logits, cache = self.decode(
                    np.array([token], np.int32), np.array([pos], np.int32), cache
                )
                seg = [int(np.asarray(sample_argmax(logits))[0])]
            for i, t in enumerate(seg):
                stats.active_bytes += self.active_bytes(pos + i)
                if len(out) >= max_new_tokens:
                    break
                if emit(t):
                    stopped = True
                    break
            pos += len(seg)
            token = seg[-1]
        stats.decode_s = time.perf_counter() - t0
        stats.generated_tokens = len(out)
        if return_session:
            from xalm_tpu.runtime.session import Session

            # position of the pending (emitted, not yet cache-written) token;
            # everything past it in the ring is masked by kv_len on resume
            pend = start + len(prompt_ids) + len(out) - 1
            sess = Session(
                cache=cache,
                pos=np.array([pend], np.int32),
                tokens=[history + new_tokens + out],
            )
            return out, stats, sess
        return out, stats

    def perplexity(self, token_ids: list[int]) -> tuple[float, float, int]:
        """(ppl, stderr, n) over a prompt (reference run_perplexity,
        main.cpp:198-268): forward every token, accumulate log p of the next.
        """
        n = len(token_ids)
        if n < 2:
            raise ValueError("perplexity needs at least 2 tokens")
        cache = self.new_cache(1)
        s = self.cfg.max_seq_len

        sum_lp = 0.0
        sum_lp2 = 0.0
        count = 0
        pos = 0
        # fast path: chunked "all"-logits prefill while inside the window
        head = min(n, s)
        logits_all, cache, pos = self.prefill(token_ids[:head], cache, logits_mode="all")
        # position head-1's logits predict token_ids[head] (when it exists):
        # count it here so head + tail covers all n-1 predictions
        targets = np.asarray(token_ids[1 : min(head + 1, n)], np.int32)
        lps = np.asarray(
            token_logprobs(jnp.asarray(logits_all[: len(targets)]), jnp.asarray(targets))
        )
        sum_lp += float(lps.sum())
        sum_lp2 += float((lps.astype(np.float64) ** 2).sum())
        count += len(lps)
        # wrapped tail (ring + sink active): teacher-forced device scan in
        # bucketed segments — the last (partial) segment pads by repeating
        # its final token (those positions are never counted and the junk
        # KV is past every counted query)
        while pos < n - 1 and self._ppl_scan is None:
            # engine subclasses without the scan (see class attrs):
            # per-token stepping
            logits, cache = self.decode(
                np.array([token_ids[pos]], np.int32), np.array([pos], np.int32), cache
            )
            lp = float(np.asarray(token_logprobs(logits, jnp.asarray([token_ids[pos + 1]])))[0])
            sum_lp += lp
            sum_lp2 += lp * lp
            count += 1
            pos += 1
        while pos < n - 1:
            k = min(n - 1 - pos, _CHUNK_BUCKETS[-1])
            bucket = _bucket(k)
            toks = np.full((1, bucket), token_ids[n - 1], np.int32)
            tgts = np.full((1, bucket), token_ids[n - 1], np.int32)
            toks[0, :k] = token_ids[pos : pos + k]
            tgts[0, :k] = token_ids[pos + 1 : pos + 1 + k]
            lps_seg, cache = self._ppl_scan(
                self.params, jnp.asarray(toks), jnp.asarray(tgts),
                np.array([pos], np.int32), cache,
            )
            lps_seg = np.asarray(lps_seg)[0, :k].astype(np.float64)
            sum_lp += float(lps_seg.sum())
            sum_lp2 += float((lps_seg**2).sum())
            count += k
            pos += k

        ppl = math.exp(-sum_lp / count)
        err = ppl * math.sqrt((sum_lp2 - sum_lp * sum_lp / count) / count / count)
        return ppl, err, count

    # ----------------------------------------------------------- accounting

    @functools.cached_property
    def _per_token_weight_bytes(self) -> int:
        cfg = self.cfg
        p = self.params

        def qbytes(qw):
            b = qw.values.nbytes
            if qw.scale is not None:
                b += qw.scale.nbytes
            return b

        lw = p.layers
        mats = [w for w in (lw.wqkv, lw.wo, lw.w13, lw.w2) if w is not None]
        weight_bytes = sum(qbytes(w) for w in mats)
        if lw.w13e is not None:
            expert_bytes = qbytes(lw.w13e) + qbytes(lw.w2e)
            from xalm_tpu.ops.pallas_matmul import supported_weight_dtype

            # mirror the forward's gathered-decode gate (models/llama.py):
            # plain dtypes need a pallas-supported dtype; q4 packed experts
            # additionally need the a8_decode opt-in (their dots are s8xs8)
            # — otherwise decode runs dense-masked and streams all E experts
            gathered_ok = (
                self.a8_decode
                if lw.w13e.q4group
                else supported_weight_dtype(lw.w13e.values.dtype)
            )
            if (
                self.matmul_impl == "pallas"
                and gathered_ok
                and not os.environ.get("XALM_NO_MOE_GATHER")
            ):
                # gathered sparse decode (models/llama.py): only the top-k
                # experts' weights stream per token
                expert_bytes = (
                    expert_bytes * cfg.n_experts_active // max(cfg.n_experts, 1)
                )
            weight_bytes += expert_bytes
        if lw.wgate is not None:
            weight_bytes += lw.wgate.nbytes
        weight_bytes += lw.attn_norm.nbytes + lw.mlp_norm.nbytes
        # one embedding row read
        weight_bytes += qbytes(p.embed) // cfg.vocab_size
        weight_bytes += p.out_norm.nbytes + qbytes(p.wcls)
        return int(weight_bytes)

    def active_bytes(self, pos: int) -> int:
        """Bytes touched per decoded token (reference Model::active_bytes,
        model.cpp:12-35): all live weight bytes + KV cache rows up to kv_len +
        the KV write, plus — for the quantized cache — the f32 per-row scale
        planes read alongside the int8 codes. The roofline denominator for
        GB/s reporting."""
        cfg = self.cfg
        kv_len = min(pos + 1, cfg.max_seq_len)
        kv_elt = jnp.dtype(self.kv_dtype).itemsize
        kv_read = 2 * cfg.n_layers * kv_len * cfg.kv_dim * kv_elt
        kv_write = 2 * cfg.n_layers * cfg.kv_dim * kv_elt
        total = self._per_token_weight_bytes + kv_read + kv_write
        if jnp.dtype(self.kv_dtype) == jnp.dtype(jnp.int8):
            # (L, B, K, S) f32 scale planes: one scale per cached row read,
            # one written, for K and V
            n_kv = cfg.kv_dim // cfg.head_dim
            total += 2 * cfg.n_layers * n_kv * (kv_len + 1) * 4
        return total
