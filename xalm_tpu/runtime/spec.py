"""Speculative decoding: n-gram (prompt-lookup) or draft-model proposals.

Beyond-parity feature (no reference counterpart): single-sequence decode is
HBM-bandwidth-bound — every emitted token streams the full weight set
(reference model.cpp:12-35's whole accounting model). Verifying k drafted
tokens in ONE chunked forward streams the weights once for up to k+1
emitted tokens, so on accepting text (code, quoting, retrieval, templated
output) throughput rises past the single-token bandwidth roofline while
the emitted tokens stay *greedy-exact*: every accepted token equals the
verify pass's own argmax given an all-greedy prefix, so the output is
identical to greedy decoding under the verify forward's numerics. (On
``a8_decode``/q4 engines the T=1 megakernel quantizes activations that
the T>1 verify chunk does not, so "the verify forward's numerics" is the
float-activation forward — spec output matches THAT greedy stream; the
two streams' argmaxes agree within activation-quantization noise,
RESULTS.md.)

Drafts come from prompt-lookup (Saxena 2023; PAPERS.md) — match the last
``max_n..1`` tokens of the context against earlier occurrences, no extra
weights — or from a ``draft_engine``: any smaller model sharing the
tokenizer proposes k tokens by greedy scan, and is kept in sync with the
accepted stream (classic two-model speculation, Leviathan 2023).

Ring-window interaction (two regimes, both speculation-enabled):

- pre-wrap (``pos + k + 1 <= max_seq_len``): the verify chunk blind-writes
  all k+1 positions; rejected rows are rewritten by later steps *before*
  ``kv_len`` ever exposes them.
- wrapped (``pos >= max_seq_len``): a blind write would clobber live
  oldest-window rows, so verification switches to verify-then-commit
  (models/llama._spec_verify_attention): the chunk forward attends the
  ring with the would-be-evicted slots masked per query and writes
  NOTHING; ``spec_commit`` then scatters only the accepted rows and
  rotates the sinks by the accepted count. Long generations — where
  speculation matters most — keep their draft speedup through the wrap.
- the straddle zone between them (chunk would cross the window edge)
  falls back to plain scan steps for those few tokens.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from xalm_tpu.models.config import KV_SINKS
from xalm_tpu.runtime.engine import Engine, GenerationStats

__all__ = ["ngram_propose", "generate_spec", "spec_commit"]


def ngram_propose(ids, k: int, *, max_n: int = 3, min_n: int = 1) -> list[int]:
    """Propose up to ``k`` continuation tokens for ``ids`` by suffix lookup.

    Tries the longest suffix n-gram first (``n = max_n .. min_n``); on a
    hit, returns the tokens that followed the MOST RECENT earlier
    occurrence (recency beats frequency for local repetition). Returns []
    when nothing matches or no continuation tokens exist.
    """
    a = np.asarray(ids, np.int64)
    m = a.size
    for n in range(min(max_n, m - 1), min_n - 1, -1):
        pat = a[m - n :]
        # candidate start positions: window must end before the suffix
        # itself and leave >= 1 continuation token
        span = m - n  # windows [0, span) start positions, excluding suffix
        if span <= 0:
            continue
        hit = a[:span] == pat[0]
        for j in range(1, n):
            hit &= a[j : span + j] == pat[j]
        idx = np.flatnonzero(hit)
        if idx.size == 0:
            continue
        i = int(idx[-1])  # most recent occurrence
        cont = a[i + n : i + n + k]
        if cont.size:
            return cont.astype(np.int64).tolist()
    return []


def _verify_fn(engine: Engine):
    """Jitted chunk-forward + device-side argmax (memoized per engine).

    Device argmax keeps the readback at (k+1) int32 instead of the full
    (k+1, V) logits slab (~1 MB/call through the device tunnel)."""
    vf = getattr(engine, "_spec_verify", None)
    if vf is None:
        fwd = engine._fwd_raw

        def _verify(params, toks, pos, cache):
            logits, cache = fwd(params, toks, pos, cache, None, logits_mode="all")
            return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), cache

        vf = jax.jit(_verify, donate_argnums=(3,))
        engine._spec_verify = vf
    return vf


def _verify_wrapped_fn(engine: Engine):
    """Jitted no-write verify chunk for the WRAPPED ring (memoized per
    engine): masked attention over [sinks | ring - evicted | drafts]
    (models/llama._spec_verify_attention). Returns (greedy argmax (k+1,),
    per-layer stored-form chunk KV rows). The cache is read-only here —
    spec_commit applies the accepted prefix."""
    vf = getattr(engine, "_spec_verify_wrapped_fn", None)
    if vf is None:
        from xalm_tpu.models.llama import forward

        cfg = engine.cfg

        def _v(params, toks, pos, cache):
            logits, _, rows = forward(
                params, cfg, toks, pos, cache, None,
                logits_mode="all", compute_dtype=engine.compute_dtype,
                matmul_impl=engine.matmul_impl, spec_verify=True,
            )
            return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), rows

        vf = jax.jit(_v)
        engine._spec_verify_wrapped_fn = vf
    return vf


def _commit_fn(engine: Engine):
    """Jitted accepted-prefix commit (memoized per engine): scatter chunk
    rows j <= a into their ring slots, leave rejected slots' LIVE history
    untouched, and rotate every layer's sink keys by the (a+1) emitted
    positions — one composed rotation, rounded through the cache dtype
    (requantized for int8 caches) like the per-step path's writes."""
    cf = getattr(engine, "_spec_commit_fn", None)
    if cf is None:
        from xalm_tpu.models.llama import _quantize_rows, apply_rope, rope_freqs
        from xalm_tpu.runtime.cache import KVCache

        freqs = rope_freqs(engine.cfg)

        def commit(cache, rows, kvp, a):
            ck, cv, ks, vs = cache.k, cache.v, cache.k_scale, cache.v_scale
            quant = ks is not None
            if quant:
                kr, vr, ksr, vsr = rows
            else:
                kr, vr = rows
            lcnt, b, t, kh, hd = kr.shape
            keep = jnp.arange(t, dtype=jnp.int32) <= a  # (T,)
            b_idx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
            k_idx = jnp.arange(kh, dtype=jnp.int32)[None, :, None]
            s_idx = kvp[:, None, :]  # (B, 1, T)

            def put(plane, new):  # plane (L,B,K,S,hd); new (L,B,T,K,hd)
                newt = new.transpose(0, 1, 3, 2, 4)  # (L,B,K,T,hd)
                cur = plane[:, b_idx, k_idx, s_idx]
                upd = jnp.where(keep[None, None, None, :, None], newt, cur)
                return plane.at[:, b_idx, k_idx, s_idx].set(upd, mode="drop")

            ck = put(ck, kr.astype(ck.dtype))
            cv = put(cv, vr.astype(cv.dtype))
            if quant:
                def puts(plane, new):  # plane (L,B,K,S); new (L,B,T,K)
                    newt = new.transpose(0, 1, 3, 2)
                    cur = plane[:, b_idx, k_idx, s_idx]
                    upd = jnp.where(keep[None, None, None, :], newt, cur)
                    return plane.at[:, b_idx, k_idx, s_idx].set(upd, mode="drop")

                ks = puts(ks, ksr)
                vs = puts(vs, vsr)
            # sinks rotate +(a+1); scatters above never touch slots <
            # KV_SINKS (wrapped kv_pos >= KV_SINKS), so reading them
            # post-scatter is the pre-chunk state
            sk = ck[:, :, :, :KV_SINKS, :]
            if quant:
                vals = sk.astype(jnp.float32) * ks[:, :, :, :KV_SINKS][..., None]
            else:
                vals = sk.astype(jnp.float32)
            flat = vals.transpose(1, 0, 2, 3, 4).reshape(
                b, 1, lcnt * kh * KV_SINKS, hd
            )
            rot = apply_rope(
                flat, jnp.full((b, 1), a + 1, jnp.int32), freqs
            ).reshape(b, lcnt, kh, KV_SINKS, hd).transpose(1, 0, 2, 3, 4)
            if quant:
                rq, rsc = _quantize_rows(rot)
                ck = ck.at[:, :, :, :KV_SINKS, :].set(rq)
                ks = ks.at[:, :, :, :KV_SINKS].set(rsc)
            else:
                ck = ck.at[:, :, :, :KV_SINKS, :].set(rot.astype(ck.dtype))
            return KVCache(k=ck, v=cv, k_scale=ks, v_scale=vs)

        cf = jax.jit(commit, donate_argnums=(0,))
        engine._spec_commit_fn = cf
    return cf


def spec_commit(engine: Engine, cache, rows, kvp, a):
    """Apply a wrapped verify chunk's accepted prefix (see _commit_fn)."""
    return _commit_fn(engine)(
        cache, rows, jnp.asarray(kvp, jnp.int32), jnp.int32(a)
    )


def generate_spec(
    engine: Engine,
    prompt_ids: list[int],
    max_new_tokens: int,
    *,
    k: int = 7,
    max_n: int = 3,
    on_token=None,
    stop_on_eos: bool = True,
    segment: int | None = None,
    draft_engine: Engine | None = None,
):
    """Greedy completion with speculative decoding.

    Same contract as ``Engine.generate`` (returns (tokens, stats)); stats
    additionally carries ``spec_proposed`` / ``spec_accepted`` draft
    counters. ``k``: draft length per verify chunk (one compiled program —
    keep it fixed). Drafts come from n-gram prompt lookup, or — with
    ``draft_engine`` (a smaller model sharing the tokenizer/vocab) — from
    k greedy draft-model steps; the draft's own KV cache is kept in sync
    with the accepted stream (rejected draft rows in it are approximate-
    only: they shape future PROPOSALS, never the verified output).
    Falls back to the plain scan path when no draft matches or the chunk
    would straddle the window edge; fully wrapped sequences speculate via
    verify-then-commit (see module docstring)."""
    if segment is None:
        segment = 16 if jax.default_backend() == "tpu" else 1
    stats = GenerationStats(prompt_tokens=len(prompt_ids))
    cache = engine.new_cache(1)
    t0 = time.perf_counter()
    logits, cache, pos = engine.prefill(prompt_ids, cache, logits_mode="last")
    token = int(np.asarray(jnp.argmax(logits[0], -1)))
    stats.prefill_s = time.perf_counter() - t0
    verify = _verify_fn(engine)
    s = engine.cfg.max_seq_len
    from xalm_tpu.runtime.cache import ring_indices

    d_cache = d_pos = None
    if draft_engine is not None:
        d_cache = draft_engine.new_cache(1)
        _, d_cache, d_pos = draft_engine.prefill(
            prompt_ids, d_cache, logits_mode="none"
        )

    out: list[int] = []
    t0 = time.perf_counter()

    def emit(t) -> bool:
        out.append(t)
        if on_token is not None:
            on_token(t)
        return stop_on_eos and engine.tokenizer is not None and engine.tokenizer.is_stop(t)

    def propose() -> list[int]:
        nonlocal d_cache, d_pos
        seq = prompt_ids + out
        if draft_engine is None:
            return ngram_propose(seq, k, max_n=max_n)
        # sync: positions d_pos..pos-1 were emitted while the draft was
        # idle (plain-path segments, multi-token acceptances) — hydrate
        # them before proposing from `token` at pos
        if d_pos < pos:
            toks = seq[d_pos:pos]
            _, d_cache, d_pos = draft_engine.prefill(
                toks, d_cache, logits_mode="none", start_pos=d_pos
            )
        dt, d_cache = draft_engine.decode_scan(
            np.array([token], np.int32), np.array([d_pos], np.int32), d_cache, k
        )
        d_pos += k  # the scan wrote positions pos..pos+k-1
        return np.asarray(dt)[0].tolist()

    stopped = emit(token)
    while not stopped and len(out) < max_new_tokens:
        can_blind = pos + k + 1 <= s  # chunk fits before the window edge
        can_commit = pos >= s and k + 1 <= s - KV_SINKS  # fully wrapped
        draft: list[int] = []
        if can_blind or can_commit:
            draft = propose()
        if draft:
            # pad to exactly k drafts (one compiled shape); padding tokens
            # are verified like any draft — a lucky match is still correct
            drafts = (draft + [0] * k)[:k]
            chunk = np.asarray([[token] + drafts], np.int32)
            if can_blind:
                greedy, cache = verify(
                    engine.params, jnp.asarray(chunk), np.array([pos], np.int32), cache
                )
            else:
                # wrapped: no-write verify + accepted-prefix commit
                greedy, rows = _verify_wrapped_fn(engine)(
                    engine.params, jnp.asarray(chunk),
                    np.array([pos], np.int32), cache,
                )
            greedy = np.asarray(greedy)  # (k+1,) argmax after each chunk token
            a = 0
            while a < k and drafts[a] == int(greedy[a]):
                a += 1
            if not can_blind:
                positions = pos + np.arange(k + 1, dtype=np.int64)
                _, kvp, _ = ring_indices(positions[None], s)
                cache = spec_commit(engine, cache, rows, np.asarray(kvp), a)
            stats.spec_proposed += len(draft)
            stats.spec_accepted += min(a, len(draft))
            new_toks = drafts[:a] + [int(greedy[a])]
            # the verify chunk streams the weights ONCE for a+1 emitted
            # tokens; only the KV traffic scales with the extra tokens
            stats.active_bytes += engine.active_bytes(pos) + a * (
                engine.active_bytes(pos) - engine._per_token_weight_bytes
            )
            for t in new_toks:
                if len(out) >= max_new_tokens:
                    break
                if emit(t):
                    stopped = True
                    break
            pos += a + 1
            token = new_toks[-1] if not stopped else token
        else:
            # plain path (Engine.generate's segment regime): device scan,
            # EOS checked between segments — pre-wrap overshoot is masked
            # by kv_len, post-wrap it matches generate's default behavior
            if segment > 1:
                seg, cache = engine.decode_scan(
                    np.array([token], np.int32), np.array([pos], np.int32), cache, segment
                )
                seg = np.asarray(seg)[0].tolist()
            else:
                logits, cache = engine.decode(
                    np.array([token], np.int32), np.array([pos], np.int32), cache
                )
                seg = [int(np.asarray(jnp.argmax(logits[0], -1)))]
            for i, t in enumerate(seg):
                stats.active_bytes += engine.active_bytes(pos + i)
                if len(out) >= max_new_tokens:
                    break
                if emit(t):
                    stopped = True
                    break
            pos += len(seg)
            token = seg[-1]
    stats.decode_s = time.perf_counter() - t0
    stats.generated_tokens = len(out)
    return out, stats
