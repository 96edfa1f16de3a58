"""N-gram (prompt-lookup) speculative decoding.

Beyond-parity feature (no reference counterpart): single-sequence decode is
HBM-bandwidth-bound — every emitted token streams the full weight set
(reference model.cpp:12-35's whole accounting model). Verifying k drafted
tokens in ONE chunked forward streams the weights once for up to k+1
emitted tokens, so on accepting text (code, quoting, retrieval, templated
output) throughput rises past the single-token bandwidth roofline while
the emitted tokens stay *greedy-exact*: every accepted token equals the
verify pass's own argmax given an all-greedy prefix, so the output is
identical to greedy decoding under the chunk forward's numerics.

Drafts come from prompt-lookup (Saxena 2023; PAPERS.md): match the last
``max_n..1`` tokens of the context against its earlier occurrences and
propose the continuation of the most recent match — no draft model, no
extra weights, pure host-side numpy on ids already in hand.

Ring-window interaction: a verify chunk blind-writes all k+1 positions;
rejected rows are rewritten by later steps *before* ``kv_len`` ever
exposes them — sound while the chunk stays inside the un-wrapped region.
Once the ring would wrap, a rejected draft's write would clobber a still
-live oldest-window row instead, so speculation gates itself off at
``pos + k + 1 > max_seq_len`` and generation continues on the plain
scan path (identical to Engine.generate's regime there).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from xalm_tpu.runtime.engine import Engine, GenerationStats

__all__ = ["ngram_propose", "generate_spec"]


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
):
    """Greedy completion with n-gram speculative decoding.

    Same contract as ``Engine.generate`` (returns (tokens, stats)); stats
    additionally carries ``spec_proposed`` / ``spec_accepted`` draft
    counters. ``k``: draft length per verify chunk (one compiled program —
    keep it fixed). Falls back to the plain scan path whenever no draft
    matches or the ring is about to wrap.
    """
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

    out: list[int] = []
    t0 = time.perf_counter()

    def emit(t) -> bool:
        out.append(t)
        if on_token is not None:
            on_token(t)
        return stop_on_eos and engine.tokenizer is not None and engine.tokenizer.is_stop(t)

    stopped = emit(token)
    while not stopped and len(out) < max_new_tokens:
        draft: list[int] = []
        if pos + k + 1 <= s:  # a verify chunk must never wrap the ring
            draft = ngram_propose(prompt_ids + out, k, max_n=max_n)
        if draft:
            # pad to exactly k drafts (one compiled shape); padding tokens
            # are verified like any draft — a lucky match is still correct
            drafts = (draft + [0] * k)[:k]
            chunk = np.asarray([[token] + drafts], np.int32)
            greedy, cache = verify(
                engine.params, jnp.asarray(chunk), np.array([pos], np.int32), cache
            )
            greedy = np.asarray(greedy)  # (k+1,) argmax after each chunk token
            a = 0
            while a < k and drafts[a] == int(greedy[a]):
                a += 1
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
