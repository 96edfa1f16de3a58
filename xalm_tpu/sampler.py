"""Samplers over the logits vector.

Reference: src/sampler.{h,cpp} — ``sample_argmax`` (greedy) and
``sample_prob`` (softmax probability of one token, the perplexity primitive).
The reference initializes its running max with ``numeric_limits<float>::min()``
(smallest *positive* float), which breaks on all-negative logits — a flagged
defect (SURVEY.md §7) not reproduced here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_argmax", "sample", "sample_rows", "split_rows", "token_logprobs"]


def sample_argmax(logits: jax.Array) -> jax.Array:
    """Greedy token over the last axis. (..., vocab) -> (...,) int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample(
    logits: jax.Array,
    key: jax.Array,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """Stochastic token over the last axis: temperature -> top-k -> top-p
    (nucleus), the standard HF filter order. (..., vocab) -> (...,) int32.

    Beyond-parity extension: the reference sampler is greedy-only
    (src/sampler.cpp). ``temperature <= 0`` degenerates to argmax;
    ``top_k == 0`` / ``top_p >= 1`` disable their filters. All arguments
    are Python statics (one compiled program per sampling config)."""
    if temperature <= 0.0:
        return sample_argmax(logits)
    l = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(l, top_k)[0][..., -1:]
        l = jnp.where(l < kth, -jnp.inf, l)
    if top_p < 1.0:
        l = jnp.where(_nucleus_keep(l, jnp.asarray(top_p)), l, -jnp.inf)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)


# candidate-set width for the sort-free nucleus filter: the top-p threshold
# is found among the top-K logits whenever they cover the requested mass
# (they essentially always do after temperature scaling); sorting 32 k
# values per row per decode step was the serving hot path's dominant
# sampling cost (docs/PERF.md mixed-load row)
_NUCLEUS_K = 256


def _nucleus_keep(ls: jax.Array, top_p: jax.Array) -> jax.Array:
    """Boolean keep-mask of the top-p (nucleus) filter, WITHOUT a full-vocab
    sort: extract the top-K candidates, compute their exact probabilities
    under the full-vocab normalizer, and find the positional-cumsum value
    threshold among them — identical semantics to the sorted filter (keep a
    token iff the mass of strictly-higher-ranked tokens is < top_p; ties at
    the threshold value all kept) whenever the top-K mass covers ``top_p``.
    When it doesn't (a near-uniform distribution whose nucleus is wider
    than K), the filter degrades to keep-all — a conservative superset of
    the true nucleus, which in that regime barely filters anyway.

    ls: (..., V) scaled logits; top_p: broadcastable to (...,).
    """
    v = ls.shape[-1]
    k = min(_NUCLEUS_K, v)
    tp = top_p[..., None]
    tv = jax.lax.top_k(ls, k)[0]  # (..., K) descending
    z = jax.scipy.special.logsumexp(ls, axis=-1, keepdims=True)
    m = jnp.exp(tv - z)  # exact masses (full-vocab normalizer)
    cum = jnp.cumsum(m, axis=-1)
    keep = (cum - m) < tp
    thresh = jnp.min(jnp.where(keep, tv, jnp.inf), axis=-1, keepdims=True)
    covered = (cum[..., -1:] >= tp) & (tp < 1.0)
    thresh = jnp.where(covered, thresh, -jnp.inf)
    return ls >= thresh


def sample_rows(
    logits: jax.Array,  # (B, V)
    keys: jax.Array,  # (B, 2) uint32 — one raw PRNG key per row
    temperature: jax.Array,  # (B,) f32; <= 0 rows are greedy
    top_p: jax.Array,  # (B,) f32; >= 1 disables the nucleus filter
    *,
    return_logprobs: bool = False,
):
    """Per-row stochastic sampling for mixed serving batches (continuous
    batching: every slot carries its own key/temperature/top_p, so a
    request's stream is deterministic under its seed regardless of which
    requests it happens to be co-batched with). Returns (B,) int32.

    ``return_logprobs=True`` additionally returns the chosen token's
    logprob and the top-5 alternatives of the RAW (pre-temperature)
    distribution — (lp (B,), top5_vals (B, 5), top5_ids (B, 5) int32) —
    the OpenAI ``logprobs`` surface, at no extra top_k cost: temperature
    scaling is order-preserving, so the nucleus filter's candidate
    extraction already yields the raw top-5 indices.
    """
    l = logits.astype(jnp.float32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    ls = l / t
    k = min(_NUCLEUS_K, l.shape[-1])
    tv, ti = jax.lax.top_k(ls, k)  # shared: nucleus candidates + raw top-5
    z = jax.scipy.special.logsumexp(ls, axis=-1, keepdims=True)
    m = jnp.exp(tv - z)
    cum = jnp.cumsum(m, axis=-1)
    tp = top_p[:, None]
    keep = (cum - m) < tp
    thresh = jnp.min(jnp.where(keep, tv, jnp.inf), axis=-1, keepdims=True)
    covered = (cum[:, -1:] >= tp) & (tp < 1.0)
    thresh = jnp.where(covered, thresh, -jnp.inf)
    lf = jnp.where(ls < thresh, -jnp.inf, ls)
    draw = jax.vmap(lambda k_, row: jax.random.categorical(k_, row))(keys, lf)
    # greedy rows: ti[:, 0] IS argmax(l) (same tie rule: lowest index)
    nxt = jnp.where(temperature > 0.0, draw.astype(jnp.int32), ti[:, 0].astype(jnp.int32))
    if not return_logprobs:
        return nxt
    z_raw = jax.scipy.special.logsumexp(l, axis=-1, keepdims=True)
    lp = jnp.take_along_axis(l, nxt[:, None], axis=-1)[:, 0] - z_raw[:, 0]
    top5_ids = ti[:, :5]
    top5 = jnp.take_along_axis(l, top5_ids, axis=-1) - z_raw
    return nxt, lp, top5, top5_ids.astype(jnp.int32)


def split_rows(keys: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split a (B, 2) uint32 raw-key batch -> (subkeys, carry), each (B, 2)."""
    both = jax.vmap(lambda k: jax.random.split(k, 2))(keys)  # (B, 2, 2)
    return both[:, 0, :], both[:, 1, :]


def token_logprobs(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """log softmax(logits)[target] — the perplexity accumulator primitive
    (reference sampler.cpp:3-17 + main.cpp:244-254), computed stably in f32.

    logits: (..., vocab); targets: (...) int32 -> (...) f32 log-probs.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
