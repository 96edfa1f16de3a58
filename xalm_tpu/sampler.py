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
        sl = jnp.flip(jnp.sort(l, axis=-1), axis=-1)  # descending
        probs = jax.nn.softmax(sl, axis=-1)
        # keep a token iff the mass of strictly-higher-ranked tokens is
        # still < top_p (the top-1 token is always kept)
        keep = (jnp.cumsum(probs, axis=-1) - probs) < top_p
        thresh = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1, keepdims=True)
        l = jnp.where(l < thresh, -jnp.inf, l)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)


def sample_rows(
    logits: jax.Array,  # (B, V)
    keys: jax.Array,  # (B, 2) uint32 — one raw PRNG key per row
    temperature: jax.Array,  # (B,) f32; <= 0 rows are greedy
    top_p: jax.Array,  # (B,) f32; >= 1 disables the nucleus filter
) -> jax.Array:
    """Per-row stochastic sampling for mixed serving batches (continuous
    batching: every slot carries its own key/temperature/top_p, so a
    request's stream is deterministic under its seed regardless of which
    requests it happens to be co-batched with). Returns (B,) int32."""
    l = logits.astype(jnp.float32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    ls = l / t
    sl = jnp.flip(jnp.sort(ls, axis=-1), axis=-1)  # descending
    probs = jax.nn.softmax(sl, axis=-1)
    keep = (jnp.cumsum(probs, axis=-1) - probs) < top_p[:, None]
    thresh = jnp.min(jnp.where(keep, sl, jnp.inf), axis=-1, keepdims=True)
    lf = jnp.where(ls < thresh, -jnp.inf, ls)
    draw = jax.vmap(lambda k, row: jax.random.categorical(k, row))(keys, lf)
    return jnp.where(
        temperature > 0.0, draw.astype(jnp.int32), sample_argmax(l)
    )


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
