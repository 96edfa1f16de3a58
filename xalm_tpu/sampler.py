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

__all__ = ["sample_argmax", "sample", "token_logprobs"]


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


def token_logprobs(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """log softmax(logits)[target] — the perplexity accumulator primitive
    (reference sampler.cpp:3-17 + main.cpp:244-254), computed stably in f32.

    logits: (..., vocab); targets: (...) int32 -> (...) f32 log-probs.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
