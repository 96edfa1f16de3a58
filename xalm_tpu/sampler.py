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

__all__ = ["sample_argmax", "token_logprobs"]


def sample_argmax(logits: jax.Array) -> jax.Array:
    """Greedy token over the last axis. (..., vocab) -> (...,) int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def token_logprobs(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """log softmax(logits)[target] — the perplexity accumulator primitive
    (reference sampler.cpp:3-17 + main.cpp:244-254), computed stably in f32.

    logits: (..., vocab); targets: (...) int32 -> (...) f32 log-probs.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
