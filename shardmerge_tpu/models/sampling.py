"""Token sampling: temperature, top-k, top-p, repetition penalty, greedy.

The reference passes sampling parameters into the model's forward and then
argmaxes anyway (REF-QUIRK shard/inference.py:176-189) — here sampling
actually works; ``greedy=True`` reproduces the reference's decoding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["sample_token"]


@partial(jax.jit, static_argnames=("top_k", "greedy"))
def sample_token(
    logits: jnp.ndarray,  # (B, V) fp32
    key,
    generated_mask: jnp.ndarray,  # (B, V) bool: tokens already produced
    temperature=1.0,
    top_k: int = 0,
    top_p=1.0,
    repetition_penalty=1.0,
    *,
    greedy: bool = False,
):
    """Sample next token ids (B,). Follows the HF ordering:
    repetition penalty -> temperature -> top-k -> top-p."""
    # repetition penalty (CTRL-style): divide positive logits, multiply negative
    penalized = jnp.where(
        logits > 0, logits / repetition_penalty, logits * repetition_penalty
    )
    logits = jnp.where(generated_mask, penalized, logits)

    if greedy:
        return jnp.argmax(logits, axis=-1)

    logits = logits / jnp.maximum(temperature, 1e-6)

    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    # top-p (nucleus): drop lowest-probability tail beyond cumulative p
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumprobs = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep the first)
    keep_sorted = cumprobs - sorted_probs < top_p
    # threshold = smallest kept logit
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    logits = jnp.where(logits < threshold, -jnp.inf, logits)

    return jax.random.categorical(key, logits, axis=-1)
