"""Token sampling for decode loops: temperature / top-k / top-p (nucleus).

The reference ships only its custom greedy generate
(modeling_flash_t5.py:648-690); sampling is part of this framework's serving
surface. Everything here is jit-friendly (static shapes, no data-dependent
control flow): masks are built with top_k/sort + where, and the draw is
`jax.random.categorical` over the masked logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_MASKED = -1e30


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits per row, mask the rest. logits (..., V)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _MASKED, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest prefix of the probability-sorted
    vocabulary whose cumulative mass reaches p (the top token always kept)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep positions whose PRECEDING mass is < p (so the boundary token stays)
    keep_sorted = (cum - probs) < p
    n_keep = jnp.maximum(jnp.sum(keep_sorted, axis=-1, keepdims=True), 1)
    threshold = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits < threshold, _MASKED, logits)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Draw one token id per row of `logits` (..., V) -> (...) int32.

    temperature <= 0 means greedy (argmax); top_k=0 and top_p=1 disable the
    respective filters.
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    scaled = apply_top_k(scaled, top_k)
    scaled = apply_top_p(scaled, top_p)
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
