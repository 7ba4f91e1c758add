"""Pure-jnp attention reference (the oracle every fused kernel is tested against).

Capability parity with the reference's `attn_ref` (src/utils/attn_ref.py:3-29):
additive bias, causal masking, dropout, optional fp32 upcast of the softmax,
arbitrary softmax scale. Layout is (B, H, M, D) x (B, H, N, D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def attn_ref(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    sm_scale: float = 1.0,
    causal: bool = False,
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    upcast: bool = True,
) -> jnp.ndarray:
    """Scaled-dot-product attention with additive bias.

    q: (B, H, M, D); k, v: (B, H, N, D); bias broadcastable to (B, H, M, N).
    Returns (B, H, M, D) in q.dtype.
    """
    out_dtype = q.dtype
    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        if bias is not None:
            bias = bias.astype(jnp.float32)

    scores = jnp.einsum("bhmd,bhnd->bhmn", q, k) * sm_scale
    if bias is not None:
        scores = scores + bias
    fully_masked = None
    if causal:
        m, n = scores.shape[-2], scores.shape[-1]
        # bottom-right aligned causal mask (matches flash-attn convention for
        # M != N; for self-attention M == N this is the standard triangle)
        row = jnp.arange(m)[:, None]
        col = jnp.arange(n)[None, :]
        mask = col <= row + (n - m)
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        fully_masked = ~jnp.any(mask, axis=-1)  # (m,)
    p = jax.nn.softmax(scores, axis=-1)
    if fully_masked is not None:
        # flash-attention convention: a row with no visible keys outputs 0
        p = jnp.where(fully_masked[None, None, :, None], 0.0, p)
    if dropout_p > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_p > 0 requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
    out = jnp.einsum("bhmn,bhnd->bhmd", p, v)
    return out.astype(out_dtype)
