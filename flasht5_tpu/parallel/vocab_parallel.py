"""Vocab-parallel cross-entropy over a tensor-sharded lm_head.

TPU-native re-design of the reference's vocab-split Triton CE + NCCL
collectives (cross_entropy_loss.py:52,303-351: per-rank class range, SPLIT
kernel mode, all_gather of LSE + all_reduce of partial losses): here each
tensor shard holds logits for its vocab slice; the global LSE is combined
with a pmax/psum logsumexp and the label/smoothing terms with psums — all
XLA collectives over the mesh axis, differentiable end-to-end (no custom
backward needed: autodiff through psum IS the reference's gradient
semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flasht5_tpu.config import FlashT5Config


def vocab_parallel_loss(config: FlashT5Config, local_logits: jnp.ndarray,
                        labels: jnp.ndarray, axis: str) -> jnp.ndarray:
    """CE + z-loss over vocab-sharded logits inside shard_map.

    local_logits: (B, L, V/t) — this shard's contiguous vocab slice
    labels: (B, L) global vocab ids, -100 = ignore
    Reduction matches the fused path (mean over ALL rows, reference
    modeling:68) when use_fused_crossentropy is set, else mean over
    non-ignored rows.
    """
    z = config.z_loss or 0.0
    smoothing = config.label_smoothing
    v_local = local_logits.shape[-1]
    total_classes = v_local * jax.lax.axis_size(axis)
    class_start = jax.lax.axis_index(axis) * v_local

    logits = local_logits.reshape(-1, v_local).astype(jnp.float32)
    flat_labels = labels.reshape(-1)
    rows = logits.shape[0]

    # ---- global logsumexp (stable two-stage combine) ----
    # stop_gradient on the max shift: it cancels exactly in d(lse)/d(logits)
    # (standard stable-logsumexp trick), and pmax has no JVP rule anyway
    local_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    gmax = jax.lax.pmax(local_max, axis)
    sumexp = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=-1)
    lse = gmax + jnp.log(jax.lax.psum(sumexp, axis))

    # ---- label term: each row's label lives on exactly one shard ----
    local_label = flat_labels - class_start
    in_shard = (local_label >= 0) & (local_label < v_local)
    safe = jnp.clip(local_label, 0, v_local - 1)
    picked = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    label_logit = jax.lax.psum(jnp.where(in_shard, picked, 0.0), axis)

    if smoothing > 0.0:
        sum_logits = jax.lax.psum(jnp.sum(logits, axis=-1), axis)
        loss = (lse
                - smoothing * sum_logits / total_classes
                - (1.0 - smoothing) * label_logit)
    else:
        loss = lse - label_logit
    loss = loss + z * lse * lse

    ignored = flat_labels == -100
    loss = jnp.where(ignored, 0.0, loss)
    if config.use_fused_crossentropy:
        return jnp.mean(loss)  # mean over all rows (reference quirk)
    n_valid = jnp.maximum(jnp.sum(~ignored), 1)
    return jnp.sum(loss) / n_valid

def vocab_parallel_next_token(local_logits: jnp.ndarray, axis: str, *,
                              rng=None, temperature: float = 0.0,
                              top_k: int = 0, top_p: float = 1.0
                              ) -> jnp.ndarray:
    """Next-token selection over vocab-sharded logits inside shard_map.

    local_logits: (B, V/t) — this shard's contiguous vocab slice. Greedy
    (temperature <= 0) never materializes the full vocab: each shard reduces
    to its local (max, argmax) pair and an all_gather of t pairs picks the
    winner, with exact single-device tie semantics (jnp.argmax takes the
    LOWEST index: the lowest-offset shard wins ties because shards are
    ordered by vocab offset). Sampling gathers the full row (needed for the
    categorical distribution) then draws with the shared rng — identical on
    every shard, so the returned tokens are replicated.
    """
    v_local = local_logits.shape[-1]
    class_start = jax.lax.axis_index(axis) * v_local
    if temperature > 0.0:
        from flasht5_tpu.inference.sampling import sample_token
        full = jax.lax.all_gather(local_logits, axis, axis=-1, tiled=True)
        return sample_token(rng, full, temperature=temperature,
                            top_k=top_k, top_p=top_p)
    lmax = jnp.max(local_logits, axis=-1)                       # (B,)
    larg = jnp.argmax(local_logits, axis=-1).astype(jnp.int32) + class_start
    allmax = jax.lax.all_gather(lmax, axis)                     # (t, B)
    allarg = jax.lax.all_gather(larg, axis)
    best = jnp.argmax(allmax, axis=0)                           # (B,)
    return jnp.take_along_axis(allarg, best[None, :], axis=0)[0]
