"""Pipeline parallelism: GPipe-style microbatched execution of the uniform
block stack over a "pipe" mesh axis.

The reference has no pipeline parallelism (is_parallelizable=False,
modeling_flash_t5.py:474; SURVEY.md §2.8 marks it optional). This is the
TPU-native formulation: the stacked homogeneous blocks (the same stacking
used for lax.scan) are sharded over the pipe axis so each device owns
num_layers/S consecutive blocks; microbatch activations travel stage-to-stage
with `ppermute`. Every device executes the same program each tick (bubble
ticks compute on garbage and are masked), which keeps the schedule a single
jittable loop — XLA overlaps the `ppermute` with the next tick's compute.

Differentiating through the loop gives the backward pipeline for free
(ppermute transposes to the reverse-direction ppermute).

Scope: the homogeneous block segment (blocks 1..N-1 of a stack — block 0
owns the positional encoding and runs outside, exactly like the scan path);
self-attention-only stacks (encoder) or full decoder blocks both work since
`_block_apply` is closed over statically.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def pipeline_apply(
    block_fn: Callable,
    stacked_params,
    microbatches: jnp.ndarray,
    axis_name: str,
    *,
    extra_inputs=(),
):
    """Run microbatches through pipe-sharded stacked blocks.

    block_fn(params_one_block, x, *extra_inputs) -> x : one block's forward.
    stacked_params: pytree with leading LOCAL layer axis (global layer axis
        sharded over `axis_name`; consecutive layers per stage).
    microbatches: array (M, mb, T, D) or a PYTREE of such arrays (leading
        microbatch axis M on every leaf) — replicated across the pipe axis.
        Pytree leaves travel the ring together; this is how per-microbatch
        side inputs (e.g. the matching encoder states for decoder
        cross-attention) ride along with the activations.
    Returns the same structure: the pipeline output, valid on every device
    (broadcast from the last stage).
    """
    s_size = jax.lax.axis_size(axis_name)
    s_idx = jax.lax.axis_index(axis_name)
    leaves = jax.tree.leaves(microbatches)
    n_mb = leaves[0].shape[0]

    def apply_stage(x):
        def body(h, bp):
            return block_fn(bp, h, *extra_inputs), None

        out, _ = jax.lax.scan(body, x, stacked_params)
        return out

    fwd_perm = [(i, i + 1) for i in range(s_size - 1)]

    def tick(carry, t):
        buf, outs = carry
        # stage 0 injects microbatch t (clamped; bubbles masked)
        mb_idx = jnp.clip(t, 0, n_mb - 1)
        inject = jnp.logical_and(s_idx == 0, t < n_mb)
        x_in = jax.tree.map(
            lambda m, b: jnp.where(inject, m[mb_idx], b), microbatches, buf)
        y = apply_stage(x_in)
        # last stage emits microbatch t - (S-1)
        out_idx = jnp.clip(t - (s_size - 1), 0, n_mb - 1)
        emit = jnp.logical_and(s_idx == s_size - 1, t >= s_size - 1)
        outs = jax.tree.map(
            lambda o, yy: jax.lax.dynamic_update_index_in_dim(
                o,
                jnp.where(emit, yy,
                          jax.lax.dynamic_index_in_dim(o, out_idx,
                                                       keepdims=False)),
                out_idx, axis=0),
            outs, y)
        buf = (jax.lax.ppermute(y, axis_name, fwd_perm)
               if s_size > 1 else y)
        return (buf, outs), None

    buf0 = jax.tree.map(lambda m: jnp.zeros(m.shape[1:], m.dtype),
                        microbatches)
    outs0 = jax.tree.map(jnp.zeros_like, microbatches)
    (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                jnp.arange(n_mb + s_size - 1))

    # broadcast the last stage's outputs to every stage: zero elsewhere + psum
    outs = jax.tree.map(lambda o: jnp.where(s_idx == s_size - 1, o, 0.0),
                        outs)
    return jax.lax.psum(outs, axis_name)
