"""AdamWScale: AdamW with Adafactor-style RMS(param) LR scaling, optional
Kahan-compensated updates for low-precision params, and optional
low-precision optimizer state.

Capability parity with the reference optimizer (src/utils/adamw_scaled.py):
- LR scaled per-parameter by max(1e-3, rms(param)) (reference :186, :250-256)
- decoupled weight decay applied after the Adam step with `-lr * wd * p`
  (reference :210-211)
- Kahan summation keeps a compensation buffer so pure-bf16 training converges
  (reference README.md:26, :188-198); unnecessary with fp32 state, but
  implemented for parity and for memory-lean bf16-everything runs
- optional bf16/fp16 exp_avg/exp_avg_sq state dtype (reference :102-107)

Shape: an optax-style GradientTransformation (pure init/update pytree
functions) — the idiomatic JAX re-design of the reference's in-place foreach
loops; the TPU update is a fused XLA elementwise graph per parameter.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class AdamWScaleState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any
    kahan_comp: Any  # pytree of arrays or Nones


def _rms(x):
    return jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32))))


def adamw_scale(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    kahan_sum: bool = False,
    correct_bias: bool = True,
    state_dtype: Optional[jnp.dtype] = None,
    mask=None,
    stat_axes=None,
    stat_batch_dims=None,
) -> optax.GradientTransformation:
    """Build the transformation. `learning_rate` is a float or schedule fn.

    `mask`: optional pytree/prefix (or callable of params) of bools selecting
    which leaves receive weight decay (True = decay), mirroring the
    reference's no-decay param groups (optimization.py:12-23).

    `stat_axes`: optional pytree (or callable of params) of comma-joined
    mesh-axis name strings ("" = none); inside shard_map, rms(param) for a
    tensor-sharded leaf is combined across its shards with psum so the
    Adafactor-style LR scaling matches the unsharded math exactly. (Strings,
    because tuples/None would be treated as pytree containers.)

    `stat_batch_dims`: optional pytree (or callable of params) of ints — the
    number of leading axes of a leaf to treat as independent parameters for
    the rms(param) statistic. Used for stacked-layer leaves (pipeline/scan
    layouts, leading layer axis): 1 gives each layer its own rms, matching
    the per-block unstacked math exactly.
    """

    def lr_at(step):
        return learning_rate(step) if callable(learning_rate) else learning_rate

    def init(params):
        sdt = state_dtype

        def zeros_like(p):
            return jnp.zeros_like(p, dtype=sdt or p.dtype)

        exp_avg = jax.tree.map(zeros_like, params)
        exp_avg_sq = jax.tree.map(zeros_like, params)
        if kahan_sum:
            kahan = jax.tree.map(
                lambda p: (jnp.zeros_like(p)
                           if p.dtype in (jnp.bfloat16, jnp.float16)
                           else None), params)
        else:
            kahan = jax.tree.map(lambda p: None, params)
        return AdamWScaleState(jnp.zeros((), jnp.int32), exp_avg, exp_avg_sq, kahan)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamw_scale requires params")
        step = state.step + 1
        lr = jnp.asarray(lr_at(step), jnp.float32)

        if callable(mask) or mask is not None:
            decay_mask = mask(params) if callable(mask) else mask
        else:
            decay_mask = jax.tree.map(lambda _: True, params)
        if callable(stat_axes):
            axes_tree = stat_axes(params)
        elif stat_axes is not None:
            axes_tree = stat_axes
        else:
            axes_tree = jax.tree.map(lambda _: "", params)
        if callable(stat_batch_dims):
            bd_tree = stat_batch_dims(params)
        elif stat_batch_dims is not None:
            bd_tree = stat_batch_dims
        else:
            bd_tree = jax.tree.map(lambda _: 0, params)

        def leaf(p, g, m, v, kc, dm, axes, bd):
            gf = g.astype(jnp.float32)
            m32 = m.astype(jnp.float32) * b1 + gf * (1.0 - b1)
            v32 = v.astype(jnp.float32) * b2 + gf * gf * (1.0 - b2)
            denom = jnp.sqrt(v32) + eps

            step_size = lr
            if correct_bias:
                bc1 = 1.0 - b1 ** step.astype(jnp.float32)
                bc2 = 1.0 - b2 ** step.astype(jnp.float32)
                step_size = step_size * jnp.sqrt(bc2) / bc1
            if bd:
                reduce_axes = tuple(range(bd, p.ndim))
                sum_sq = jnp.sum(jnp.square(p.astype(jnp.float32)),
                                 axis=reduce_axes, keepdims=True)
                lead = 1
                for s in p.shape[:bd]:
                    lead *= s
                n = jnp.asarray(p.size // max(1, lead), jnp.float32)
            else:
                sum_sq = jnp.sum(jnp.square(p.astype(jnp.float32)))
                n = jnp.asarray(p.size, jnp.float32)
            if axes:
                ax = tuple(axes.split(","))
                sum_sq = jax.lax.psum(sum_sq, ax)
                n = jax.lax.psum(n, ax)
            step_size = step_size * jnp.maximum(1e-3, jnp.sqrt(sum_sq / n))

            upd = -(step_size * m32 / denom)
            if kc is not None:
                # Kahan-compensated low-precision parameter update
                kc32 = kc.astype(jnp.float32) + upd
                p_new = (p.astype(jnp.float32) + kc32).astype(p.dtype)
                kc_new = (kc32 - (p_new.astype(jnp.float32) - p.astype(jnp.float32))).astype(kc.dtype)
            else:
                p_new = (p.astype(jnp.float32) + upd).astype(p.dtype)
                kc_new = None
            if weight_decay > 0.0:
                wd = jnp.where(dm, weight_decay, 0.0)
                p_new = (p_new.astype(jnp.float32)
                         * (1.0 - lr * wd)).astype(p.dtype)
            delta = (p_new.astype(jnp.float32) - p.astype(jnp.float32)).astype(p.dtype)
            return delta, m32.astype(m.dtype), v32.astype(v.dtype), kc_new

        is_leaf_none = lambda x: x is None
        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_v = treedef.flatten_up_to(state.exp_avg_sq)
        flat_k = treedef.flatten_up_to(state.kahan_comp)
        flat_d = treedef.flatten_up_to(decay_mask)
        flat_a = treedef.flatten_up_to(axes_tree)
        flat_b = treedef.flatten_up_to(bd_tree)

        outs = [leaf(p, g, m, v, kc, dm, ax, bd)
                for p, g, m, v, kc, dm, ax, bd in
                zip(flat_p, flat_g, flat_m, flat_v, flat_k, flat_d, flat_a,
                    flat_b)]
        deltas = treedef.unflatten([o[0] for o in outs])
        new_m = treedef.unflatten([o[1] for o in outs])
        new_v = treedef.unflatten([o[2] for o in outs])
        new_k = treedef.unflatten([o[3] for o in outs])
        return deltas, AdamWScaleState(step, new_m, new_v, new_k)

    return optax.GradientTransformation(init, update)


_NO_DECAY_SUBSTRINGS = ("bias", "layer_norm", "layernorm", "LayerNorm", "ln")


def no_decay_mask(params) -> Any:
    """True for decayed leaves, False for norm/bias leaves — the reference's
    no-decay grouping by parameter name (optimization.py:12-23)."""

    def leaf_mask(path, _):
        keys = jax.tree_util.keystr(path)
        return not any(s in keys for s in _NO_DECAY_SUBSTRINGS)

    return jax.tree_util.tree_map_with_path(leaf_mask, params)
