"""Explicit shard_map training step: tensor parallel + data parallel with
hand-placed collectives.

Unlike the GSPMD path (train_step.py, where XLA chooses collectives from
layout annotations), this runs the model per-shard under `shard_map`:
- params arrive pre-sharded by parallel/sharding.py rules (heads/d_ff/vocab
  split over the "tensor" axis); Pallas kernels run on LOCAL shapes, so the
  fused attention/RMSNorm/CE kernels compose with tensor parallelism
- the model inserts psums after row-parallel matmuls (models/t5.py tp_axis)
- the loss is the vocab-parallel CE (parallel/vocab_parallel.py)
- gradients: psum over "data" for every leaf (data parallelism), plus psum
  over "tensor" for replicated leaves (norms, embeddings) — sharded leaves'
  grads are already local

This is the production training path for multi-chip; collectives ride ICI
on the tensor axis (mesh layout, parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.parallel.sharding import param_pspecs


def tp_stat_axes(params):
    """AdamWScale stat_axes tree: psum rms stats over "tensor" for sharded
    leaves (pass to adamw_scale(stat_axes=...) for exact unsharded parity)."""
    return jax.tree.map(
        lambda spec: "tensor" if "tensor" in {a for a in spec if a is not None} else "",
        param_pspecs(params))


def _sync_grad(g, spec: P, comm_dtype=None):
    """Gradient synchronization: MEAN over "data" (data parallelism) and,
    for parameters replicated across tensor shards (norms, embeddings),
    SUM over "tensor" — each shard holds a partial contribution.

    `comm_dtype` (e.g. jnp.bfloat16) down-casts the gradient for the
    all-reduce and restores the original dtype after: the AOT v5e schedule
    (docs/hlo_overlap.json) all-reduces 587MB of f32 gradients per step
    with an exposed ~134MB lm_head/embedding tail — bf16 halves every
    bucket including that tail. Opt-in (default exact f32): the mean of
    bf16-rounded per-shard gradients differs from the f32 mean in the last
    ~8 mantissa bits."""
    out_dtype = g.dtype
    if comm_dtype is not None and g.dtype != comm_dtype:
        g = g.astype(comm_dtype)
    g = jax.lax.pmean(g, "data")
    if "tensor" not in {a for a in spec if a is not None}:
        g = jax.lax.psum(g, "tensor")
    return g.astype(out_dtype)


def make_tp_train_step(config: FlashT5Config, mesh: Mesh, tx,
                       allreduce_dtype=None) -> Callable:
    """Build a jitted (params, opt_state, batch, rng) -> (params, opt, metrics)
    step running under shard_map with explicit collectives.

    `params`/`opt_state` must be device_put with the param_shardings layout;
    batch["input_ids"]/["labels"] are sharded over "data".
    `allreduce_dtype="bfloat16"` halves gradient-sync bytes (see _sync_grad).
    """
    comm_dtype = (jnp.dtype(allreduce_dtype) if allreduce_dtype is not None
                  else None)
    tp_config = config.replace(tp_axis="tensor")

    abstract = jax.eval_shape(lambda r: t5.init_params(r, config),
                              jax.random.PRNGKey(0))
    pspecs = param_pspecs(abstract)
    opt_abstract = jax.eval_shape(tx.init, abstract)

    # optimizer state: any subtree that mirrors the parameter structure
    # (exp_avg, exp_avg_sq, kahan) gets the parameter specs; scalar state is
    # replicated. Structural matching — shape matching would confuse e.g.
    # square Wq vs o matrices that shard on different axes.
    param_struct = jax.tree.structure(abstract)

    def opt_specs_for(node):
        if node is None:
            return None
        try:
            if jax.tree.structure(node) == param_struct:
                return pspecs
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(opt_specs_for(c) for c in node))
        if isinstance(node, tuple):
            return tuple(opt_specs_for(c) for c in node)
        if isinstance(node, list):
            return [opt_specs_for(c) for c in node]
        if isinstance(node, dict):
            return {k: opt_specs_for(v) for k, v in node.items()}
        return P(*([None] * getattr(node, "ndim", 0)))

    opt_specs = opt_specs_for(opt_abstract)
    batch_specs = {"input_ids": P("data"), "labels": P("data")}

    def step(params, opt_state, batch, rng):
        if rng is not None:
            # decorrelate dropout across data shards; keep it identical
            # across tensor shards (activations are replicated there)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        # Cotangent-seed correction: with check_vma=False every tensor shard
        # differentiates its replicated copy of the loss, which scales all
        # gradients by the tensor-axis size (verified uniform across leaves);
        # dividing the differentiated loss by axis_size restores the exact
        # single-device gradients.
        tsz = jax.lax.axis_size("tensor")

        def loss_fn(p):
            return t5.forward(tp_config, p,
                              input_ids=batch["input_ids"],
                              labels=batch["labels"],
                              rng=rng, deterministic=rng is None)["loss"] / tsz

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.pmean(loss * tsz, "data")
        grads = jax.tree.map(
            functools.partial(_sync_grad, comm_dtype=comm_dtype),
            grads, pspecs)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)  # local-shard norm (diagnostic)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, opt_specs, batch_specs, P()),
        out_specs=(pspecs, opt_specs, {"loss": P(), "grad_norm": P()}),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def tp_train_state(config: FlashT5Config, mesh: Mesh, tx, rng=None):
    """Initialize (params, opt_state) already sharded for make_tp_train_step."""
    from flasht5_tpu.parallel.sharding import param_shardings

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    abstract = jax.eval_shape(lambda r: t5.init_params(r, config), rng)
    shardings = param_shardings(mesh, abstract)
    params = jax.jit(lambda r: t5.init_params(r, config),
                     out_shardings=shardings)(rng)
    opt_state = jax.jit(tx.init)(params)
    return params, opt_state
