"""Sharded training step over a ("data", "tensor") mesh.

GSPMD/pjit path: parameters are laid out by parallel/sharding.py rules, the
batch is split over the data axis, and XLA inserts the collectives (gradient
psum over data, tensor-parallel all-gathers/reduce-scatters over ICI) — the
TPU-native replacement for the reference's DDP + vocab-parallel-NCCL setup
(SURVEY.md §2.8).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.optim import adamw_scale, no_decay_mask
import optax


def make_train_step(config: FlashT5Config, tx) -> Callable:
    """Pure (params, opt_state, batch, rng) -> (params, opt_state, metrics)."""

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            out = t5.forward(config, p,
                             input_ids=batch["input_ids"],
                             attention_mask=batch.get("attention_mask"),
                             labels=batch["labels"],
                             rng=rng,
                             deterministic=rng is None)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return step


def sharded_train_step(config: FlashT5Config, mesh: Mesh,
                       input_ids: jnp.ndarray, labels: jnp.ndarray,
                       learning_rate: float = 1e-3) -> jnp.ndarray:
    """Initialize sharded state and run ONE jitted training step on `mesh`.

    Used by the driver's multi-chip dry-run; returns the (finite) loss.
    """
    from flasht5_tpu.parallel.sharding import batch_sharding, param_shardings

    abstract = jax.eval_shape(
        lambda rng: t5.init_params(rng, config), jax.random.PRNGKey(0))
    shardings = param_shardings(mesh, abstract)

    params = jax.jit(
        lambda rng: t5.init_params(rng, config),
        out_shardings=shardings)(jax.random.PRNGKey(0))

    tx = adamw_scale(learning_rate, weight_decay=0.01, mask=no_decay_mask)
    opt_state = jax.jit(tx.init)(params)

    bs = batch_sharding(mesh)
    batch = {
        "input_ids": jax.device_put(input_ids, bs),
        "labels": jax.device_put(labels, bs),
    }

    step = jax.jit(make_train_step(config, tx), donate_argnums=(0, 1))
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
        params, opt_state, metrics = step(params, opt_state, batch, None)
    return metrics["loss"]
