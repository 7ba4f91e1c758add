"""Optimizer + schedule tests.

Adopts the reference's variant-equivalence strategy
(tests/optimizer/test_optimizer.py): train a tiny linear model a few steps
under each option combination and require losses to stay close to the
baseline; schedules are pinned to the reference's torch scheduler semantics
(optimization.py:38-104)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flasht5_tpu.optim import adamw_scale, cosine_schedule, no_decay_mask, wsd_schedule


def _train(dtype, kahan, weight_decay, state_dtype=None, steps=8, lr=1e-2):
    k = jax.random.PRNGKey(0)
    w_key, x_key, n_key = jax.random.split(k, 3)
    true_w = jax.random.normal(w_key, (16, 1))
    x = jax.random.normal(x_key, (64, 16))
    y = x @ true_w + 0.01 * jax.random.normal(n_key, (64, 1))

    params = {"linear": {"weight": jnp.zeros((16, 1), dtype),
                         "bias": jnp.zeros((1,), dtype)}}
    tx = adamw_scale(lr, weight_decay=weight_decay, kahan_sum=kahan,
                     state_dtype=state_dtype, mask=no_decay_mask)
    state = tx.init(params)

    def loss_fn(p):
        pred = x.astype(jnp.float32) @ p["linear"]["weight"].astype(jnp.float32) \
            + p["linear"]["bias"].astype(jnp.float32)
        return jnp.mean((pred - y) ** 2)

    for _ in range(steps):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return float(loss_fn(params))


def test_baseline_converges():
    final = _train(jnp.float32, kahan=False, weight_decay=0.0, steps=50, lr=5e-2)
    assert final < _train(jnp.float32, kahan=False, weight_decay=0.0, steps=1)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("kahan", [False, True])
@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_variants_match_baseline(dtype, kahan, weight_decay):
    base = _train(jnp.float32, kahan=False, weight_decay=weight_decay)
    var = _train(dtype, kahan=kahan, weight_decay=weight_decay)
    assert abs(base - var) < 0.1, (base, var)


def test_low_precision_state():
    var = _train(jnp.float32, kahan=False, weight_decay=0.0,
                 state_dtype=jnp.bfloat16)
    base = _train(jnp.float32, kahan=False, weight_decay=0.0)
    assert abs(base - var) < 0.1


def test_kahan_helps_bf16():
    """With tiny LR, bf16 params swallow small updates; Kahan accumulates
    them (the reference's pure-bf16 convergence claim, README.md:26)."""
    plain = _train(jnp.bfloat16, kahan=False, weight_decay=0.0, steps=200, lr=2e-4)
    kahan = _train(jnp.bfloat16, kahan=True, weight_decay=0.0, steps=200, lr=2e-4)
    assert kahan <= plain + 1e-3


def test_no_decay_mask_paths():
    params = {"block": {"attn": {"Wq": 1}, "layer_norm": {"weight": 1},
                        "out": {"bias": 1}}}
    mask = no_decay_mask(params)
    assert mask["block"]["attn"]["Wq"] is True
    assert mask["block"]["layer_norm"]["weight"] is False
    assert mask["block"]["out"]["bias"] is False


def test_cosine_schedule_shape():
    sched = cosine_schedule(1.0, 1000, warmup_steps=100)
    assert abs(float(sched(0)) - 0.5) < 1e-6          # starts at half LR
    assert abs(float(sched(100)) - 1.0) < 1e-2        # peak after warmup
    assert float(sched(1000)) < 1e-3                   # annealed to ~eta_min
    # warmup_ratio path
    sched2 = cosine_schedule(1.0, 1000, warmup_steps=0, warmup_ratio=0.1)
    assert abs(float(sched2(100)) - 1.0) < 1e-2


def test_wsd_schedule_shape():
    sched = wsd_schedule(1.0, 1000, warmup_steps=100)
    assert abs(float(sched(0)) - 0.5) < 1e-6
    assert abs(float(sched(500)) - 1.0) < 1e-6        # stable plateau
    assert abs(float(sched(1000)) - 0.5) < 1e-2       # decayed to half
