"""Parity: fused lm_head+CE vs the unfused matmul -> cross_entropy_loss_ref
composition, value AND gradients (dx, dw), across the quirk knobs.

The fused op keeps logits in f32 registers (never rounds them to bf16 in
HBM), so against an all-f32 oracle it is at least as accurate as the
production unfused path; tolerances below reflect bf16 matmul inputs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.ops.cross_entropy import cross_entropy_loss_ref
from flasht5_tpu.ops.fused_linear_ce import fused_linear_cross_entropy


def _make(rows, d, v, seed=0, dtype=jnp.float32, ignore_frac=0.25):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = (jax.random.normal(k[0], (rows, d), jnp.float32) * 0.5).astype(dtype)
    w = jax.random.normal(k[1], (d, v), jnp.float32) * (d ** -0.5)
    labels = jax.random.randint(k[2], (rows,), 0, v, jnp.int32)
    if ignore_frac:
        mask = jax.random.uniform(jax.random.PRNGKey(seed + 7), (rows,))
        labels = jnp.where(mask < ignore_frac, -100, labels)
    return x, w, labels


def _ref_loss(x, w, labels, **kw):
    logits = jnp.dot(x, w.astype(x.dtype))
    loss, z = cross_entropy_loss_ref(logits, labels, **kw)
    return loss, z


CASES = [
    dict(),                                             # plain CE
    dict(lse_square_scale=1e-4),                        # z-loss
    dict(label_smoothing=0.1),                          # smoothing
    dict(logit_scale=0.5),                              # logit scale
    dict(lse_square_scale=1e-4, label_smoothing=0.1, logit_scale=2.0),
]


@pytest.mark.parametrize("kw", CASES)
@pytest.mark.parametrize("shape", [(64, 128, 384), (48, 128, 512)])
def test_forward_parity(kw, shape):
    rows, d, v = shape
    x, w, labels = _make(rows, d, v)
    loss_f, z_f = fused_linear_cross_entropy(x, w, labels, **kw)
    loss_r, z_r = _ref_loss(x, w, labels, **kw)
    np.testing.assert_allclose(loss_f, loss_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(z_f, z_r, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kw", CASES)
def test_grad_parity(kw):
    rows, d, v = 64, 128, 384
    x, w, labels = _make(rows, d, v)

    def mean_fused(x, w):
        loss, _ = fused_linear_cross_entropy(x, w, labels, **kw)
        return jnp.mean(loss)

    def mean_ref(x, w):
        loss, _ = _ref_loss(x, w, labels, **kw)
        return jnp.mean(loss)

    (dx_f, dw_f) = jax.grad(mean_fused, argnums=(0, 1))(x, w)
    (dx_r, dw_r) = jax.grad(mean_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(dx_f, dx_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dw_f, dw_r, rtol=1e-4, atol=1e-5)


def test_bf16_activations():
    rows, d, v = 64, 128, 384
    x, w, labels = _make(rows, d, v, dtype=jnp.bfloat16)

    def mean_fused(x, w):
        loss, _ = fused_linear_cross_entropy(x, w, labels, 1e-4)
        return jnp.mean(loss)

    def mean_ref(x, w):
        loss, _ = _ref_loss(x, w, labels, lse_square_scale=1e-4)
        return jnp.mean(loss)

    lf = mean_fused(x, w)
    lr = mean_ref(x, w)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-3)
    (dx_f, dw_f) = jax.grad(mean_fused, argnums=(0, 1))(x, w)
    (dx_r, dw_r) = jax.grad(mean_ref, argnums=(0, 1))(x, w)
    assert dx_f.dtype == x.dtype and dw_f.dtype == w.dtype
    np.testing.assert_allclose(np.asarray(dx_f, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=5e-2, atol=1e-4)
    np.testing.assert_allclose(dw_f, dw_r, rtol=5e-2, atol=1e-4)


def test_non_divisible_shapes():
    # rows not a multiple of the row block, vocab not a multiple of 128
    rows, d, v = 37, 128, 300
    x, w, labels = _make(rows, d, v, ignore_frac=0.3)
    loss_f, z_f = fused_linear_cross_entropy(x, w, labels, 1e-4, 0.1)
    loss_r, z_r = _ref_loss(x, w, labels, lse_square_scale=1e-4,
                            label_smoothing=0.1)
    np.testing.assert_allclose(loss_f, loss_r, rtol=1e-5, atol=1e-5)

    def mean_fused(x, w):
        loss, _ = fused_linear_cross_entropy(x, w, labels, 1e-4, 0.1)
        return jnp.mean(loss)

    def mean_ref(x, w):
        loss, _ = _ref_loss(x, w, labels, lse_square_scale=1e-4,
                            label_smoothing=0.1)
        return jnp.mean(loss)

    (dx_f, dw_f) = jax.grad(mean_fused, argnums=(0, 1))(x, w)
    (dx_r, dw_r) = jax.grad(mean_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(dx_f, dx_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dw_f, dw_r, rtol=1e-4, atol=1e-5)


def test_all_rows_ignored():
    rows, d, v = 16, 128, 256
    x, w, _ = _make(rows, d, v)
    labels = jnp.full((rows,), -100, jnp.int32)
    loss, z = fused_linear_cross_entropy(x, w, labels, 1e-4)
    assert float(jnp.sum(jnp.abs(loss))) == 0.0
    dx, dw = jax.grad(
        lambda x, w: jnp.mean(fused_linear_cross_entropy(x, w, labels)[0]),
        argnums=(0, 1))(x, w)
    assert float(jnp.max(jnp.abs(dx))) == 0.0
    assert float(jnp.max(jnp.abs(dw))) == 0.0


def test_model_loss_parity():
    """End-to-end: t5.forward loss with use_fused_lm_head_ce must match the
    unfused fused-CE path on the same params/batch (both mean over ALL rows,
    the reference's reduction quirk, modeling:68)."""
    from flasht5_tpu.models import t5
    from flasht5_tpu.config import FlashT5Config

    config = FlashT5Config(
        vocab_size=384, d_model=64, d_kv=16, num_heads=4, d_ff=128,
        num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        position_encoding_type="t5", attention_type="ref",
        use_fused_crossentropy=True, z_loss=1e-4, pad_token_id=0)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    input_ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 384)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, 384)

    loss_unfused = t5.forward(config, params, input_ids=input_ids,
                              labels=labels)["loss"]
    cf = config.replace(use_fused_lm_head_ce=True)
    loss_fused = t5.forward(cf, params, input_ids=input_ids,
                            labels=labels)["loss"]
    np.testing.assert_allclose(float(loss_fused), float(loss_unfused),
                               rtol=2e-3)

    def lf(p, cfg):
        return t5.forward(cfg, p, input_ids=input_ids, labels=labels)["loss"]

    g_u = jax.grad(lf)(params, config)
    g_f = jax.grad(lf)(params, cf)
    flat_u = jax.tree_util.tree_leaves(g_u)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, b in zip(flat_f, flat_u):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=2e-3)
