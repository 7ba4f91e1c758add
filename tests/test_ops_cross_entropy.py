"""Fused CE vs jnp oracle (test strategy per reference
tests/cross_entropy_triton/test_cross_entropy.py: real & non-power-of-2
vocab sizes, z_loss x smoothing grid, loss value + logits grad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.ops.cross_entropy import cross_entropy_loss, cross_entropy_loss_ref


def _data(rows, vocab, seed=0, ignore_frac=0.25):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    logits = jax.random.normal(k1, (rows, vocab), jnp.float32) * 2.0
    labels = jax.random.randint(k2, (rows,), 0, vocab)
    ignore = jax.random.uniform(k3, (rows,)) < ignore_frac
    labels = jnp.where(ignore, -100, labels)
    return logits, labels


@pytest.mark.parametrize("vocab", [32768, 32102])
@pytest.mark.parametrize("z_loss", [0.0, 1e-4])
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_ce_forward(vocab, z_loss, smoothing):
    logits, labels = _data(64, vocab)
    loss, z = cross_entropy_loss(logits, labels, z_loss, smoothing)
    ref_loss, ref_z = cross_entropy_loss_ref(
        logits, labels, lse_square_scale=z_loss, label_smoothing=smoothing)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref_loss),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref_z),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("vocab", [4096, 32102])
@pytest.mark.parametrize("z_loss", [0.0, 1e-4])
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_ce_backward(vocab, z_loss, smoothing):
    logits, labels = _data(32, vocab)

    def f_fused(lg):
        return jnp.mean(cross_entropy_loss(lg, labels, z_loss, smoothing)[0])

    def f_ref(lg):
        losses, _ = cross_entropy_loss_ref(lg, labels, lse_square_scale=z_loss,
                                           label_smoothing=smoothing)
        return jnp.mean(losses)

    g = jax.grad(f_fused)(logits)
    r = jax.grad(f_ref)(logits)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5, rtol=1e-3)


def test_ce_odd_rows():
    logits, labels = _data(13, 512)
    loss, _ = cross_entropy_loss(logits, labels)
    ref, _ = cross_entropy_loss_ref(logits, labels)
    assert loss.shape == (13,)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_ce_bf16_logits():
    logits, labels = _data(16, 1024)
    lb = logits.astype(jnp.bfloat16)
    loss, _ = cross_entropy_loss(lb, labels)
    ref, _ = cross_entropy_loss_ref(lb, labels)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref), atol=5e-2, rtol=1e-2)


def test_ce_both_output_cotangents():
    """Differentiating a function of BOTH outputs must propagate the z_loss
    cotangent (round-1 defect: dz was silently dropped)."""
    logits, labels = _data(16, 512)
    z_scale = 1e-2

    def f_fused(lg):
        loss, z = cross_entropy_loss(lg, labels, z_scale)
        return jnp.mean(loss) + 3.0 * jnp.mean(z)

    def f_ref(lg):
        loss, z = cross_entropy_loss_ref(lg, labels, lse_square_scale=z_scale)
        return jnp.mean(loss) + 3.0 * jnp.mean(z)

    g = jax.grad(f_fused)(logits)
    r = jax.grad(f_ref)(logits)
    assert not np.allclose(np.asarray(g), 0.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5, rtol=1e-3)


def test_ce_z_only_cotangent():
    logits, labels = _data(8, 256)
    z_scale = 1e-2
    g = jax.grad(lambda lg: jnp.sum(cross_entropy_loss(lg, labels, z_scale)[1]))(logits)
    r = jax.grad(lambda lg: jnp.sum(
        cross_entropy_loss_ref(lg, labels, lse_square_scale=z_scale)[1]))(logits)
    np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5, rtol=1e-3)


@pytest.mark.parametrize("vocab", [2048, 5000])
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_ce_tiled_matches_rowblock(monkeypatch, vocab, smoothing):
    """The default vocab-tiled streaming kernels (FLASHT5_CE_TILED=1) must
    match the full-vocab row-block kernels: loss, z, and dlogits under
    both-output cotangents."""
    logits, labels = _data(40, vocab, seed=7)
    z_scale = 1e-3

    def run(lg):
        loss, z = cross_entropy_loss(lg, labels, z_scale, smoothing)
        g = jax.grad(lambda l_: jnp.sum(
            cross_entropy_loss(l_, labels, z_scale, smoothing)[0])
            + 2.0 * jnp.sum(
            cross_entropy_loss(l_, labels, z_scale, smoothing)[1]))(lg)
        return loss, z, g

    monkeypatch.setenv("FLASHT5_CE_TILED", "0")
    ref = run(logits)
    monkeypatch.setenv("FLASHT5_CE_TILED", "1")
    res = run(logits)
    for a, b, name in zip(res, ref, ["loss", "z", "dlogits"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=name)


def test_ce_tiled_split_semantics(monkeypatch):
    """Vocab-split (tensor-parallel) semantics through the tiled kernels."""
    logits, labels = _data(24, 1024, seed=9)
    shard = logits[:, 512:]
    for tiled in ("0", "1"):
        monkeypatch.setenv("FLASHT5_CE_TILED", tiled)
        loss, z = cross_entropy_loss(
            shard, labels, 1e-3, 0.1, total_classes=1024,
            class_start_idx=512, split=True)
        if tiled == "0":
            ref = (loss, z)
        else:
            np.testing.assert_allclose(np.asarray(loss), np.asarray(ref[0]),
                                       atol=1e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(z), np.asarray(ref[1]),
                                       atol=1e-5, rtol=1e-4)
