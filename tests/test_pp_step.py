"""Full-model pipeline-parallel training (parallel/pp_step.py): the GPipe
schedule over a ("pipe", "data") mesh must reproduce the single-device
training step exactly — loss, gradients (via updated params), and the
AdamWScale per-layer rms statistics on stacked leaves."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.optim import adamw_scale, no_decay_mask
from flasht5_tpu.parallel.pp_step import (
    from_pp_params, make_pp_mesh, make_pp_train_step, pp_stat_batch_dims,
    pp_train_state, to_pp_params)


def tiny_config(**kw):
    base = dict(vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
                num_layers=4, dropout_rate=0.0, attention_scale=1.0,
                dtype="float32", pad_token_id=0, use_fused_crossentropy=True)
    base.update(kw)
    return FlashT5Config(**base)


def _data(b=8, m=16, n=8, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ids = jax.random.randint(k1, (b, m), 2, 256, dtype=jnp.int32)
    lbl = jax.random.randint(k2, (b, n), 2, 256, dtype=jnp.int32)
    return ids, lbl


def test_pp_param_roundtrip():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    back = from_pp_params(to_pp_params(params))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, back)


@pytest.mark.parametrize("pipe,data,n_mb", [(2, 2, 2), (4, 1, 4), (4, 2, 2)])
def test_pp_step_matches_single_device(pipe, data, n_mb):
    config = tiny_config()
    mesh = make_pp_mesh(pipe, data)
    tx = adamw_scale(1e-2, mask=no_decay_mask,
                     stat_batch_dims=pp_stat_batch_dims)
    params, opt_state = pp_train_state(config, mesh, tx)
    step = make_pp_train_step(config, mesh, tx, n_microbatches=n_mb)
    ids, lbl = _data()
    batch = {"input_ids": ids, "labels": lbl}

    stx = adamw_scale(1e-2, mask=no_decay_mask)
    sp = t5.init_params(jax.random.PRNGKey(0), config)
    s_opt = stx.init(sp)

    @jax.jit
    def sstep(p, o):
        loss, g = jax.value_and_grad(
            lambda pp: t5.forward(config, pp, input_ids=ids,
                                  labels=lbl)["loss"])(p)
        u, o = stx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    with mesh:
        for _ in range(2):
            params, opt_state, metrics = step(params, opt_state, batch, None)
            sp, s_opt, sloss = sstep(sp, s_opt)

    np.testing.assert_allclose(float(metrics["loss"]), float(sloss),
                               rtol=1e-4, atol=1e-4)
    flat = from_pp_params(jax.device_get(params))
    # stacked (pipe-sharded) leaf, PE leaf, and replicated leaves all match
    for get in [
        lambda p: p["encoder"]["block"][1]["ff_layer"]["wo"],
        lambda p: p["encoder"]["block"][0]["self_attention_layer"]
                   ["self_attention"]["pe_encoding"]["relative_attention_bias"],
        lambda p: p["shared"]["embedding"],
        lambda p: p["lm_head"],
        lambda p: p["decoder"]["final_layer_norm"]["weight"],
    ]:
        np.testing.assert_allclose(np.asarray(get(flat)), np.asarray(get(sp)),
                                   rtol=2e-4, atol=2e-5)


def test_pp_step_pallas_kernels():
    """Pipeline stages run the Pallas kernel paths (in-kernel RPE bias in
    every block via the threaded table)."""
    config = tiny_config(attention_type="pallas_rpe", use_fused_layernorm=True)
    mesh = make_pp_mesh(2, 2)
    tx = adamw_scale(1e-2, mask=no_decay_mask,
                     stat_batch_dims=pp_stat_batch_dims)
    params, opt_state = pp_train_state(config, mesh, tx)
    step = make_pp_train_step(config, mesh, tx, n_microbatches=2)
    ids, lbl = _data(seed=3)

    ref_cfg = config.replace(attention_type="ref", use_fused_layernorm=False)
    sp = t5.init_params(jax.random.PRNGKey(0), config)
    ref_loss = float(t5.forward(ref_cfg, sp, input_ids=ids,
                                labels=lbl)["loss"])
    with mesh:
        _, _, metrics = step(params, opt_state,
                             {"input_ids": ids, "labels": lbl}, None)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss,
                               rtol=1e-3, atol=1e-3)


def test_pp_rejects_dropout():
    config = tiny_config(dropout_rate=0.1)
    mesh = make_pp_mesh(2, 1)
    tx = optax.sgd(1e-2)
    with pytest.raises(ValueError):
        make_pp_train_step(config, mesh, tx)
