"""Explicit shard_map tensor-parallel training: loss/grads must match the
single-device step bit-for-bit-ish on the virtual 8-device CPU mesh.

This is the path where the Pallas kernels run per-shard and the
vocab-parallel CE uses real collectives — the TPU-native answer to the
reference's vocab-split NCCL loss (cross_entropy_loss.py:303-351)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.optim import adamw_scale, no_decay_mask
from flasht5_tpu.parallel import make_mesh
from flasht5_tpu.parallel.sharding import batch_sharding
from flasht5_tpu.parallel.tp_step import make_tp_train_step, tp_stat_axes, tp_train_state


def tiny_config(**kw):
    base = dict(vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
                num_layers=2, dropout_rate=0.0, attention_scale=1.0,
                dtype="float32", pad_token_id=0,
                use_fused_crossentropy=True)  # mean-over-all-rows reduction
    base.update(kw)
    return FlashT5Config(**base)


def _batch(mesh, b=8, m=24, n=12, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ids = jax.random.randint(k1, (b, m), 2, 256, dtype=jnp.int32)
    lbl = jax.random.randint(k2, (b, n), 2, 256, dtype=jnp.int32)
    bs = batch_sharding(mesh)
    return {"input_ids": jax.device_put(ids, bs),
            "labels": jax.device_put(lbl, bs)}, ids, lbl


@pytest.mark.parametrize("data,tensor", [(2, 4), (4, 2), (8, 1)])
def test_tp_loss_matches_single_device(data, tensor):
    config = tiny_config()
    mesh = make_mesh(data, tensor)
    tx = adamw_scale(1e-3, mask=no_decay_mask)
    params, opt_state = tp_train_state(config, mesh, tx)
    step = make_tp_train_step(config, mesh, tx)
    batch, ids, lbl = _batch(mesh)

    # single-device oracle from identical init
    sp = t5.init_params(jax.random.PRNGKey(0), config)
    ref_loss = float(t5.forward(config, sp, input_ids=ids, labels=lbl)["loss"])

    params2, opt2, metrics = step(params, opt_state, batch, None)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss,
                               rtol=2e-5, atol=2e-5)


def test_tp_params_match_single_device_after_steps():
    config = tiny_config()
    mesh = make_mesh(2, 4)
    # collective rms stats so the Adafactor-style LR scaling matches the
    # unsharded oracle exactly (single-device: stat_axes are no-ops outside
    # shard_map, so the oracle uses a plain optimizer)
    tx = adamw_scale(1e-2, mask=no_decay_mask, stat_axes=tp_stat_axes)
    params, opt_state = tp_train_state(config, mesh, tx)
    step = make_tp_train_step(config, mesh, tx)
    batch, ids, lbl = _batch(mesh, seed=1)

    # single-device training oracle (no collectives)
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

    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch, None)
        sp, s_opt, sloss = sstep(sp, s_opt)

    np.testing.assert_allclose(float(metrics["loss"]), float(sloss),
                               rtol=1e-4, atol=1e-4)
    # compare a sharded leaf and a replicated leaf against the oracle
    tp_wq = np.asarray(jax.device_get(
        params["encoder"]["block"][0]["self_attention_layer"]
        ["self_attention"]["Wq"]))
    ref_wq = np.asarray(
        sp["encoder"]["block"][0]["self_attention_layer"]["self_attention"]["Wq"])
    np.testing.assert_allclose(tp_wq, ref_wq, rtol=1e-4, atol=1e-5)
    tp_ln = np.asarray(jax.device_get(
        params["encoder"]["final_layer_norm"]["weight"]))
    ref_ln = np.asarray(sp["encoder"]["final_layer_norm"]["weight"])
    np.testing.assert_allclose(tp_ln, ref_ln, rtol=1e-4, atol=1e-5)


def test_tp_bf16_grad_allreduce_close_to_f32():
    """allreduce_dtype="bfloat16" halves gradient-sync bytes (the exposed
    lm_head/embedding all-reduce tail, docs/hlo_overlap.json); the rounded
    mean must track the exact-f32 step closely but not bit-exactly."""
    config = tiny_config()
    mesh = make_mesh(4, 2)
    tx = adamw_scale(1e-2, mask=no_decay_mask, stat_axes=tp_stat_axes)
    params_a, opt_a = tp_train_state(config, mesh, tx)
    params_b, opt_b = tp_train_state(config, mesh, tx)
    step_f32 = make_tp_train_step(config, mesh, tx)
    step_bf16 = make_tp_train_step(config, mesh, tx,
                                   allreduce_dtype="bfloat16")
    losses_a, losses_b = [], []
    for s in range(4):
        batch, _, _ = _batch(mesh, seed=s)
        params_a, opt_a, ma = step_f32(params_a, opt_a, batch, None)
        params_b, opt_b, mb = step_bf16(params_b, opt_b, batch, None)
        losses_a.append(float(ma["loss"]))
        losses_b.append(float(mb["loss"]))
    # same trajectory to bf16-rounding tolerance; training still converges
    np.testing.assert_allclose(losses_b, losses_a, rtol=2e-3, atol=2e-3)
    assert losses_b[-1] < losses_b[0]
    # params stay close leafwise
    wa = np.asarray(params_a["encoder"]["final_layer_norm"]["weight"])
    wb = np.asarray(params_b["encoder"]["final_layer_norm"]["weight"])
    np.testing.assert_allclose(wb, wa, rtol=5e-3, atol=5e-3)


def test_tp_with_label_smoothing_and_ignore():
    config = tiny_config(label_smoothing=0.1, z_loss=1e-4)
    mesh = make_mesh(2, 4)
    tx = adamw_scale(1e-3, mask=no_decay_mask)
    params, opt_state = tp_train_state(config, mesh, tx)
    step = make_tp_train_step(config, mesh, tx)
    batch, ids, lbl = _batch(mesh, seed=2)
    lbl = lbl.at[:, -3:].set(-100)
    bs = batch_sharding(mesh)
    batch["labels"] = jax.device_put(lbl, bs)

    sp = t5.init_params(jax.random.PRNGKey(0), config)
    ref_loss = float(t5.forward(config, sp, input_ids=ids, labels=lbl)["loss"])
    _, _, metrics = step(params, opt_state, batch, None)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss,
                               rtol=2e-5, atol=2e-5)


def test_tp_with_pallas_kernels():
    """Pallas kernels run per-shard under shard_map (local head counts);
    loss must match the single-device pallas run."""
    config = tiny_config(attention_type="pallas", use_fused_layernorm=True,
                         d_kv=16, num_heads=4)
    mesh = make_mesh(2, 4)
    tx = adamw_scale(1e-3, mask=no_decay_mask)
    params, opt_state = tp_train_state(config, mesh, tx)
    step = make_tp_train_step(config, mesh, tx)
    batch, ids, lbl = _batch(mesh, seed=3)

    sp = t5.init_params(jax.random.PRNGKey(0), config)
    ref_loss = float(t5.forward(config, sp, input_ids=ids, labels=lbl)["loss"])
    _, _, metrics = step(params, opt_state, batch, None)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss,
                               rtol=5e-4, atol=5e-4)


def test_tp_with_pallas_rpe_kernel():
    """The RPE kernel's head-sharded weight slice composes with TP."""
    config = tiny_config(attention_type="pallas_rpe", num_heads=4, d_kv=16)
    mesh = make_mesh(2, 4)
    tx = adamw_scale(1e-3, mask=no_decay_mask)
    params, opt_state = tp_train_state(config, mesh, tx)
    step = make_tp_train_step(config, mesh, tx)
    batch, ids, lbl = _batch(mesh, seed=4)

    sp = t5.init_params(jax.random.PRNGKey(0), config)
    ref_loss = float(t5.forward(config, sp, input_ids=ids, labels=lbl)["loss"])
    _, _, metrics = step(params, opt_state, batch, None)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss,
                               rtol=5e-4, atol=5e-4)


def test_tensor_sharded_kv_decode():
    """North-star serving shape: weights AND KV caches head-sharded over the
    tensor axis; step logits (vocab-sharded lm_head gathered by shard_map)
    must match unsharded decode."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from flasht5_tpu.inference import kv_cache
    from flasht5_tpu.parallel.sharding import param_pspecs, param_shardings

    config = tiny_config()
    tp_config = config.replace(tp_axis="tensor")
    mesh = make_mesh(1, 4)  # 4 heads -> at most 4-way head sharding
    sp = t5.init_params(jax.random.PRNGKey(0), config)
    pspecs = param_pspecs(sp)
    params = jax.device_put(sp, param_shardings(mesh, sp))

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 2, 256)
    dec_in = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 0, 256)

    def sharded_decode(p, ids, dec_in):
        enc = t5.encode(tp_config, p, ids)
        state = kv_cache.init_decode_state(tp_config, p, enc, 5)
        outs = []
        for i in range(5):
            logits, state = kv_cache.decode_step(tp_config, p, state,
                                                 dec_in[:, i])
            outs.append(logits)
        return jnp.stack(outs, axis=1)   # (B, 5, V_local)

    logits_tp = jax.jit(shard_map(
        sharded_decode, mesh=mesh,
        in_specs=(pspecs, P(), P()),
        out_specs=P(None, None, "tensor"),   # gather vocab shards
        check_vma=False))(params, ids, dec_in)

    # unsharded oracle
    enc = t5.encode(config, sp, ids)
    state = kv_cache.init_decode_state(config, sp, enc, 5)
    outs = []
    for i in range(5):
        logits, state = kv_cache.decode_step(config, sp, state, dec_in[:, i])
        outs.append(logits)
    ref = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(logits_tp), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("data,tensor", [(2, 4), (4, 2)])
def test_tp_collective_matmul_matches_single_device(data, tensor):
    """TP step with the ring collective-matmul path (matmul_reducescatter +
    tiled all_gather replacing the blocking psum after row-parallel o/wo)
    must still match the single-device oracle — fwd AND bwd (AD through
    ppermute)."""
    config = tiny_config(use_collective_matmul=True)
    mesh = make_mesh(data, tensor)
    tx = adamw_scale(1e-2, mask=no_decay_mask, stat_axes=tp_stat_axes)
    params, opt_state = tp_train_state(config, mesh, tx)
    step = make_tp_train_step(config, mesh, tx)
    batch, ids, lbl = _batch(mesh, seed=2)

    oracle_cfg = config.replace(use_collective_matmul=False)
    stx = adamw_scale(1e-2, mask=no_decay_mask)
    sp = t5.init_params(jax.random.PRNGKey(0), oracle_cfg)
    s_opt = stx.init(sp)

    @jax.jit
    def sstep(p, o):
        loss, g = jax.value_and_grad(
            lambda pp: t5.forward(oracle_cfg, pp, input_ids=ids,
                                  labels=lbl)["loss"])(p)
        u, o = stx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    for _ in range(2):
        params, opt_state, metrics = step(params, opt_state, batch, None)
        sp, s_opt, sloss = sstep(sp, s_opt)

    np.testing.assert_allclose(float(metrics["loss"]), float(sloss),
                               rtol=1e-4, atol=1e-4)
    tp_wo = np.asarray(jax.device_get(
        params["encoder"]["block"][0]["ff_layer"]["wo"]))
    ref_wo = np.asarray(sp["encoder"]["block"][0]["ff_layer"]["wo"])
    np.testing.assert_allclose(tp_wo, ref_wo, rtol=1e-4, atol=1e-5)
