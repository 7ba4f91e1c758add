"""Sharding tests on the virtual 8-device CPU mesh (the multi-chip testing
strategy the reference lacks entirely — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.parallel import make_mesh, param_pspecs, sharded_train_step


def tiny_config():
    return FlashT5Config(vocab_size=256, d_model=64, d_kv=16, num_heads=4,
                         d_ff=128, num_layers=2, dropout_rate=0.0,
                         attention_scale=1.0, use_fused_crossentropy=False,
                         pad_token_id=0, dtype="float32")


def test_mesh_shapes():
    mesh = make_mesh(data=4, tensor=2)
    assert mesh.shape == {"data": 4, "tensor": 2}
    with pytest.raises(ValueError):
        make_mesh(data=8, tensor=2)


def test_param_pspecs_rules():
    config = tiny_config()
    params = jax.eval_shape(lambda r: t5.init_params(r, config),
                            jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    blk = specs["encoder"]["block"][0]
    assert blk["self_attention_layer"]["self_attention"]["Wq"] == P(None, "tensor")
    assert blk["self_attention_layer"]["self_attention"]["o"] == P("tensor", None)
    assert blk["ff_layer"]["act"]["wi_0"] == P(None, "tensor")
    assert blk["ff_layer"]["wo"] == P("tensor", None)
    assert blk["self_attention_layer"]["layer_norm"]["weight"] == P(None)
    assert specs["lm_head"] == P(None, "tensor")
    assert (blk["self_attention_layer"]["self_attention"]["pe_encoding"]
            ["relative_attention_bias"]) == P(None, "tensor")


@pytest.mark.parametrize("data,tensor", [(8, 1), (4, 2), (2, 4)])
def test_sharded_train_step_runs(data, tensor):
    config = tiny_config()
    mesh = make_mesh(data=data, tensor=tensor)
    b = 2 * data
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, 32), 0, 256)
    lbl = jax.random.randint(jax.random.PRNGKey(1), (b, 16), 1, 256)
    loss = sharded_train_step(config, mesh, ids, lbl)
    assert np.isfinite(float(loss))


def test_sharded_loss_matches_single_device():
    config = tiny_config()
    ids = jax.random.randint(jax.random.PRNGKey(0), (8, 32), 0, 256)
    lbl = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 1, 256)
    loss_sharded = sharded_train_step(config, make_mesh(4, 2), ids, lbl)
    loss_single = sharded_train_step(config, make_mesh(1, 1), ids, lbl)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-4)


def test_xl_shapes_shard_cleanly():
    """FLAN-XL dims (reference configs/flan/fat5-flan-xl.yaml) must divide
    over tensor=4 and 8 under the sharding rules (no ragged shards)."""
    config = FlashT5Config(vocab_size=32128, d_model=2048, d_kv=64,
                           num_heads=32, d_ff=5120, num_layers=24)
    params = jax.eval_shape(lambda r: t5.init_params(r, config),
                            jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    for t in (4, 8):
        for (path, leaf), (_, spec) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(specs)):
            for dim, axis in zip(leaf.shape, tuple(spec) + (None,) * leaf.ndim):
                if axis == "tensor":
                    assert dim % t == 0, (jax.tree_util.keystr(path), dim, t)
