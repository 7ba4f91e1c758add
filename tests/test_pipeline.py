"""Pipeline parallelism: pipelined block stack must match the sequential
stack exactly, forward and backward, on the virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.parallel.pipeline import pipeline_apply


def _mesh(n):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, ("pipe",))


def _setup(n_layers=8, d=32, seed=0):
    config = FlashT5Config(vocab_size=64, d_model=d, d_kv=8, num_heads=4,
                           d_ff=64, num_layers=n_layers, dropout_rate=0.0,
                           attention_scale=1.0, dtype="float32")
    params = t5.init_params(jax.random.PRNGKey(seed), config)
    # homogeneous segment: encoder blocks 1..N-1 (no pe_encoding), stacked
    blocks = params["encoder"]["block"][1:]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return config, blocks, stacked


def _block_fn(config):
    def f(bp, x):
        y, _, _ = t5._block_apply(config, bp, x, is_decoder=False,
                                  has_pe=False, rng=None, deterministic=True)
        return y

    return f


@pytest.mark.parametrize("stages,n_mb", [(4, 4), (2, 6), (1, 3)])
def test_pipeline_matches_sequential(stages, n_mb):
    config, blocks, stacked = _setup(n_layers=1 + 4 * 2)  # 8 homogeneous
    mesh = _mesh(stages)
    fn = _block_fn(config)

    mb, T, D = 2, 8, config.d_model
    x = jax.random.normal(jax.random.PRNGKey(1), (n_mb, mb, T, D))

    piped = jax.jit(shard_map(
        lambda sp, xx: pipeline_apply(fn, sp, xx, "pipe"),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pipe"), stacked), P()),
        out_specs=P(), check_vma=False))(stacked, x)

    # sequential oracle
    seq = x
    for bp in blocks:
        seq = jnp.stack([fn(bp, seq[i]) for i in range(n_mb)])
    np.testing.assert_allclose(np.asarray(piped), np.asarray(seq),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_backward():
    config, blocks, stacked = _setup(n_layers=5)  # 4 homogeneous
    mesh = _mesh(4)
    fn = _block_fn(config)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 2, 8, config.d_model))

    def piped_loss(sp, xx):
        out = pipeline_apply(fn, sp, xx, "pipe")
        return jnp.sum(out ** 2) / jax.lax.axis_size("pipe")

    g_piped = jax.jit(shard_map(
        lambda sp, xx: jax.grad(piped_loss, argnums=1)(sp, xx),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pipe"), stacked), P()),
        out_specs=P(), check_vma=False))(stacked, x)

    def seq_loss(xx):
        h = xx
        for bp in blocks:
            h = jnp.stack([fn(bp, h[i]) for i in range(4)])
        return jnp.sum(h ** 2)

    g_seq = jax.grad(seq_loss)(x)
    np.testing.assert_allclose(np.asarray(g_piped), np.asarray(g_seq),
                               atol=1e-4, rtol=1e-4)
