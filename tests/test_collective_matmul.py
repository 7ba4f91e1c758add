"""Ring-decomposed collective matmuls vs blocking-collective oracles on the
8-device CPU mesh (incl. the INT8 dequant-matmul overlap case)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from flasht5_tpu.ops.quant import quantize_int8
from flasht5_tpu.parallel import make_mesh
from flasht5_tpu.parallel.collective_matmul import (
    allgather_matmul,
    matmul_reducescatter,
)


def test_allgather_matmul():
    mesh = make_mesh(1, 8)
    m, k, n = 64, 32, 48
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 0.1

    f = jax.jit(shard_map(
        lambda xs, ws: allgather_matmul(xs, ws, "tensor"),
        mesh=mesh, in_specs=(P("tensor", None), P(None, None)),
        out_specs=P(None, None), check_vma=False))
    out = f(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w),
                               atol=1e-5, rtol=1e-5)


def test_matmul_reducescatter():
    mesh = make_mesh(1, 8)
    m, k, n = 64, 256, 48
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 0.1

    f = jax.jit(shard_map(
        lambda xs, ws: matmul_reducescatter(xs, ws, "tensor"),
        mesh=mesh, in_specs=(P(None, "tensor"), P("tensor", None)),
        out_specs=P("tensor", None), check_vma=False))
    out = f(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w),
                               atol=1e-4, rtol=1e-4)


def test_allgather_matmul_quantized():
    """The overlap composes with INT8 weight-only dequant (the north-star
    'collectives overlapped with dequant-matmul')."""
    mesh = make_mesh(1, 8)
    m, k, n = 64, 512, 512
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 0.05
    qw = quantize_int8(w)

    f = jax.jit(shard_map(
        lambda xs: allgather_matmul(xs, qw, "tensor"),
        mesh=mesh, in_specs=(P("tensor", None),),
        out_specs=P(None, None), check_vma=False))
    out = f(x)
    from flasht5_tpu.ops.quant import quant_matmul_ref
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(quant_matmul_ref(x, qw)),
                               atol=3e-2, rtol=1e-2)
