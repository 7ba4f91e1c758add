"""Fused RMSNorm vs jnp oracle (test strategy per reference
tests/layer_norm_triton/test_layer_norm.py: dtypes incl. fp32, odd batch
sizes, multiple model dims; fwd + input-grad + weight-grad)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.ops.rmsnorm import rms_norm, rms_norm_ref


@pytest.mark.parametrize("rows", [32, 37, 1024])
@pytest.mark.parametrize("d", [768, 1024])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rmsnorm_forward(rows, d, dtype):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (rows, d), jnp.float32).astype(dtype)
    w = (1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (d,), jnp.float32)).astype(dtype)
    out = rms_norm(x, w)
    ref = rms_norm_ref(x, w)
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=atol, rtol=1e-2)


@pytest.mark.parametrize("rows,d", [(64, 768), (33, 512)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rmsnorm_grads(rows, d, dtype):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (rows, d), jnp.float32).astype(dtype)
    w = (1.0 + 0.1 * jax.random.normal(k2, (d,), jnp.float32)).astype(dtype)
    dy = jax.random.normal(k3, (rows, d), jnp.float32).astype(dtype)

    def f_fused(x, w):
        return jnp.sum(rms_norm(x, w).astype(jnp.float32) * dy.astype(jnp.float32))

    def f_ref(x, w):
        return jnp.sum(rms_norm_ref(x, w).astype(jnp.float32) * dy.astype(jnp.float32))

    gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
    atol = 1e-4 if dtype == jnp.float32 else 1e-1
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(rx, np.float32), atol=atol, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gw, np.float32),
                               np.asarray(rw, np.float32), atol=atol * 10, rtol=5e-2)
