"""Pallas flash attention vs jnp oracle.

Adopts the reference's tolerance pattern (tests/fa2_triton/test_fa2_bias.py:22-28):
compare the kernel against the fp32-upcast oracle and require its error to be
within 2x the error of the low-precision oracle (+ eps). Parametrized over
non-equal M != N and non-divisible sizes, causal on/off, bias broadcast
shapes, and the bias gradient.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.ops.attn_ref import attn_ref
from flasht5_tpu.ops.flash_attention import flash_attention


def _inputs(b, h, m, n, d, dtype, bias_shape=None, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, m, d), jnp.float32).astype(dtype)
    k = jax.random.normal(ks[1], (b, h, n, d), jnp.float32).astype(dtype)
    v = jax.random.normal(ks[2], (b, h, n, d), jnp.float32).astype(dtype)
    bias = None
    if bias_shape is not None:
        bias = jax.random.normal(ks[3], bias_shape, jnp.float32).astype(dtype)
    return q, k, v, bias


def _check(out, q, k, v, bias, causal, scale, dtype):
    """reference tolerance pattern: |kernel - ref32| <= 2|ref_lp - ref32| + eps"""
    ref32 = attn_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                     v.astype(jnp.float32),
                     None if bias is None else bias.astype(jnp.float32),
                     sm_scale=scale, causal=causal)
    ref_lp = attn_ref(q, k, v, bias, sm_scale=scale, causal=causal, upcast=False)
    err_kernel = np.abs(np.asarray(out, np.float32) - np.asarray(ref32, np.float32)).max()
    err_lp = np.abs(np.asarray(ref_lp, np.float32) - np.asarray(ref32, np.float32)).max()
    assert err_kernel <= 2 * err_lp + 1e-4, (err_kernel, err_lp)


@pytest.mark.parametrize("m,n", [(128, 128), (256, 128), (133, 256), (612, 300)])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fa_forward_nobias(m, n, causal, dtype):
    q, k, v, _ = _inputs(2, 3, m, n, 64, dtype)
    scale = 0.25
    out = flash_attention(q, k, v, causal=causal, sm_scale=scale)
    _check(out, q, k, v, None, causal, scale, dtype)


@pytest.mark.parametrize("bias_kind", ["full", "bh1", "b11"])
@pytest.mark.parametrize("m,n", [(128, 128), (200, 135)])
@pytest.mark.parametrize("causal", [False, True])
def test_fa_forward_bias(bias_kind, m, n, causal):
    b, h = 2, 3
    shape = {"full": (b, h, m, n), "bh1": (1, h, m, n), "b11": (1, 1, m, n)}[bias_kind]
    q, k, v, bias = _inputs(b, h, m, n, 64, jnp.float32, shape)
    scale = 0.3
    out = flash_attention(q, k, v, bias, causal=causal, sm_scale=scale)
    _check(out, q, k, v, bias, causal, scale, jnp.float32)


@pytest.mark.parametrize("m,n", [(128, 128), (160, 288)])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("bias_kind", [None, "full", "1h"])
def test_fa_backward(m, n, causal, bias_kind):
    b, h, d = 2, 2, 64
    shape = None if bias_kind is None else (
        (b, h, m, n) if bias_kind == "full" else (1, h, m, n))
    q, k, v, bias = _inputs(b, h, m, n, d, jnp.float32, shape)
    scale = 0.25
    dout = jax.random.normal(jax.random.PRNGKey(7), (b, h, m, d), jnp.float32)

    if bias is None:
        def f_kernel(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=causal, sm_scale=scale) * dout)

        def f_ref(q, k, v):
            return jnp.sum(attn_ref(q, k, v, sm_scale=scale, causal=causal) * dout)

        gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    else:
        def f_kernel(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias, causal=causal, sm_scale=scale) * dout)

        def f_ref(q, k, v, bias):
            return jnp.sum(attn_ref(q, k, v, bias, sm_scale=scale, causal=causal) * dout)

        gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)

    for a, r, name in zip(gk, gr, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-3,
                                   rtol=1e-2, err_msg=name)


def test_fa_decode_shape():
    # M=1 decode-style query against a long key set
    q, k, v, _ = _inputs(2, 4, 1, 256, 64, jnp.float32)
    out = flash_attention(q, k, v, causal=False, sm_scale=1.0)
    _check(out, q, k, v, None, False, 1.0, jnp.float32)


@pytest.mark.parametrize("causal,m,n", [(False, 128, 128), (True, 128, 128),
                                        (False, 96, 160), (True, 70, 133)])
def test_bfold_nobias_matches_default(monkeypatch, causal, m, n):
    """The default batch-folded no-bias nj1 kernels (grid (h, i), batch loop
    unrolled in-body) must match the FLASHT5_RPE_BFOLD=0 per-batch kernels:
    output and dq/dk/dv."""
    rng = np.random.default_rng(31)
    q = jnp.asarray(rng.standard_normal((3, 2, m, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 2, n, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 2, n, 64)), jnp.float32)

    def vals_and_grads(q, k, v):
        def loss(q_, k_, v_):
            return jnp.sum(flash_attention(
                q_, k_, v_, None, causal=causal, sm_scale=0.125,
                block_m=128, block_n=256).astype(jnp.float32) ** 2)
        out = flash_attention(q, k, v, None, causal=causal, sm_scale=0.125,
                              block_m=128, block_n=256)
        return (out,) + jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setenv("FLASHT5_RPE_BFOLD", "0")
    ref = vals_and_grads(q, k, v)
    monkeypatch.setenv("FLASHT5_RPE_BFOLD", "1")
    res = vals_and_grads(q, k, v)
    for a, b, name in zip(res, ref, ["o", "dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5, err_msg=name)


@pytest.mark.parametrize("causal,m,n", [(False, 128, 128), (True, 128, 128),
                                        (True, 70, 133)])
def test_exp2_matches_default(monkeypatch, causal, m, n):
    """FLASHT5_EXP2=1 (exp2 on prescaled scores in the batch-folded kernels)
    must match the default exp path: same o and dq/dk/dv up to the one extra
    rounding of the q prescale."""
    rng = np.random.default_rng(57)
    q = jnp.asarray(rng.standard_normal((3, 2, m, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 2, n, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 2, n, 64)), jnp.float32)

    def vals_and_grads(q, k, v):
        def loss(q_, k_, v_):
            return jnp.sum(flash_attention(
                q_, k_, v_, None, causal=causal, sm_scale=0.125,
                block_m=128, block_n=256).astype(jnp.float32) ** 2)
        out = flash_attention(q, k, v, None, causal=causal, sm_scale=0.125,
                              block_m=128, block_n=256)
        return (out,) + jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setenv("FLASHT5_EXP2", "0")
    ref = vals_and_grads(q, k, v)
    monkeypatch.setenv("FLASHT5_EXP2", "1")
    res = vals_and_grads(q, k, v)
    for a, b, name in zip(res, ref, ["o", "dq", "dk", "dv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3, err_msg=name)
