"""Fused decode attention vs jnp oracle (bf16 + int8 caches, length masks,
per-slot bias rows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.ops.decode_attention import decode_attention, decode_attention_ref
from flasht5_tpu.ops.quant import quantize_kv


def _data(b=4, h=4, L=64, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, L, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, L, d), jnp.float32)
    bias = jax.random.normal(ks[3], (b, h, L), jnp.float32) * 0.3
    lengths = jnp.array([L, L // 2, 3, L - 7][:b])
    return q, k, v, bias, lengths


def test_plain():
    q, k, v, bias, lengths = _data()
    out = decode_attention(q, k, v, sm_scale=0.25)
    ref = decode_attention_ref(q, k, v, sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_lengths_and_bias():
    q, k, v, bias, lengths = _data()
    out = decode_attention(q, k, v, lengths=lengths, bias=bias, sm_scale=0.25)
    ref = decode_attention_ref(q, k, v, lengths=lengths, bias=bias,
                               sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_int8_cache():
    q, k, v, bias, lengths = _data(seed=1)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    out = decode_attention(q, kq, vq, k_scales=ks, v_scales=vs,
                           lengths=lengths, bias=bias, sm_scale=0.25)
    ref = decode_attention_ref(q, kq, vq, k_scales=ks, v_scales=vs,
                               lengths=lengths, bias=bias, sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)
    # and the quantized result tracks the fp cache closely
    full = decode_attention_ref(q, k, v, lengths=lengths, bias=bias,
                                sm_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=5e-2,
                               rtol=5e-2)


def test_long_cache_chunked():
    """Caches longer than one chunk stream with online softmax."""
    q, k, v, bias, _ = _data(b=2, h=2, L=1200, d=32, seed=2)
    lengths = jnp.array([1200, 700])
    out = decode_attention(q, k, v, lengths=lengths, bias=bias,
                           sm_scale=0.2, chunk=256)
    ref = decode_attention_ref(q, k, v, lengths=lengths, bias=bias,
                               sm_scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


@pytest.mark.parametrize("L", [1, 66])
def test_odd_short_caches(L):
    """Non-lane-aligned cache lengths (engine's max_new+2 case): the flat
    kernel rounds the chunk up to 128 and masks the padding."""
    q, k, v, bias, _ = _data(b=3, h=4, L=L, d=32, seed=3)
    lengths = jnp.array([L, max(1, L // 2), 1])
    out = decode_attention(q, k, v, lengths=lengths, bias=bias, sm_scale=0.2)
    ref = decode_attention_ref(q, k, v, lengths=lengths, bias=bias,
                               sm_scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)
