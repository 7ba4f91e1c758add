"""Positional-encoding parity vs the reference math (semantics pinned by
src/utils/positional_encoding.py; bucket values cross-checked against a
direct numpy port of the Mesh-TF spec)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu import positional


def _bucket_numpy(rel, bidirectional, num_buckets, max_distance):
    """Direct numpy transcription of the documented bucketing spec."""
    rel = np.asarray(rel, np.int64)
    out = np.zeros_like(rel)
    if bidirectional:
        num_buckets //= 2
        out += (rel > 0).astype(np.int64) * num_buckets
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel, 1) / max_exact) / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    out += np.where(is_small, rel, large)
    return out


@pytest.mark.parametrize("bidirectional", [True, False])
@pytest.mark.parametrize("num_buckets,max_distance", [(32, 128), (16, 64)])
def test_bucket_matches_spec(bidirectional, num_buckets, max_distance):
    rel = np.arange(-300, 300).reshape(2, -1)
    got = positional.relative_position_bucket(
        jnp.asarray(rel), bidirectional=bidirectional,
        num_buckets=num_buckets, max_distance=max_distance)
    want = _bucket_numpy(rel, bidirectional, num_buckets, max_distance)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(np.asarray(got).max()) < num_buckets
    assert int(np.asarray(got).min()) >= 0


def test_t5_bias_shape_and_sharing():
    params = positional.init_relative_bias_params(jax.random.PRNGKey(0), 32, 8)
    bias = positional.t5_relative_bias(params, 16, 24, bidirectional=True)
    assert bias.shape == (1, 8, 16, 24)
    # same relative offset -> same bias value per head
    b = np.asarray(bias)[0, 0]
    assert np.allclose(b[0, 5], b[3, 8])


def test_alibi_symetric_values():
    bias = positional.alibi_bias(8, 10, 10, mode="symetric")
    b = np.asarray(bias)
    assert b.shape == (1, 8, 10, 10)
    slopes = positional.alibi_slopes(8)
    # bias[h, i, j] = -slope_h * |i - j|
    assert np.allclose(b[0, 2, 3, 7], -slopes[2] * 4, atol=1e-6)
    assert np.allclose(np.diagonal(b[0, 0]), 0.0)


def test_alibi_asymetric_masks():
    bias = positional.alibi_bias(4, 6, 6, mode="asymetric")
    b = np.asarray(bias)
    # first half heads: future masked; second half: past masked
    assert np.isneginf(b[0, 0, 0, 5])
    assert np.isfinite(b[0, 0, 5, 0])
    assert np.isneginf(b[0, 3, 5, 0])
    assert np.isfinite(b[0, 3, 0, 5])


def test_rope_roundtrip_preserves_norm():
    cos, sin, ck, sk = positional.rope_cos_sin(16, 64)
    assert ck is None
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4, 64))
    y = positional.apply_rotary(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(x), axis=-1),
                               np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-5)
    # relative property: <q_i rot, k_j rot> depends only on i - j
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 1, 64))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 1, 64))
    qr = np.asarray(positional.apply_rotary(q, cos, sin))[0, :, 0]
    kr = np.asarray(positional.apply_rotary(k, cos, sin))[0, :, 0]
    # same offset (i-j = 2)
    d1 = np.dot(qr[5], kr[3])
    q2 = np.asarray(positional.apply_rotary(jnp.roll(q, 4, axis=1), cos, sin))[0, :, 0]
    # rolling content changes values; just check rotation at equal offsets of
    # identical content: rotate content placed at positions (5,3) vs (9,7)
    qq = np.zeros((1, 16, 1, 64), np.float32)
    kk = np.zeros((1, 16, 1, 64), np.float32)
    qq[0, 5, 0] = np.asarray(q)[0, 0, 0]
    qq[0, 9, 0] = np.asarray(q)[0, 0, 0]
    kk[0, 3, 0] = np.asarray(k)[0, 0, 0]
    kk[0, 7, 0] = np.asarray(k)[0, 0, 0]
    qqr = np.asarray(positional.apply_rotary(jnp.asarray(qq), cos, sin))[0, :, 0]
    kkr = np.asarray(positional.apply_rotary(jnp.asarray(kk), cos, sin))[0, :, 0]
    np.testing.assert_allclose(np.dot(qqr[5], kkr[3]), np.dot(qqr[9], kkr[7]),
                               rtol=1e-5)


def test_rope_interleaved_and_fraction():
    cos, sin, _, _ = positional.rope_cos_sin(8, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 64))
    y = positional.apply_rotary(x, cos, sin, interleaved=True)
    assert y.shape == x.shape
    # pass-through part untouched (rotary_dim=32 < head_dim=64)
    np.testing.assert_allclose(np.asarray(y)[..., 32:], np.asarray(x)[..., 32:])


def test_fire_bias():
    params = positional.init_fire_params(jax.random.PRNGKey(0), num_heads=4,
                                         mlp_width=8, init_L=64.0)
    bias = positional.fire_bias(params, 12)
    assert bias.shape == (1, 4, 12, 12)
    assert np.isfinite(np.asarray(bias)).all()


def test_randomized_positions_rooted():
    pos = positional._randomized_positions(jax.random.PRNGKey(3), 10, 100)
    p = np.asarray(pos)
    assert p[0] == 0
    assert (np.diff(p[1:]) > 0).all()
    assert p.max() < 100
