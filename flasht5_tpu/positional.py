"""Positional encodings: T5 relative bias, ALiBi, RoPE, FIRE.

Re-implements the four positional-encoding families of the reference
(src/utils/positional_encoding.py:10,113,205,341) as pure functions over
explicit parameter pytrees. All bias-producing families return a
`(1, num_heads, q_len, k_len)` additive attention bias; RoPE instead rotates
q/k and returns no bias (reference: positional_encoding.py:339).

TPU notes: bias construction is plain jnp (XLA fuses gather+arith); the
linear-memory path that computes the T5 bucketed bias *inside* the attention
kernel lives in ops/flash_attention_rpe.py and reuses
`relative_position_bucket` for its tile-level index math.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# T5 relative position bias
# ---------------------------------------------------------------------------

def relative_position_bucket(
    relative_position: jnp.ndarray,
    *,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """Map relative positions (k_pos - q_pos) to bucket indices.

    Log-bucketing scheme of Mesh-TF / T5 (reference spec:
    positional_encoding.py:26-71): half the buckets cover exact small offsets,
    the other half are logarithmic up to max_distance; bidirectional attention
    splits buckets between positive and negative offsets.
    """
    relative_position = relative_position.astype(jnp.int32)
    relative_buckets = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(jnp.int32) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(relative_position, 0)
    # relative_position is now in [0, inf)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact

    rp_f = jnp.maximum(relative_position.astype(jnp.float32), 1.0)
    relative_position_if_large = max_exact + (
        jnp.log(rp_f / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    relative_position_if_large = jnp.minimum(relative_position_if_large, num_buckets - 1)

    relative_buckets += jnp.where(is_small, relative_position, relative_position_if_large)
    return relative_buckets


def init_relative_bias_params(rng, num_buckets: int, num_heads: int,
                              initializer_factor: float = 1.0,
                              d_model: int = 512,
                              dtype=jnp.float32) -> dict:
    # T5 init for relative_attention_bias: normal(0, factor * d_model**-0.5)
    # (reference: modeling_flash_t5.py:489-490).
    std = initializer_factor * (d_model ** -0.5)
    w = jax.random.normal(rng, (num_buckets, num_heads), dtype=jnp.float32) * std
    return {"relative_attention_bias": w.astype(dtype)}


def _randomized_positions(rng, length: int, max_length: int) -> jnp.ndarray:
    """Sorted random subsample of [0, max_length), first element pinned to 0.

    Length-generalization trick (reference: positional_encoding.py:78-87).
    """
    perm = jax.random.permutation(rng, max_length)[:length]
    pos = jnp.sort(perm)
    return pos.at[0].set(0)


def t5_relative_bias(
    params: dict,
    q_len: int,
    k_len: int,
    *,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
    dtype=jnp.float32,
    q_positions: Optional[jnp.ndarray] = None,
    k_positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Build the `(1, H, q_len, k_len)` T5 bias from bucket embeddings.

    `q_positions`/`k_positions` override the default arange (used for
    randomized-position training and for KV-cache decode where the query
    occupies absolute position `t`).
    """
    if q_positions is None:
        q_positions = jnp.arange(q_len, dtype=jnp.int32)
    if k_positions is None:
        k_positions = jnp.arange(k_len, dtype=jnp.int32)
    relative_position = k_positions[None, :] - q_positions[:, None]
    buckets = relative_position_bucket(
        relative_position, bidirectional=bidirectional,
        num_buckets=num_buckets, max_distance=max_distance)
    values = jnp.take(params["relative_attention_bias"], buckets, axis=0)
    # (M, N, H) -> (1, H, M, N)
    return jnp.transpose(values, (2, 0, 1))[None].astype(dtype)


# ---------------------------------------------------------------------------
# ALiBi
# ---------------------------------------------------------------------------

def alibi_slopes(num_heads: int) -> np.ndarray:
    """Per-head geometric slopes; non-power-of-two head counts use the
    interleaved workaround from the ALiBi paper (reference spec:
    positional_encoding.py:131-142)."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        return np.asarray(pow2_slopes(num_heads), dtype=np.float32)
    closest = 2 ** math.floor(math.log2(num_heads))
    extra = pow2_slopes(2 * closest)[0::2][: num_heads - closest]
    return np.asarray(pow2_slopes(closest) + extra, dtype=np.float32)


def alibi_bias(
    num_heads: int,
    q_len: int,
    k_len: int,
    *,
    mode: str = "symetric",
    dtype=jnp.float32,
    q_positions: Optional[jnp.ndarray] = None,
    k_positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ALiBi additive bias `(1, H, q_len, k_len)`.

    symetric: -slope * |k - q| for every head.
    asymetric: first half of heads sees only the past (future masked -inf),
    second half only the future — head-split directionality
    (reference spec: positional_encoding.py:144-173).
    """
    if q_positions is None:
        q_positions = jnp.arange(q_len, dtype=jnp.int32)
    if k_positions is None:
        k_positions = jnp.arange(k_len, dtype=jnp.int32)
    rel = (k_positions[None, :] - q_positions[:, None]).astype(jnp.float32)
    dist = jnp.abs(rel)

    if mode == "symetric":
        slopes = jnp.asarray(alibi_slopes(num_heads))
        bias = -slopes[:, None, None] * dist[None]
        return bias[None].astype(dtype)
    elif mode == "asymetric":
        half = num_heads // 2
        slopes = jnp.asarray(alibi_slopes(half))
        base = -slopes[:, None, None] * dist[None]          # (half, M, N)
        neg_inf = jnp.float32(float("-inf"))
        mask_right = jnp.where(rel > 0, neg_inf, 0.0)       # no future
        mask_left = jnp.where(rel < 0, neg_inf, 0.0)        # no past
        bias = jnp.concatenate(
            [base + mask_right[None], base + mask_left[None]], axis=0)
        return bias[None].astype(dtype)
    raise ValueError(f"ALiBi mode {mode!r} is not implemented")


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(
    seq_len: int,
    rotary_dim: int,
    *,
    base: float = 10000.0,
    scale_base: Optional[float] = None,
    dtype=jnp.float32,
    offset: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """fp32 cos/sin tables `(seq_len, rotary_dim//2)`.

    With xPos-style `scale_base`, returns separately scaled (cos,sin) for q and
    (cos_k,sin_k) for k (reference spec: positional_encoding.py:264-279);
    otherwise the k tables are None and q tables apply to both.
    """
    half = rotary_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    t = jnp.arange(offset, offset + seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if scale_base is None:
        return cos.astype(dtype), sin.astype(dtype), None, None
    scale_vec = (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) + 0.4 * rotary_dim) / (1.4 * rotary_dim)
    power = (t - seq_len // 2) / scale_base
    scale = scale_vec[None, :] ** power[:, None]
    return ((cos * scale).astype(dtype), (sin * scale).astype(dtype),
            (cos / scale).astype(dtype), (sin / scale).astype(dtype))


def gather_rope_tables(tables, positions: jnp.ndarray):
    """Index (cos, sin, cos_k, sin_k) tables at explicit integer positions.

    Used for randomized-position RoPE training: the tables span
    `max_sequence_length` rows and `positions` is a sorted random subsample
    (the reference *threads* `randomized_position` into its rotary encoder —
    modeling_flash_t5.py:218-220, positional_encoding.py:212-217 — but its
    forward never consumes the flag; this implements the intended semantics,
    mirroring what the bias PEs do at positional_encoding.py:78-87).
    Also used for KV-cache decode where the query sits at absolute step t.
    """
    return tuple(None if t is None else jnp.take(t, positions, axis=0)
                 for t in tables)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                 *, interleaved: bool = False) -> jnp.ndarray:
    """Rotate the leading `2*cos.shape[-1]` features of x.

    x: (..., seq, heads, head_dim); cos/sin: (seq, rotary_dim//2).
    Matches flash_attn rotary semantics (non-interleaved: split halves;
    interleaved: even/odd pairs); extra head_dim features pass through.
    """
    half = cos.shape[-1]
    rot_dim = 2 * half
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    cos = cos[:, None, :]  # (seq, 1, half) broadcasting over heads
    sin = sin[:, None, :]
    if interleaved:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
    else:
        x1 = x_rot[..., :half]
        x2 = x_rot[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([out, x_pass], axis=-1).astype(x.dtype) if x_pass.size else out.astype(x.dtype)


# ---------------------------------------------------------------------------
# FIRE
# ---------------------------------------------------------------------------

def init_fire_params(rng, num_heads: int, mlp_width: int = 32,
                     init_c: float = 0.1, init_L: float = 128.0,
                     dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    # torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    lim1 = 1.0
    lim2 = 1.0 / math.sqrt(mlp_width)
    return {
        "mlp": {
            "w1": jax.random.uniform(k1, (1, mlp_width), jnp.float32, -lim1, lim1).astype(dtype),
            "b1": jnp.zeros((mlp_width,), dtype),
            "w2": jax.random.uniform(k2, (mlp_width, num_heads), jnp.float32, -lim2, lim2).astype(dtype),
            "b2": jnp.zeros((num_heads,), dtype),
        },
        "c": jnp.asarray(init_c, dtype),
        "L_multiplier": jnp.asarray(1.0, dtype),
        "init_L": jnp.asarray(init_L, dtype),  # frozen (no grad) by optimizer mask
    }


def fire_bias(params: dict, seq_len: int, *, eps: float = 1e-6,
              dtype=jnp.float32) -> jnp.ndarray:
    """FIRE functional relative bias `(1, H, seq, seq)`.

    mlp(log-transformed, progressively-normalized relative distance)
    (reference spec: positional_encoding.py:375-411).
    """
    positions = jnp.arange(seq_len, dtype=jnp.float32)
    rel = positions[:, None] - positions[None, :]
    c = params["c"].astype(jnp.float32)
    threshold = jnp.abs(params["L_multiplier"].astype(jnp.float32) *
                        params["init_L"].astype(jnp.float32))
    pos_norm = jnp.maximum(positions, threshold)[:, None]
    rel_t = jnp.sign(rel) * jnp.log(jnp.abs(c * rel) + 1.0)
    norm_t = jnp.log(jnp.abs(c * pos_norm) + 1.0) + eps
    x = (rel_t / norm_t)[..., None]                       # (M, N, 1)
    mlp = params["mlp"]
    h = jax.nn.relu(x @ mlp["w1"].astype(jnp.float32) + mlp["b1"].astype(jnp.float32))
    out = h @ mlp["w2"].astype(jnp.float32) + mlp["b2"].astype(jnp.float32)  # (M, N, H)
    return jnp.transpose(out, (2, 0, 1))[None].astype(dtype)
