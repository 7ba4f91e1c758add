"""Decomposed collective matmuls: overlap ICI communication with compute.

North-star requirement (BASELINE.json): "ICI collectives overlapped with
dequant-matmul compute". Instead of a blocking collective before/after a
matmul, these run the ring-decomposed forms inside shard_map:

- allgather_matmul:      y = all_gather(x) @ w, computed chunk-by-chunk while
                         `ppermute` rotates x shards around the ring
- matmul_reducescatter:  y_shard = reduce_scatter(x @ w), accumulating partial
                         chunk sums as they travel the ring

XLA schedules each `ppermute` asynchronously against the next chunk's matmul
(async collective permute on ICI), so communication hides behind compute —
the same technique as the hand-written ring kernels in the Pallas guide, at
the XLA level where the latency-hiding scheduler handles the pipelining.
`w` may be a QuantizedTensor: the dequant-matmul is then what overlaps with
the permutes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flasht5_tpu.models.t5 import _matmul


def _ring_perm(axis_size):
    return [(i, (i + 1) % axis_size) for i in range(axis_size)]


def allgather_matmul(x_local: jnp.ndarray, w, axis_name: str) -> jnp.ndarray:
    """y = all_gather(x, axis) @ w with ring overlap.

    x_local: (m/t, k) — this shard's rows; w: (k, n) replicated (or
    QuantizedTensor). Returns the full (m, n) product on every shard.
    """
    t = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    chunk = x_local.shape[0]
    n = w.shape[1]
    out = jnp.zeros((chunk * t, n), x_local.dtype)
    buf = x_local
    for s in range(t):
        src = (idx - s) % t            # whose shard buf currently holds
        piece = _matmul(buf, w)
        out = jax.lax.dynamic_update_slice(out, piece.astype(out.dtype),
                                           (src * chunk, 0))
        if s < t - 1:
            buf = jax.lax.ppermute(buf, axis_name, _ring_perm(t))
    return out


def matmul_reducescatter(x_local: jnp.ndarray, w_local,
                         axis_name: str) -> jnp.ndarray:
    """y_shard = reduce_scatter(x @ w, axis) with ring overlap.

    x_local: (m, k/t) — k-sharded activations; w_local: (k/t, n) — the
    matching row shard of w (or QuantizedTensor). Returns rows
    [idx*m/t, (idx+1)*m/t) of psum(x_local @ w_local), i.e. the row-scattered
    reduction (follow with all_gather, or keep row-sharded downstream).
    """
    t = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    m = x_local.shape[0]
    chunk = m // t
    n = w_local.shape[1]
    acc = jnp.zeros((chunk, n), jnp.float32)
    for s in range(t):
        # the accumulator in hand at step s will, after the remaining
        # (t-1-s) hops, land on rank (idx + t-1-s); compute that rank's chunk
        dest = (idx + t - 1 - s) % t
        rows = jax.lax.dynamic_slice(x_local, (dest * chunk, 0),
                                     (chunk, x_local.shape[1]))
        acc = acc + _matmul(rows, w_local).astype(jnp.float32)
        if s < t - 1:
            acc = jax.lax.ppermute(acc, axis_name, _ring_perm(t))
    return acc.astype(x_local.dtype)
