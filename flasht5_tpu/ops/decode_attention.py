"""Fused batched decode attention over (quantized) KV caches.

North-star serving kernel: chunked single-query attention per batch slot —
INT8 dequant, per-slot length masking, and the optional per-slot T5 bias row
all fused, so the HBM traffic is exactly one read of the cache at its stored
(int8) width. The cache is streamed in L-chunks with online softmax in VMEM
scratch, so arbitrarily long caches fit the VMEM budget (an unchunked
variant OOMed scoped VMEM at L=2048: the fp32 dequant temporaries are
chunk-sized now).

Layout: q (B, H, D); k/v (B, H, L, D) in bf16/fp32 or int8(+scales
(B, H, L, 1)); lengths (B,) valid cache positions; bias (B, H, L) optional.
Forward-only (inference).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flasht5_tpu.runtime import interpret_mode

import os as _os

_NEG_INF = -1e30
_CHUNK = 512


def _decode_mode():
    """Kernel strategy (read at trace time).

    "flat" (default): all heads in ONE pair of MXU matmuls per chunk.
    Scores = q (H, D) @ k_flat^T (D, H*C) with own-head block masking —
    entries outside row h's [h*C, (h+1)*C) block are set to -inf, so the
    online softmax is per-head in place and the zeros outside the block
    make P (H, H*C) @ v_flat (H*C, D) contract each head only against its
    own cache rows. Trades an H-fold MXU-flop overshoot (free: decode is
    bandwidth-bound) for eliminating the 2*H narrow N=1 matvecs per chunk
    whose pipeline latency dominated the "loop" form (~19us/program,
    docs/decode_crossover.json).
    "loop": per-head (C, D) @ (D, 1) matvecs (round-1 form).
    """
    return _os.environ.get("FLASHT5_DECODE_MODE", "flat")


def decode_attention_ref(q, k, v, k_scales=None, v_scales=None,
                         lengths=None, bias=None, *, sm_scale=1.0):
    """jnp oracle. q (B,H,D); k/v (B,H,L,D); returns (B,H,D) in q.dtype."""
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scales is not None:
        kf = kf * k_scales
    if v_scales is not None:
        vf = vf * v_scales
    s = jnp.einsum("bhd,bhld->bhl", q.astype(jnp.float32), kf) * sm_scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if lengths is not None:
        pos = jnp.arange(k.shape[2])
        s = jnp.where(pos[None, None, :] < lengths[:, None, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhl,bhld->bhd", p, vf).astype(q.dtype)


def _kernel(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, o_ref,
            m_scr, l_scr, acc_scr, *,
            sm_scale, chunk, L, quantized, has_bias, has_lengths,
            compute_dtype):
    slot = pl.program_id(0)
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    nh = q_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Per-head MXU matvecs with the dequant scales folded in AFTER the
    # contraction (k scales are per cache row, so (k_int8 @ q) * ks ==
    # (k_int8 * ks) @ q), collapsing dequant from O(C*D) VPU work to O(C).
    # A first version did the whole chunk as a broadcast multiply+reduce over
    # the minor D=64 dim — lane-hostile (half the VPU idle, cross-lane
    # reductions per element) and measured ~6x off the int8-read roofline at
    # L=2048 (docs/decode_crossover.json); the matvec form keeps the O(C*D)
    # math on the MXU. int8 values are exact in bf16, so int8 caches ride
    # the bf16 MXU path.
    q = q_ref[0].astype(jnp.float32)                       # (H, D)
    s_cols = []
    for hh in range(nh):
        sh = jax.lax.dot_general(
            k_ref[0, hh].astype(compute_dtype),
            q[hh][:, None].astype(compute_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (C, 1)
        if quantized:
            sh = sh * ks_ref[0, hh]
        s_cols.append(sh)
    s = jnp.concatenate(s_cols, axis=1) * sm_scale         # (C, H)
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32).T
    pos = j * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    valid = pos < L
    if has_lengths:
        valid = pos < len_ref[slot, 0]
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[...]                                    # (1, H)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)          # (C, H)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_scr[...] = m_new

    pv_rows = []
    for hh in range(nh):
        ph = p[:, hh:hh + 1]
        if quantized:
            ph = ph * vs_ref[0, hh]                        # fold v scales
        pv_rows.append(jax.lax.dot_general(
            ph.astype(compute_dtype),
            v_ref[0, hh].astype(compute_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))           # (1, D)
    pv = jnp.concatenate(pv_rows, axis=0)                  # (H, D)
    acc_scr[...] = acc_scr[...] * alpha.T + pv

    @pl.when(j == n_chunks - 1)
    def _finalize():
        l = l_scr[...].T                                   # (H, 1)
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def _kernel_flat(len_ref, meta_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                 bias_ref, o_ref, m_scr, l_scr, acc_scr, *,
                 sm_scale, chunk, L, quantized, has_bias, has_lengths,
                 compute_dtype):
    """All-heads-fused chunk step; see _decode_mode for the layout story."""
    slot = pl.program_id(0)
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    nh = q_ref.shape[1]
    d = q_ref.shape[2]
    hc = nh * chunk

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(compute_dtype)                     # (H, D)
    k_flat = k_ref[0].astype(compute_dtype).reshape(hc, d)
    s = jax.lax.dot_general(q, k_flat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (H, HC)
    if quantized:
        s = s * ks_ref[0, 0]                               # (1, HC)
    s = s * sm_scale
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)         # (1, HC)

    chead = meta_ref[0:1, :]                               # (1, HC)
    cpos = meta_ref[1:2, :]
    pos = j * chunk + cpos
    valid = pos < L
    if has_lengths:
        valid = pos < len_ref[slot, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (nh, hc), 0)
    own = (chead == row) & valid                           # (H, HC)
    s = jnp.where(own, s, _NEG_INF)

    m_prev = m_scr[...]                                    # (H, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(own, jnp.exp(s - m_new), 0.0)            # (H, HC)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_new

    if quantized:
        p = p * vs_ref[0, 0]
    v_flat = v_ref[0].astype(compute_dtype).reshape(hc, d)
    pv = jax.lax.dot_general(p.astype(compute_dtype), v_flat,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (H, D)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(j == n_chunks - 1)
    def _finalize():
        l = l_scr[...]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def _chunk_major(x, b, h, n_chunks, chunk):
    """(B, H, n_chunks*chunk[, 1]) -> (B, n_chunks, 1, H*chunk): per-chunk
    head-major row layout matching the flat kernel's k_flat flattening."""
    return (x.reshape(b, h, n_chunks, chunk).transpose(0, 2, 1, 3)
            .reshape(b, n_chunks, 1, h * chunk))


def decode_attention(q, k, v, k_scales=None, v_scales=None, lengths=None,
                     bias=None, *, sm_scale: float = 1.0,
                     chunk: int = _CHUNK):
    """Fused decode attention; semantics of decode_attention_ref."""
    b, h, d = q.shape
    L = k.shape[2]
    # round short caches up to a lane-aligned chunk (H*chunk is the flat
    # kernel's lane width; odd L like the engine's max_new+2 would leave it
    # non-128-aligned)
    chunk = min(chunk, ((L + 127) // 128) * 128)
    pad = (-L) % chunk
    if pad:
        widths4 = ((0, 0), (0, 0), (0, pad), (0, 0))
        k = jnp.pad(k, widths4)
        v = jnp.pad(v, widths4)
        if k_scales is not None:
            k_scales = jnp.pad(k_scales, widths4)
            v_scales = jnp.pad(v_scales, widths4)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad)))
    Lp = L + pad
    n_chunks = Lp // chunk
    quantized = k_scales is not None
    has_bias = bias is not None
    has_lengths = lengths is not None

    # int8 is exact in bf16; fp32 caches with fp32 queries keep an fp32 MXU
    # path (multi-pass, but bit-faithful to the oracle)
    if k.dtype == jnp.float32 and q.dtype == jnp.float32:
        compute_dtype = jnp.float32
    else:
        compute_dtype = jnp.bfloat16

    if _decode_mode() == "flat":
        hc = h * chunk
        meta = jnp.stack([
            jnp.repeat(jnp.arange(h, dtype=jnp.int32), chunk),
            jnp.tile(jnp.arange(chunk, dtype=jnp.int32), h)])   # (2, HC)
        dummy4 = jnp.zeros((1, 1, 1, 1), jnp.float32)
        inputs = [
            (lengths.reshape(b, 1).astype(jnp.int32) if has_lengths
             else jnp.zeros((b, 1), jnp.int32)),
            meta, q, k, v,
            (_chunk_major(k_scales, b, h, n_chunks, chunk)
             if quantized else dummy4),
            (_chunk_major(v_scales, b, h, n_chunks, chunk)
             if quantized else dummy4),
            (_chunk_major(bias, b, h, n_chunks, chunk)
             if has_bias else dummy4),
        ]

        def _row_spec(on):
            if not on:
                return pl.BlockSpec((1, 1, 1, 1), lambda i, j: (0, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((1, 1, 1, hc), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2, hc), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, chunk, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, chunk, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(quantized),
            _row_spec(quantized),
            _row_spec(has_bias),
        ]
        kern = functools.partial(
            _kernel_flat, sm_scale=sm_scale, chunk=chunk, L=L,
            quantized=quantized, has_bias=has_bias, has_lengths=has_lengths,
            compute_dtype=compute_dtype)
        return pl.pallas_call(
            kern, grid=(b, n_chunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, d), jnp.float32),
            ],
            interpret=interpret_mode(),
        )(*inputs)

    dummy2 = jnp.zeros((1, 1, 1, 1), jnp.float32)
    dummy_bias = jnp.zeros((1, 1, 1), jnp.float32)
    inputs = [
        (lengths.reshape(b, 1).astype(jnp.int32) if has_lengths
         else jnp.zeros((b, 1), jnp.int32)),
        q,
        k,
        v,
        k_scales if quantized else dummy2,
        v_scales if quantized else dummy2,
        bias if has_bias else dummy_bias,
    ]
    in_specs = [
        # full (B, 1) table in SMEM (per-slot blocks violate Mosaic's
        # block-shape rule); the kernel indexes it by program id
        pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, chunk, d), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, chunk, d), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, h, chunk, 1), lambda i, j: (i, 0, j, 0),
                      memory_space=pltpu.VMEM)
         if quantized else
         pl.BlockSpec((1, 1, 1, 1), lambda i, j: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)),
        (pl.BlockSpec((1, h, chunk, 1), lambda i, j: (i, 0, j, 0),
                      memory_space=pltpu.VMEM)
         if quantized else
         pl.BlockSpec((1, 1, 1, 1), lambda i, j: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)),
        (pl.BlockSpec((1, h, chunk), lambda i, j: (i, 0, j),
                      memory_space=pltpu.VMEM)
         if has_bias else
         pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                      memory_space=pltpu.VMEM)),
    ]
    kern = functools.partial(_kernel, sm_scale=sm_scale, chunk=chunk, L=L,
                             quantized=quantized, has_bias=has_bias,
                             has_lengths=has_lengths,
                             compute_dtype=compute_dtype)
    return pl.pallas_call(
        kern, grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(*inputs)
