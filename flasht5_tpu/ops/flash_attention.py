"""Pallas TPU flash attention with additive bias (fwd + bwd incl. dbias).

Capability parity with the reference's in-tree Triton FA2-with-bias kernel
(src/model/ops/flash_attention_v2_bias.py): additive bias broadcastable as
(B|1, H|1, M, N), causal masking with bottom-right alignment for M != N,
non-divisible sequence lengths, and a backward pass producing dq, dk, dv and
the bias gradient needed to train relative-position embeddings
(reference: flash_attention_v2_bias.py:91-226).

TPU-first design notes (not a port):
- One q-tile per grid step streams k/v tiles (grid innermost dim) with online
  softmax in fp32; the (BM, BN) score tile never leaves VMEM, so memory is
  linear in sequence length.
- Backward is two kernels: a dk/dv kernel whose (b, h, j)-indexed output tiles
  stay resident in VMEM while the q-dimension is streamed innermost, and a dq
  kernel with the roles swapped. The Pallas TPU grid is sequential per core,
  so resident-block accumulation replaces the reference's atomic/lock
  strategies (flash_attention_v2_bias.py:151-157).
- delta = rowsum(dO * O) is computed by XLA outside the kernels (a fused
  elementwise+reduce), replacing the `_bwd_preprocess` kernel
  (flash_attention_v2_bias.py:516).
- Broadcast-bias gradients ((1,H,M,N) / (1,1,M,N)) are reduced with an XLA sum
  over the full per-batch dbias, mirroring the reference's shipped host-side
  `ds.sum(0)` reduction (flash_attention_v2_bias.py:214-215).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from flasht5_tpu.runtime import interpret_mode

# Measured on v5e (S=1024, D=64): (256, 1024) reaches 173 TFLOPS (88% of
# bf16 peak) vs 34 at (512, 512) — a small q-tile pipelines against a wide
# k-tile (fewer online-softmax rescale rounds, deeper DMA overlap).
DEFAULT_BLOCK_M = 256
DEFAULT_BLOCK_N = 1024
def _round16(x: int) -> int:
    return ((x + 15) // 16) * 16


def _bwd_blocks(block_m, block_n, m_len, n_len):
    # Isolated-kernel sweeps preferred a larger bwd q-tile (512,1024: 65 vs
    # 59 TFLOPS), but the FULL train step measured consistently slower with
    # it (124.3k vs 127.1k tok/s — likely the causal decoder tiles), so bwd
    # reuses the forward tiles.
    return min(block_m, _round16(m_len)), min(block_n, _round16(n_len))
_NEG_INF = -1e30
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _exp2_on():
    """FLASHT5_EXP2=1 (trace-time): compute softmax via exp2 on prescaled
    scores in the batch-folded kernels. q is pre-multiplied by
    sm_scale*log2(e) OUTSIDE the kernel (an (M, D) elementwise op, block_n/D
    times cheaper than per-score work), so the kernel's per-element multiply
    inside exp (TPU lowers exp(x) as exp2(x*log2e)) and the s*sm_scale pass
    both disappear. p values are bit-identical math (exp2((s-m)*log2e) ==
    exp(s-m)); only the q prescale adds one rounding. lse stays natural-log
    at the kernel boundary. Default OFF until the on-chip A/B lands."""
    return _os.environ.get("FLASHT5_EXP2", "0") == "1"


def _compiler_params(dims, vmem_limit_bytes=None):
    # v5e has 128MB VMEM; Mosaic's default scoped limit is 16MB, which a
    # batch-resident accumulator strategy (dk/dv scratch + big KV tiles)
    # legitimately exceeds — callers opt into a higher cap per kernel.
    kw = {}
    if vmem_limit_bytes is not None:
        kw["vmem_limit_bytes"] = vmem_limit_bytes
    try:
        return pltpu.CompilerParams(dimension_semantics=dims, **kw)
    except TypeError:
        return pltpu.CompilerParams(**kw)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *,
                sm_scale: float, causal: bool, m_len: int, n_len: int,
                block_m: int, block_n: int, has_bias: bool,
                full_tile: bool = False):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nb = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # causal: skip k-blocks strictly in the future of every row in this q-block
    offset = n_len - m_len  # bottom-right alignment for M != N
    run = True
    if causal:
        run = j * block_n <= i * block_m + block_m - 1 + offset

    @pl.when(run)
    def _compute():
        # native-dtype (bf16) operands on the MXU, fp32 accumulation
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if sm_scale != 1.0:
            s = s * sm_scale
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)

        if full_tile:
            # statically all-valid tile (non-causal, no padding): the mask
            # iotas/compares/selects are dead work on the VPU — at D=64
            # these kernels are VPU-bound, not MXU-bound, so skipping the
            # masking chain is a first-order win
            m_prev = m_scr[...]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
        else:
            rows = i * block_m + jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 0)
            cols = j * block_n + jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
            mask = cols < n_len
            if causal:
                mask = mask & (cols <= rows + offset)
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_scr[...]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(mask, p, 0.0)

        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(j == nb - 1)
    def _finalize():
        l = l_scr[...]
        if full_tile:
            # every row saw a full softmax: l > 0 is guaranteed
            o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
            lse_ref[0, 0] = m_scr[...] + jnp.log(l)
        else:
            l_safe = jnp.where(l > 0.0, l, 1.0)
            o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
            lse = jnp.where(l > 0.0, m_scr[...] + jnp.log(l_safe), _NEG_INF)
            lse_ref[0, 0] = lse


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _bias_spec(bias_shape, block_m, block_n):
    bb = 0 if bias_shape[0] == 1 else None
    hb = 0 if bias_shape[1] == 1 else None

    def index_map(b, h, i, j):
        return (bb if bb is not None else b, hb if hb is not None else h, i, j)

    return pl.BlockSpec((1, 1, block_m, block_n), index_map, memory_space=pltpu.VMEM)


def _bfold_ok(batch, block_n, d):
    """Default-ON gate for the batch-folded no-bias nj1 kernels: grid (h, i)
    with the batch loop statically unrolled in-body, so Mosaic can interleave
    one batch's softmax VPU work with another's MXU matmuls (same design and
    measurement as flash_attention_rpe._bfold_ok; this module's kernels carry
    the decoder cross-attention). VMEM-budget gated; FLASHT5_RPE_BFOLD=0
    opts out of both modules at once."""
    import os as _os
    if _os.environ.get("FLASHT5_RPE_BFOLD", "1") == "0":
        return False
    return batch * block_n * d * (4 + 4 + 2 + 2) <= 16 * 1024 * 1024


def _fwd_kernel_nj1_bfold(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale,
                          causal, m_len, n_len, block_m, block_n, batch,
                          exp2=False, full_tile=False):
    """Batch-folded single-KV-tile no-bias forward (see _bfold_ok).

    With exp2=True, q arrives pre-scaled by sm_scale*log2e so s is in the
    log2 domain: p = exp2(s - m) == exp(s_nat - m_nat), and only the lse
    boundary value converts back to natural log (see _exp2_on)."""
    i = pl.program_id(1)
    if not full_tile:
        rows = i * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, block_n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
        mask = cols < n_len
        if causal:
            mask = mask & (cols <= rows + (n_len - m_len))
    expf = jnp.exp2 if exp2 else jnp.exp
    lse_mult = _LN2 if exp2 else 1.0
    for b in range(batch):
        s = jax.lax.dot_general(q_ref[b, 0], k_ref[b, 0],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if sm_scale != 1.0 and not exp2:
            s = s * sm_scale
        if full_tile:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = expf(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b, 0],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o_ref[b, 0] = (pv / l).astype(o_ref.dtype)
            lse_ref[b, 0] = m * lse_mult + jnp.log(l)
            continue
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        m_safe = jnp.where(m > _NEG_INF / 2, m, 0.0)
        p = jnp.where(mask, expf(s - m_safe), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        l_safe = jnp.where(l > 0.0, l, 1.0)
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b, 0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[b, 0] = (pv / l_safe).astype(o_ref.dtype)
        lse_ref[b, 0] = jnp.where(l > 0.0, m_safe * lse_mult + jnp.log(l_safe),
                                  _NEG_INF)


def _fwd(q, k, v, bias, causal, sm_scale, block_m, block_n):
    batch, heads, m_len, d = q.shape
    n_len = k.shape[2]
    qp = _pad_to(q, 2, block_m)
    kp = _pad_to(k, 2, block_n)
    vp = _pad_to(v, 2, block_n)
    mp, np_ = qp.shape[2], kp.shape[2]
    has_bias = bias is not None

    if (np_ // block_n == 1 and not has_bias
            and _bfold_ok(batch, block_n, d)):
        exp2 = _exp2_on()
        if exp2:
            qp = (qp * (sm_scale * _LOG2E)).astype(q.dtype)
        o, lse = pl.pallas_call(
            functools.partial(
                _fwd_kernel_nj1_bfold, sm_scale=sm_scale, causal=causal,
                m_len=m_len, n_len=n_len, block_m=block_m, block_n=block_n,
                batch=batch, exp2=exp2,
                full_tile=(not causal and mp == m_len and np_ == n_len)),
            grid=(heads, mp // block_m),
            in_specs=[
                pl.BlockSpec((batch, 1, block_m, d),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((batch, 1, block_m, d),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_m, 1),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(qp.shape, q.dtype),
                jax.ShapeDtypeStruct((batch, heads, mp, 1), jnp.float32),
            ],
            compiler_params=_compiler_params(
                ("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret_mode(),
        )(qp, kp, vp)
        return o[:, :, :m_len], lse[:, :, :m_len, 0]

    inputs = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, 1, block_m, d), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        bp = _pad_to(_pad_to(bias, 2, block_m), 3, block_n)
        inputs.append(bp)
        in_specs.append(_bias_spec(bias.shape, block_m, block_n))
    else:
        inputs.append(jnp.zeros((1, 1, block_m, block_n), q.dtype))
        in_specs.append(pl.BlockSpec((1, 1, block_m, block_n),
                                     lambda b, h, i, j: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))

    grid = (batch, heads, mp // block_m, np_ // block_n)
    kern = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal, m_len=m_len,
        n_len=n_len, block_m=block_m, block_n=block_n, has_bias=has_bias,
        full_tile=(not causal and mp == m_len and np_ == n_len))
    o, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_m, d), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_m, 1), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, heads, mp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, d), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(*inputs)
    return o[:, :, :m_len], lse[:, :, :m_len, 0]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _recompute_p_and_g(q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref,
                       do_ref, *, i, j, sm_scale, causal, m_len, n_len,
                       block_m, block_n, has_bias, full_tile=False):
    """Shared bwd tile math: returns (p, g, q, k, do) in fp32/f32-accum types.

    p: recomputed softmax tile; g = p * (dp - delta) is the gradient of the
    pre-softmax scores S (so dbias = g, dq = g K sm_scale, dk = g^T Q sm_scale).
    With full_tile (non-causal, unpadded — statically known) the mask and
    lse-validity chains are elided: these kernels are VPU-bound at D=64.
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    if has_bias:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    if full_tile:
        p = jnp.exp(s - lse_ref[0, 0])
    else:
        rows = i * block_m + jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 0)
        cols = j * block_n + jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
        mask = (cols < n_len) & (rows < m_len)
        if causal:
            mask = mask & (cols <= rows + (n_len - m_len))

        lse = lse_ref[0, 0]
        lse_ok = lse > _NEG_INF / 2
        lse_safe = jnp.where(lse_ok, lse, 0.0)
        p = jnp.where(mask & lse_ok, jnp.exp(s - lse_safe), 0.0)

    do = do_ref[0, 0]
    v = v_ref[0, 0]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = delta_ref[0, 0]
    g = p * (dp - delta)
    return p, g, q, k, do


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref, do_ref,
                    dk_ref, dv_ref, dbias_ref, *,
                    sm_scale, causal, m_len, n_len, block_m, block_n,
                    has_bias, want_dbias, full_tile=False):
    j = pl.program_id(2)
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    run = True
    if causal:
        run = j * block_n <= i * block_m + block_m - 1 + (n_len - m_len)

    if want_dbias:
        # dbias tile is (b,h,i,j)-addressed: always write (zeros when skipped)
        @pl.when(jnp.logical_not(run))
        def _zero_dbias():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    @pl.when(run)
    def _compute():
        p, g, q, k, do = _recompute_p_and_g(
            q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref, do_ref,
            i=i, j=j, sm_scale=sm_scale, causal=causal, m_len=m_len,
            n_len=n_len, block_m=block_m, block_n=block_n, has_bias=has_bias,
            full_tile=full_tile)
        dv_ref[0, 0] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0, 0] += jax.lax.dot_general(
            g.astype(q_ref.dtype), q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if want_dbias:
            dbias_ref[0, 0] = g.astype(dbias_ref.dtype)


def _bwd_fused_nj1_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref,
                          do_ref, dq_ref, dk_ref, dv_ref, *, sm_scale, causal,
                          m_len, n_len, block_m, block_n, has_bias,
                          full_tile=False):
    """Single-sweep backward for the single-KV-tile case (N fits one block_n),
    grid (b, h, i): p is recomputed ONCE per tile and dq/dk/dv all come from
    it — the two-pass form recomputes the score tile and softmax twice. dk/dv
    output blocks are (b, h)-indexed, constant across the inner i sweep, so
    they accumulate in place (sequential TPU grid). This is the flagship
    decoder cross-attention shape (M=256 queries over N=1024 encoder keys,
    no bias; reference modeling_flash_t5.py:272-291 runs the same kernel for
    self- and cross-attention)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    run = True
    if causal:
        run = 0 <= i * block_m + block_m - 1 + (n_len - m_len)

    @pl.when(run)
    def _compute():
        p, g, q, k, do = _recompute_p_and_g(
            q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref, do_ref,
            i=i, j=0, sm_scale=sm_scale, causal=causal, m_len=m_len,
            n_len=n_len, block_m=block_m, block_n=block_n, has_bias=has_bias,
            full_tile=full_tile)
        dv_ref[0, 0] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0, 0] += jax.lax.dot_general(
            g.astype(q_ref.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dq_ref[0, 0] = (jax.lax.dot_general(
            g.astype(k_ref.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * sm_scale).astype(dq_ref.dtype)

    if causal:
        @pl.when(jnp.logical_not(run))
        def _zero_dq():
            dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])


def _bwd_fused_nj1_bfold_kernel(q_ref, k_ref, v_ref, lse_ref, o_ref,
                                do_ref, dq_ref, dk_ref, dv_ref, *, sm_scale,
                                causal, m_len, n_len, block_m, block_n,
                                batch, exp2=False, full_tile=False):
    """Batch-folded single-KV-tile no-bias fused backward, grid (h, i) with
    the batch loop unrolled in-body (see _bfold_ok). dk/dv output blocks
    index only on h, so they are the across-i accumulators directly.
    delta (sum o*do per row) is fused in-kernel from the o tile — no
    separate XLA preprocess pass (reference _bwd_preprocess,
    flash_attention_v2_bias.py:516)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    run = True
    if causal:
        run = 0 <= i * block_m + block_m - 1 + (n_len - m_len)

    if not full_tile:
        rows = i * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, block_n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
        mask = (cols < n_len) & (rows < m_len)
        if causal:
            mask = mask & (cols <= rows + (n_len - m_len))

    # with exp2, q arrives pre-scaled by sm_scale*log2e, so dk (which
    # contracts against the scaled q) needs ln2 = sm_scale / (sm_scale*log2e)
    # to come out in the natural domain; dq contracts against the UNscaled k
    # and keeps the plain sm_scale. g itself is domain-free (p values are
    # identical; see _exp2_on).
    dk_mult = _LN2 if exp2 else sm_scale
    expf = jnp.exp2 if exp2 else jnp.exp
    lse_mult = _LOG2E if exp2 else 1.0

    @pl.when(run)
    def _compute():
        for b in range(batch):
            q = q_ref[b, 0]
            k = k_ref[b, 0]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if sm_scale != 1.0 and not exp2:
                s = s * sm_scale
            if full_tile:
                p = expf(s - lse_ref[b, 0] * lse_mult)
            else:
                lse = lse_ref[b, 0]
                lse_ok = lse > _NEG_INF / 2
                p = jnp.where(mask & lse_ok,
                              expf(s - jnp.where(lse_ok, lse, 0.0)
                                   * lse_mult), 0.0)
            do = do_ref[b, 0]
            dp = jax.lax.dot_general(do, v_ref[b, 0],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            delta = jnp.sum(o_ref[b, 0].astype(jnp.float32)
                            * do.astype(jnp.float32), axis=-1, keepdims=True)
            g = p * (dp - delta)
            dv_ref[b, 0] += jax.lax.dot_general(
                p.astype(do_ref.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_ref[b, 0] += jax.lax.dot_general(
                g.astype(q_ref.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * dk_mult
            # dq written once: emit in the input dtype (no external cast)
            dq_ref[b, 0] = (jax.lax.dot_general(
                g.astype(k_ref.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                * sm_scale).astype(dq_ref.dtype)

    if causal:
        @pl.when(jnp.logical_not(run))
        def _zero_dq():
            dq_ref[...] = jnp.zeros_like(dq_ref)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref, do_ref,
                   dq_ref, *, sm_scale, causal, m_len, n_len, block_m, block_n,
                   has_bias, full_tile=False):
    i = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    run = True
    if causal:
        run = j * block_n <= i * block_m + block_m - 1 + (n_len - m_len)

    @pl.when(run)
    def _compute():
        p, g, q, k, do = _recompute_p_and_g(
            q_ref, k_ref, v_ref, bias_ref, lse_ref, delta_ref, do_ref,
            i=i, j=j, sm_scale=sm_scale, causal=causal, m_len=m_len,
            n_len=n_len, block_m=block_m, block_n=block_n, has_bias=has_bias,
            full_tile=full_tile)
        dq_ref[0, 0] += jax.lax.dot_general(
            g.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale


def _bwd(q, k, v, bias, causal, sm_scale, block_m, block_n, lse, o, do,
         want_dbias):
    batch, heads, m_len, d = q.shape
    n_len = k.shape[2]
    qp = _pad_to(q, 2, block_m)
    kp = _pad_to(k, 2, block_n)
    vp = _pad_to(v, 2, block_n)
    dop = _pad_to(do, 2, block_m)
    mp, np_ = qp.shape[2], kp.shape[2]

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    deltap = _pad_to(delta, 2, block_m)[..., None]
    lsep = _pad_to(lse, 2, block_m)[..., None]  # padded rows: lse=0 but p masked by rows<m_len

    has_bias = bias is not None
    if has_bias:
        bp = _pad_to(_pad_to(bias, 2, block_m), 3, block_n)
        bias_in = bp
        bias_spec = _bias_spec(bias.shape, block_m, block_n)
    else:
        bias_in = jnp.zeros((1, 1, block_m, block_n), q.dtype)
        bias_spec = pl.BlockSpec((1, 1, block_m, block_n),
                                 lambda b, h, j, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    full_tile = (not causal and mp == m_len and np_ == n_len)

    # single KV tile, no bias at all: batch-folded single-sweep fused kernel
    # (see _bfold_ok; the decoder cross-attention backward lands here)
    if (np_ // block_n == 1 and not has_bias
            and _bfold_ok(batch, block_n, d)):
        exp2 = _exp2_on()
        if exp2:
            qp = (qp * (sm_scale * _LOG2E)).astype(q.dtype)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_fused_nj1_bfold_kernel, sm_scale=sm_scale,
                causal=causal, m_len=m_len, n_len=n_len, block_m=block_m,
                block_n=block_n, batch=batch, exp2=exp2,
                full_tile=full_tile),
            grid=(heads, mp // block_m),
            in_specs=[
                pl.BlockSpec((batch, 1, block_m, d),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_m, 1),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_m, d),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_m, d),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((batch, 1, block_m, d),
                             lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                # dk/dv index only on h: resident across-i accumulators
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(qp.shape, q.dtype),
                jax.ShapeDtypeStruct(kp.shape, jnp.float32),
                jax.ShapeDtypeStruct(vp.shape, jnp.float32),
            ],
            compiler_params=_compiler_params(
                ("arbitrary", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret_mode(),
        )(qp, kp, vp, lsep, _pad_to(o, 2, block_m), dop)
        return (dq[:, :, :m_len].astype(q.dtype),
                dk[:, :, :n_len].astype(k.dtype),
                dv[:, :, :n_len].astype(v.dtype), None)

    # single KV tile and no bias gradient wanted: single-sweep fused kernel
    # (p recomputed once; the two-pass form below recomputes it per pass)
    if np_ // block_n == 1 and not want_dbias:
        if has_bias:
            bb = 0 if bias.shape[0] == 1 else None
            hb = 0 if bias.shape[1] == 1 else None
            bspec3 = pl.BlockSpec(
                (1, 1, block_m, block_n),
                lambda b, h, i: (bb if bb is not None else b,
                                 hb if hb is not None else h, i, 0),
                memory_space=pltpu.VMEM)
        else:
            bspec3 = pl.BlockSpec((1, 1, block_m, block_n),
                                  lambda b, h, i: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_fused_nj1_kernel, sm_scale=sm_scale, causal=causal,
                m_len=m_len, n_len=n_len, block_m=block_m, block_n=block_n,
                has_bias=has_bias, full_tile=full_tile),
            grid=(batch, heads, mp // block_m),
            in_specs=[
                pl.BlockSpec((1, 1, block_m, d), lambda b, h, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d), lambda b, h, i: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d), lambda b, h, i: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                bspec3,
                pl.BlockSpec((1, 1, block_m, 1), lambda b, h, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_m, 1), lambda b, h, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_m, d), lambda b, h, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_m, d), lambda b, h, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d), lambda b, h, i: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d), lambda b, h, i: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(qp.shape, q.dtype),
                jax.ShapeDtypeStruct(kp.shape, jnp.float32),
                jax.ShapeDtypeStruct(vp.shape, jnp.float32),
            ],
            compiler_params=_compiler_params(
                ("parallel", "parallel", "arbitrary")),
            interpret=interpret_mode(),
        )(qp, kp, vp, bias_in, lsep, deltap, dop)
        return (dq[:, :, :m_len].astype(q.dtype),
                dk[:, :, :n_len].astype(k.dtype),
                dv[:, :, :n_len].astype(v.dtype), None)

    # ---- dk/dv (+ dbias) ----
    in_specs_kv = [
        pl.BlockSpec((1, 1, block_m, d), lambda b, h, j, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, j, i: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, j, i: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        (bias_spec if not has_bias else
         _bias_spec_kvorder(bias.shape, block_m, block_n)),
        pl.BlockSpec((1, 1, block_m, 1), lambda b, h, j, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_m, 1), lambda b, h, j, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_m, d), lambda b, h, j, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs_kv = [
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, j, i: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, j, i: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_m, block_n), lambda b, h, j, i: (b, h, i, j),
                     memory_space=pltpu.VMEM),
    ]
    dbias_shape = (batch, heads, mp, np_) if want_dbias else (1, 1, block_m, block_n)
    if not want_dbias:
        out_specs_kv[2] = pl.BlockSpec((1, 1, block_m, block_n),
                                       lambda b, h, j, i: (0, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    grid_kv = (batch, heads, np_ // block_n, mp // block_m)
    kern_kv = functools.partial(
        _bwd_dkv_kernel, sm_scale=sm_scale, causal=causal, m_len=m_len,
        n_len=n_len, block_m=block_m, block_n=block_n, has_bias=has_bias,
        want_dbias=want_dbias, full_tile=full_tile)
    dk, dv, dbias_full = pl.pallas_call(
        kern_kv, grid=grid_kv, in_specs=in_specs_kv, out_specs=out_specs_kv,
        out_shape=[
            jax.ShapeDtypeStruct(kp.shape, jnp.float32),
            jax.ShapeDtypeStruct(vp.shape, jnp.float32),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(qp, kp, vp, bias_in, lsep, deltap, dop)

    # ---- dq ----
    in_specs_q = [
        pl.BlockSpec((1, 1, block_m, d), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        (bias_spec if not has_bias else _bias_spec(bias.shape, block_m, block_n)),
        pl.BlockSpec((1, 1, block_m, 1), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_m, 1), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_m, d), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_q = (batch, heads, mp // block_m, np_ // block_n)
    kern_q = functools.partial(
        _bwd_dq_kernel, sm_scale=sm_scale, causal=causal, m_len=m_len,
        n_len=n_len, block_m=block_m, block_n=block_n, has_bias=has_bias,
        full_tile=full_tile)
    dq = pl.pallas_call(
        kern_q, grid=grid_q, in_specs=in_specs_q,
        out_specs=pl.BlockSpec((1, 1, block_m, d), lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(qp, kp, vp, bias_in, lsep, deltap, dop)

    dq = dq[:, :, :m_len].astype(q.dtype)
    dk = dk[:, :, :n_len].astype(k.dtype)
    dv = dv[:, :, :n_len].astype(v.dtype)

    dbias = None
    if want_dbias:
        db = dbias_full[:, :, :m_len, :n_len]
        # reduce over broadcast axes (reference: flash_attention_v2_bias.py:214-215)
        axes = []
        if bias.shape[0] == 1:
            axes.append(0)
        if bias.shape[1] == 1:
            axes.append(1)
        if axes:
            db = jnp.sum(db, axis=tuple(axes), keepdims=True)
        dbias = db.astype(bias.dtype)
    return dq, dk, dv, dbias


def _bias_spec_kvorder(bias_shape, block_m, block_n):
    bb = 0 if bias_shape[0] == 1 else None
    hb = 0 if bias_shape[1] == 1 else None

    def index_map(b, h, j, i):
        return (bb if bb is not None else b, hb if hb is not None else h, i, j)

    return pl.BlockSpec((1, 1, block_m, block_n), index_map, memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Public API (custom VJP)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_bias(q, k, v, bias, causal, sm_scale, block_m, block_n):
    o, _ = _fwd(q, k, v, bias, causal, sm_scale, block_m, block_n)
    return o


def _fab_fwd(q, k, v, bias, causal, sm_scale, block_m, block_n):
    o, lse = _fwd(q, k, v, bias, causal, sm_scale, block_m, block_n)
    return o, (q, k, v, bias, lse, o)


def _fab_bwd(causal, sm_scale, block_m, block_n, res, do):
    q, k, v, bias, lse, o = res
    bm, bn = _bwd_blocks(block_m, block_n, q.shape[2], k.shape[2])
    dq, dk, dv, dbias = _bwd(q, k, v, bias, causal, sm_scale, bm,
                             bn, lse, o, do, want_dbias=True)
    return dq, dk, dv, dbias


_flash_attention_bias.defvjp(_fab_fwd, _fab_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_nobias(q, k, v, causal, sm_scale, block_m, block_n):
    o, _ = _fwd(q, k, v, None, causal, sm_scale, block_m, block_n)
    return o


def _fan_fwd(q, k, v, causal, sm_scale, block_m, block_n):
    o, lse = _fwd(q, k, v, None, causal, sm_scale, block_m, block_n)
    return o, (q, k, v, lse, o)


def _fan_bwd(causal, sm_scale, block_m, block_n, res, do):
    q, k, v, lse, o = res
    bm, bn = _bwd_blocks(block_m, block_n, q.shape[2], k.shape[2])
    dq, dk, dv, _ = _bwd(q, k, v, None, causal, sm_scale, bm, bn,
                         lse, o, do, want_dbias=False)
    return dq, dk, dv


_flash_attention_nobias.defvjp(_fan_fwd, _fan_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: float = 1.0,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
) -> jnp.ndarray:
    """Flash attention. q: (B,H,M,D); k,v: (B,H,N,D); bias: (B|1,H|1,M,N).

    Differentiable in q, k, v and bias. Equivalent math to
    `attn_ref(q, k, v, bias, sm_scale=sm_scale, causal=causal)`.
    """
    m_len, n_len = q.shape[2], k.shape[2]
    round16 = lambda x: ((x + 15) // 16) * 16
    block_m = min(block_m, round16(m_len))
    block_n = min(block_n, round16(n_len))
    if bias is None:
        return _flash_attention_nobias(q, k, v, causal, sm_scale, block_m, block_n)
    if bias.ndim != 4:
        raise ValueError(f"bias must be 4D (B|1,H|1,M,N), got {bias.shape}")
    # Clamp mask-like bias values (finfo.min / -inf, e.g. from use_masking —
    # modeling_flash_t5.py:266-270) above the kernel's -1e30 empty-row
    # sentinel. Partially-masked rows are unchanged (exp(-1e29 - m) still
    # underflows to 0 against any finite row max); fully-masked rows become
    # uniform attention, matching torch/jnp softmax over equal finite scores
    # instead of the kernel's empty-row zero output.
    bias = jnp.maximum(bias, jnp.asarray(-1e29, bias.dtype))
    return _flash_attention_bias(q, k, v, bias, causal, sm_scale, block_m, block_n)
