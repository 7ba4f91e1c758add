"""Pallas TPU flash attention with the T5 relative-position bias fused in-kernel.

Capability parity with the reference's "fa2_rpe" patched-CUDA path
(README.md:60, usage modeling_flash_t5.py:276-279): the kernel receives the
raw (num_buckets, num_heads) bucket-embedding table and computes the bucketed
bias for every (q-block, k-block) tile *inside* the kernel, so bias memory is
O(num_buckets·H) instead of O(M·N) — linear total memory in sequence length.
Unlike the reference (whose Triton kernel materializes the bias and whose CUDA
patch is out-of-tree), the backward here also produces the bucket-embedding
gradient in-kernel.

TPU-first design:
- The relative-position bucket function (positional.relative_position_bucket)
  is evaluated on (BM, BN) index tiles with VPU integer/log ops.
- The bucket-weight table lives in SMEM; the bias tile is an unrolled
  NB-way compare+select chain against dynamic SMEM scalar reads (gather-free,
  Mosaic-lowerable; NB=32 selects per tile is noise next to the qk matmul).
- The bucket-weight gradient is NB per-bucket masked scalar reductions of the
  score-gradient tile, written to head-h's lane of a per-batch (NB, 128)
  VMEM accumulator that stays resident across the whole (h, j, i) sweep
  (TPU grids are sequential), then reduced over batch by XLA. This solves
  the scatter-add the reference sidesteps (SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flasht5_tpu.ops.flash_attention import (
    DEFAULT_BLOCK_M,
    DEFAULT_BLOCK_N,
    _LN2,
    _LOG2E,
    _NEG_INF,
    _bwd_blocks,
    _compiler_params,
    _exp2_on,
    _fwd_kernel as _fa_bias_fwd_kernel,
    _pad_to,
)

# Precomputed-offset-table fast path: with square tiles, a tile's bias
# depends only on (j - i), so all distinct tile biases fit in an
# O(S/Bk * H * Bk^2) = O(S) table — computed once in XLA (where gathers are
# free) and streamed into the plain bias kernel. Falls back to the fully
# in-kernel select-chain beyond this budget (very long sequences), where
# memory, not speed, is the binding constraint.
_TABLE_BUDGET_BYTES = 128 * 1024 * 1024
import os as _os
from flasht5_tpu.runtime import interpret_mode


def _table_dtype(q_dtype):
    """Offset-table storage dtype. Default: MODEL dtype (bf16 for the
    flagship) — halves the dominant non-QKV copy stream; round-3 chained
    A/B at (B16,H12,S1024,D64): fwd 0.929->0.872ms, fwd+bwd 2.745->2.668ms,
    end-to-end neutral-to-plus (139.9k vs 139.7k tok/s). The bias is an
    O(1)-magnitude learned bucket embedding, so bf16 storage costs ~3
    decimal digits on the score ADD only (weights themselves stay fp32 in
    params; fp32 models keep an fp32 table). FLASHT5_RPE_TABLE_BF16=0
    reverts to fp32 storage. (A round-2 bf16 attempt measured slower, but
    that variant also switched the dW path — the regression was misblamed.)
    """
    if _os.environ.get("FLASHT5_RPE_TABLE_BF16", "1") == "0":
        return jnp.float32
    return q_dtype

_HEAD_LANES = 128  # lane width of the in-kernel weight / dweight tiles


def _bucket_of(rel, *, bidirectional, num_buckets, max_distance):
    """Bucket indices for a (traced) int32 relative-position array.

    Same math as positional.relative_position_bucket.
    """
    nb = num_buckets
    out = jnp.zeros_like(rel)
    if bidirectional:
        nb //= 2
        out += (rel > 0).astype(jnp.int32) * nb
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = max_exact + (
        jnp.log(rel_f / max_exact) / math.log(max_distance / max_exact)
        * (nb - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return out + jnp.where(is_small, rel, large)


def _bucket_tile(i, j, block_m, block_n, *, bidirectional, num_buckets,
                 max_distance, q_offset=0, k_offset=0):
    """(BM, BN) int32 bucket indices for tile (i, j), on tile-local iotas."""
    rows = i * block_m + q_offset + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, block_n), 0)
    cols = j * block_n + k_offset + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, block_n), 1)
    return _bucket_of(cols - rows, bidirectional=bidirectional,
                      num_buckets=num_buckets, max_distance=max_distance)


def _bias_from_buckets(bucket, w_ref, h, num_buckets):
    """bias (BM, BN) = w[bucket, h] via an unrolled per-bucket select chain.

    w_ref: (NB, H) fp32 SMEM table; `h` is the (traced) head index, so the
    per-bucket weight is a dynamic SMEM scalar read — Mosaic lowers the loop
    to NB compare+select VPU ops, no gathers or reshapes.
    """
    bias = jnp.zeros(bucket.shape, jnp.float32)
    for b in range(num_buckets):
        w_b = w_ref[b, h]
        bias = bias + jnp.where(bucket == b, w_b, 0.0)
    return bias


def _bfold_ok(batch, block_n, d):
    """Default-ON gate for the batch-folded nj1 kernels (grid (h, i), batch
    loop unrolled in-body). Measured 139.1k vs 134.0k tok/s on the full
    fat5-small train step (v5e, round-2 on-chip A/B) — the unrolled body lets
    Mosaic overlap one batch's softmax VPU work with another's MXU matmuls,
    which grid-step boundaries serialize. Gated on the batch-resident
    k/v (+fp32 dk/dv accumulators in the bwd) fitting comfortably in VMEM,
    and opt-out via FLASHT5_RPE_BFOLD=0."""
    if _os.environ.get("FLASHT5_RPE_BFOLD", "1") == "0":
        return False
    return batch * block_n * d * (4 + 4 + 2 + 2) <= 16 * 1024 * 1024


def _dw_mode():
    """dW accumulation strategy (read at trace time).

    "diag" (default): anti-diagonal skew reduction — log2(BM) lane-rolls +
    one sublane reduction + a select chain over the BM+BN-1 diagonals.
    Within a tile the bucket depends only on jj-ii, so per-diagonal sums of
    the score gradient carry everything the bucket gradient needs; this
    replaces NB full-(BM,BN) compare+select+add sweeps (~NB*3*BM*BN VPU ops,
    the dominant backward cost at NB=32) with ~2*log2(BM)*BM*(BM+BN).
    "chain": the per-bucket full-tile reduction (round-1 form).
    "skip": no dW (timing diagnostics ONLY — gradients are wrong).
    """
    return _os.environ.get("FLASHT5_RPE_DW_MODE", "diag")


def _dw_accum(dw_ref, g, h, i, j, *, mode, block_m, block_n, bidirectional,
              num_buckets, max_distance):
    """Accumulate the bucket-weight gradient of one (i, j) tile into head-h's
    lane of the resident (NB, LANES) accumulator. g must already be zero on
    masked/padded elements."""
    if mode == "skip":
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _HEAD_LANES), 1)
    if mode == "chain":
        bucket = _bucket_tile(i, j, block_m, block_n,
                              bidirectional=bidirectional,
                              num_buckets=num_buckets,
                              max_distance=max_distance)
        for bkt in range(num_buckets):
            s_b = jnp.sum(jnp.where(bucket == bkt, g, 0.0))
            dw_ref[0, bkt:bkt + 1, :] += jnp.where(lane == h, s_b, 0.0)
        return

    # mode == "diag": skew so diagonal d = jj - ii of g lands in column
    # d + BM - 1, then reduce over rows. Row ii must shift right by
    # (BM-1-ii); decompose the per-row shift as a static right-roll by BM-1
    # after log2(BM) conditional left-rolls (rows with bit k of ii set roll
    # left by 2^k). No wraparound: final columns span [0, BM+BN-2] and the
    # width is padded to a lane multiple >= BM+BN-1.
    w_cols = ((block_m + block_n + 127) // 128) * 128
    skew = jnp.pad(g, ((0, 0), (0, w_cols - block_n)))
    rows = jax.lax.broadcasted_iota(jnp.int32, skew.shape, 0)
    k = 1
    while k < block_m:
        rolled = jnp.roll(skew, -k, axis=1)
        skew = jnp.where((rows & k) != 0, rolled, skew)
        k *= 2
    skew = jnp.roll(skew, block_m - 1, axis=1)
    ds = jnp.sum(skew, axis=0, keepdims=True)              # (1, W)
    rel = (j * block_n - i * block_m - (block_m - 1)
           + jax.lax.broadcasted_iota(jnp.int32, ds.shape, 1))
    bucket_d = _bucket_of(rel, bidirectional=bidirectional,
                          num_buckets=num_buckets, max_distance=max_distance)
    # one masked (NB_pad, W) reduction instead of an NB-iteration loop of
    # tiny (1, W) ops — rows >= num_buckets never match a bucket and stay 0
    nb_rows = dw_ref.shape[1]
    bkt_rows = jax.lax.broadcasted_iota(jnp.int32, (nb_rows, w_cols), 0)
    sums = jnp.sum(jnp.where(bucket_d == bkt_rows, ds, 0.0), axis=1,
                   keepdims=True)                          # (NB_pad, 1)
    dw_ref[0] += jnp.where(lane == h, sums, 0.0)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel_nj1(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                    sm_scale, causal, m_len, n_len, block_m, block_n,
                    full_tile=False):
    """Single-KV-tile forward with a batch-innermost grid (h, i, b).

    When the whole KV sequence fits one (block_n) tile — the common training
    case at S<=1024 with 1024-wide tiles — flash accumulation over j is a
    single iteration, so no revolving scratch is needed and the softmax is
    computed directly. The payoff is the grid order: the (block_m, block_n)
    bias tile's index depends only on (i, h), so with b innermost the Pallas
    pipeline elides its copy across the whole batch sweep, cutting the
    dominant bias HBM stream by ~batch x (the offset-table stream measured
    ~14 ms/step of pure bias traffic at batch 8 under the (b,h,i,j) order).

    k/v blocks span ALL batches (their index depends only on h), so their
    HBM fetch is likewise elided across the whole (i, b) sweep — once per
    head instead of once per program.
    """
    i = pl.program_id(1)
    b = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[b, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    s = s + bias_ref[0, 0]
    if full_tile:
        # statically all-valid tile (non-causal, unpadded): skip the mask
        # iota/compare/select chain and the empty-row guards — the kernel
        # is VPU-bound at D=64, so these elementwise passes are the cost
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b, 0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, 0] = (pv / l).astype(o_ref.dtype)
        lse_ref[0, 0] = m + jnp.log(l)
        return
    rows = i * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, block_n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
    mask = cols < n_len
    if causal:
        mask = mask & (cols <= rows + (n_len - m_len))
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(m > _NEG_INF / 2, m, 0.0)
    p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l > 0.0, l, 1.0)
    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b, 0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, 0] = (pv / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.where(l > 0.0, m_safe + jnp.log(l_safe), _NEG_INF)


def _fwd_kernel_nj1_bfold(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                          sm_scale, causal, m_len, n_len, block_m, block_n,
                          batch, exp2=False, full_tile=False, ablate=()):
    """Batch-folded single-KV-tile forward: grid (h, i), the batch loop
    statically unrolled INSIDE the kernel (opt-in, FLASHT5_RPE_BFOLD=1).

    Vs the (h, i, b) grid form: 8x fewer grid steps, and — the real goal —
    the unrolled body exposes `batch` independent MXU->VPU->MXU chains to
    Mosaic's static scheduler, so the softmax VPU work of one batch can
    overlap the score/PV matmuls of another. Grid-step boundaries serialize
    that overlap in the per-batch form (copies pipeline across steps,
    compute does not)."""
    i = pl.program_id(1)
    if not full_tile:
        rows = i * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, block_n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
        mask = cols < n_len
        if causal:
            mask = mask & (cols <= rows + (n_len - m_len))
    # with exp2, q arrives pre-scaled by sm_scale*log2e and the bias TABLE
    # was built from w*log2e, so s is already in the log2 domain
    # (see flash_attention._exp2_on)
    expf = jnp.exp2 if exp2 else jnp.exp
    lse_mult = _LN2 if exp2 else 1.0
    # convert the (bf16 by default) bias tile to f32 ONCE before the
    # unrolled batch loop: the in-loop `s + bias` is a mixed-type add that
    # Mosaic re-converts per batch iteration — hoisting measured 18% off
    # the forward at (B16,H12,S1024,D64): 0.798 -> 0.652ms probe-kernel,
    # docs/fwd_epilogue_probe.json v1_hoist_f32. Bit-identical output (the
    # add already promoted to f32).
    bias = bias_ref[0, 0].astype(jnp.float32)
    # `ablate` (diagnostic only, tools/attn_ablate.py): drop named component
    # passes to expose the kernel's cost anatomy on-chip. Never set in
    # production dispatch.
    for b in range(batch):
        if "qk" in ablate:
            s = jnp.zeros((block_m, block_n), jnp.float32)
        else:
            s = jax.lax.dot_general(q_ref[b, 0], k_ref[b, 0],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if sm_scale != 1.0 and not exp2:
            s = s * sm_scale
        if "bias" not in ablate:
            s = s + bias
        if full_tile:
            if "softmax" in ablate:
                m = jnp.zeros((block_m, 1), jnp.float32)
                l = jnp.ones((block_m, 1), jnp.float32)
                p = s
            elif "exp" in ablate:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = s - m
                l = jnp.sum(p, axis=-1, keepdims=True)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = expf(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
            if "pv" in ablate:
                pv = p[:, : o_ref.shape[-1]].astype(jnp.float32)
            else:
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


def _fwd_kernel(q_ref, k_ref, v_ref, w_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *,
                sm_scale, causal, bidirectional, num_buckets, max_distance,
                m_len, n_len, block_m, block_n, full_tile=False):
    h = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)
    nb_j = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    offset = n_len - m_len
    run = True
    if causal:
        run = j * block_n <= i * block_m + block_m - 1 + offset

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if sm_scale != 1.0:
            s = s * sm_scale
        bucket = _bucket_tile(i, j, block_m, block_n,
                              bidirectional=bidirectional,
                              num_buckets=num_buckets,
                              max_distance=max_distance)
        s = s + _bias_from_buckets(bucket, w_ref, h, num_buckets)

        if full_tile:
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
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(j == nb_j - 1)
    def _finalize():
        l = l_scr[...]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(l > 0.0, m_scr[...] + jnp.log(l_safe), _NEG_INF)


def _prep_w(w):
    """(NB, H) fp32 scalar table for SMEM."""
    return w.astype(jnp.float32)


def _offset_geometry(mp, np_, block_m, block_n):
    """Token-offset lattice for tile (i, j): t_off = j*BN - i*BM takes
    values on a gcd(BM, BN) stride; returns (gcd, t_min, n_off)."""
    g = math.gcd(block_m, block_n)
    t_min = -(mp - block_m)
    t_max = np_ - block_n
    return g, t_min, (t_max - t_min) // g + 1


def _table_bytes(mp, np_, heads, block_m, block_n):
    _, _, n_off = _offset_geometry(mp, np_, block_m, block_n)
    return n_off * heads * block_m * block_n * 4


def _build_offset_table(w, mp, np_, block_m, block_n, *, bidirectional,
                        num_buckets, max_distance, dtype=jnp.float32):
    """(n_off, H, BM, BN) bias tiles for every tile token-offset, plus the
    (n_off,) per-offset [bucket_min, bucket_max] range tables.

    The tiles are stored in `dtype` — the model dtype in training (the
    reference's kernels likewise read the bias at model precision), which
    halves the dominant HBM stream of the table path when bf16. The range
    tables bound the backward dW bucket loop: a tile far from the diagonal
    spans only 1-2 of the 32 buckets (log bucketing), so per-bucket
    reductions outside [min, max] are skipped.
    """
    from flasht5_tpu.positional import relative_position_bucket

    g, t_min, n_off = _offset_geometry(mp, np_, block_m, block_n)
    t_off = (jnp.arange(n_off) * g + t_min)[:, None, None]
    m = jax.lax.broadcasted_iota(jnp.int32, (1, block_m, block_n), 1)
    n = jax.lax.broadcasted_iota(jnp.int32, (1, block_m, block_n), 2)
    rel = t_off + (n - m)
    buckets = relative_position_bucket(
        rel, bidirectional=bidirectional, num_buckets=num_buckets,
        max_distance=max_distance)
    # one-hot matmul instead of gather: XLA fuses the one-hot into the MXU
    # contraction (measured 0.05ms vs 2.6ms for the gather at S=1024); the
    # contraction runs in fp32 and only the stored tiles are cast
    onehot = jax.nn.one_hot(buckets, num_buckets, dtype=jnp.float32)
    table = jnp.einsum("ombk,kh->ohmb", onehot, w.astype(jnp.float32))
    bmin = jnp.min(buckets, axis=(1, 2)).astype(jnp.int32)
    bmax = jnp.max(buckets, axis=(1, 2)).astype(jnp.int32)
    return table.astype(dtype), bmin, bmax


def _fwd(q, k, v, w, causal, sm_scale, bidirectional, num_buckets,
         max_distance, block_m, block_n):
    batch, heads, m_len, d = q.shape
    n_len = k.shape[2]
    qp = _pad_to(q, 2, block_m)
    kp = _pad_to(k, 2, block_n)
    vp = _pad_to(v, 2, block_n)
    mp, np_ = qp.shape[2], kp.shape[2]
    wp = _prep_w(w)

    n_i, n_j = mp // block_m, np_ // block_n
    use_table = (_table_bytes(mp, np_, heads, block_m, block_n)
                 <= _TABLE_BUDGET_BYTES)
    if use_table:
        g_off, t_min, _ = _offset_geometry(mp, np_, block_m, block_n)
        bfold = n_j == 1 and _bfold_ok(batch, block_n, d)
        exp2 = _exp2_on() and bfold
        table, _, _ = _build_offset_table(
            w * _LOG2E if exp2 else w, mp, np_, block_m, block_n,
            bidirectional=bidirectional,
            num_buckets=num_buckets, max_distance=max_distance,
            dtype=_table_dtype(q.dtype))
        if bfold:
            if exp2:
                qp = (qp * (sm_scale * _LOG2E)).astype(q.dtype)
            # batch-folded resident-bias specialization (see kernel doc)
            o, lse = pl.pallas_call(
                functools.partial(
                    _fwd_kernel_nj1_bfold, sm_scale=sm_scale, causal=causal,
                    m_len=m_len, n_len=n_len, block_m=block_m,
                    block_n=block_n, batch=batch, exp2=exp2,
                    full_tile=(not causal and mp == m_len
                               and np_ == n_len),
                    ablate=tuple(x for x in _os.environ.get(
                        "FLASHT5_ABL", "").split(",") if x)),
                grid=(heads, n_i),
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
                    pl.BlockSpec(
                        (1, 1, block_m, block_n),
                        lambda h, i: (
                            (-i * block_m - t_min) // g_off, h, 0, 0),
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
            )(qp, kp, vp, table)
            return o[:, :, :m_len], lse[:, :, :m_len, 0]
        if (n_j == 1
                and _os.environ.get("FLASHT5_RPE_FWD_RESIDENT", "1") != "0"):
            # batch-innermost resident-bias specialization (see kernel doc)
            o, lse = pl.pallas_call(
                functools.partial(
                    _fwd_kernel_nj1, sm_scale=sm_scale, causal=causal,
                    m_len=m_len, n_len=n_len, block_m=block_m,
                    block_n=block_n,
                    full_tile=(not causal and mp == m_len
                               and np_ == n_len)),
                grid=(heads, n_i, batch),
                in_specs=[
                    pl.BlockSpec((1, 1, block_m, d),
                                 lambda h, i, b: (b, h, i, 0),
                                 memory_space=pltpu.VMEM),
                    # k/v span all batches; index depends only on h, so the
                    # fetch is elided across the whole (i, b) sweep
                    pl.BlockSpec((batch, 1, block_n, d),
                                 lambda h, i, b: (0, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch, 1, block_n, d),
                                 lambda h, i, b: (0, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (1, 1, block_m, block_n),
                        lambda h, i, b: (
                            (-i * block_m - t_min) // g_off, h, 0, 0),
                        memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, block_m, d),
                                 lambda h, i, b: (b, h, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, block_m, 1),
                                 lambda h, i, b: (b, h, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(qp.shape, q.dtype),
                    jax.ShapeDtypeStruct((batch, heads, mp, 1), jnp.float32),
                ],
                compiler_params=_compiler_params(
                    ("parallel", "arbitrary", "arbitrary"),
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interpret_mode(),
            )(qp, kp, vp, table)
            return o[:, :, :m_len], lse[:, :, :m_len, 0]
        kern = functools.partial(
            _fa_bias_fwd_kernel, sm_scale=sm_scale, causal=causal,
            m_len=m_len, n_len=n_len, block_m=block_m, block_n=block_n,
            has_bias=True,
            full_tile=(not causal and mp == m_len and np_ == n_len))
        o, lse = pl.pallas_call(
            kern,
            grid=(batch, heads, n_i, n_j),
            in_specs=[
                pl.BlockSpec((1, 1, block_m, d), lambda b, h, i, j: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, block_m, block_n),
                    lambda b, h, i, j: (
                        (j * block_n - i * block_m - t_min) // g_off, h, 0, 0),
                    memory_space=pltpu.VMEM),
            ],
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
            compiler_params=_compiler_params(
                ("parallel", "parallel", "parallel", "arbitrary")),
            interpret=interpret_mode(),
        )(qp, kp, vp, table)
        return o[:, :, :m_len], lse[:, :, :m_len, 0]

    grid = (batch, heads, mp // block_m, np_ // block_n)
    kern = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, causal=causal,
        bidirectional=bidirectional, num_buckets=num_buckets,
        max_distance=max_distance, m_len=m_len, n_len=n_len,
        block_m=block_m, block_n=block_n,
        full_tile=(not causal and mp == m_len and np_ == n_len))
    o, lse = pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_m, d), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n, d), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda b, h, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
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
    )(qp, kp, vp, wp)
    return o[:, :, :m_len], lse[:, :, :m_len, 0]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, w_ref, bias_ref, brange_ref, lse_ref,
                    delta_ref, do_ref, dk_ref, dv_ref, dw_ref, *,
                    sm_scale, causal, bidirectional, num_buckets, max_distance,
                    m_len, n_len, block_m, block_n, use_table, g_off, t_min,
                    dw_mode, full_tile=False):
    h = pl.program_id(1)
    j = pl.program_id(2)
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when((h == 0) & (j == 0) & (i == 0))
    def _init_w():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    run = True
    if causal:
        run = j * block_n <= i * block_m + block_m - 1 + (n_len - m_len)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if sm_scale != 1.0:
            s = s * sm_scale
        if use_table:
            s = s + bias_ref[0, 0]
        else:
            s = s + _bias_from_buckets(
                _bucket_tile(i, j, block_m, block_n,
                             bidirectional=bidirectional,
                             num_buckets=num_buckets,
                             max_distance=max_distance),
                w_ref, h, num_buckets)
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
            p = jnp.where(mask & lse_ok,
                          jnp.exp(s - jnp.where(lse_ok, lse, 0.0)), 0.0)

        do = do_ref[0, 0]
        dp = jax.lax.dot_general(do, v_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = p * (dp - delta_ref[0, 0])

        dv_ref[0, 0] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0, 0] += jax.lax.dot_general(
            g.astype(q_ref.dtype), q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        # bucket-weight gradient into head-h's lane of a resident per-batch
        # (NB, LANES) accumulator tile. (A per-bucket @pl.when bounded by the
        # tile's SMEM bucket range measured 25% SLOWER than straight-line
        # code — Mosaic predication costs more than skipped reductions save;
        # the "diag" skew mode is the real fix.)
        _dw_accum(dw_ref, g, h, i, j, mode=dw_mode, block_m=block_m,
                  block_n=block_n, bidirectional=bidirectional,
                  num_buckets=num_buckets, max_distance=max_distance)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, w_ref, bias_ref, brange_ref,
                      lse_ref, delta_ref, do_ref, dq_in_ref,
                      dq_ref, dk_ref, dv_ref, dw_ref, *,
                      sm_scale, causal, bidirectional, num_buckets,
                      max_distance, m_len, n_len, block_m, block_n,
                      use_table, g_off, t_min, dw_mode, full_tile=False):
    """Single-sweep backward: grid (b, h, j, i) with i innermost.

    Computes p = exp(s - lse) ONCE per (i, j) tile and produces all four
    gradients from it: dk/dv accumulate in resident VMEM blocks (index j,
    constant across the inner i sweep), dW in the resident per-batch lane
    accumulator, and dq[i] accumulates THROUGH HBM — dq is an aliased
    input/output (input_output_aliases) whose block i is re-fetched, added
    to, and written back on every visit; the TPU grid is sequential, so the
    j-revisits of block i read the previous write. This halves the backward's
    tile loads and score/softmax recompute vs the two-pass (dkv, dq) form.
    """
    h = pl.program_id(1)
    j = pl.program_id(2)
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when((h == 0) & (j == 0) & (i == 0))
    def _init_w():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    run = True
    if causal:
        run = j * block_n <= i * block_m + block_m - 1 + (n_len - m_len)

    # copy-through must happen whether or not the tile computes, so skipped
    # (fully-masked causal) tiles still propagate the accumulated dq
    dq_acc = dq_in_ref[0, 0]

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if sm_scale != 1.0:
            s = s * sm_scale
        if use_table:
            s = s + bias_ref[0, 0]
        else:
            s = s + _bias_from_buckets(
                _bucket_tile(i, j, block_m, block_n,
                             bidirectional=bidirectional,
                             num_buckets=num_buckets,
                             max_distance=max_distance),
                w_ref, h, num_buckets)
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
            p = jnp.where(mask & lse_ok,
                          jnp.exp(s - jnp.where(lse_ok, lse, 0.0)), 0.0)

        do = do_ref[0, 0]
        dp = jax.lax.dot_general(do, v_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = p * (dp - delta_ref[0, 0])

        dv_ref[0, 0] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[0, 0] += jax.lax.dot_general(
            g.astype(q_ref.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        dq_ref[0, 0] = dq_acc + jax.lax.dot_general(
            g.astype(k_ref.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        _dw_accum(dw_ref, g, h, i, j, mode=dw_mode, block_m=block_m,
                  block_n=block_n, bidirectional=bidirectional,
                  num_buckets=num_buckets, max_distance=max_distance)

    if causal:
        @pl.when(jnp.logical_not(run))
        def _passthrough():
            dq_ref[0, 0] = dq_acc


def _bwd_fused_kernel_nj1(q_ref, k_ref, v_ref, bias_ref, lse_ref, o_ref,
                          do_ref, dq_ref, dk_ref, dv_ref, dw_ref,
                          dk_scr, dv_scr, g_scr, *,
                          sm_scale, causal, bidirectional, num_buckets,
                          max_distance, m_len, n_len, block_m, block_n,
                          dw_mode, full_tile=False):
    """Single-KV-tile fused backward, batch-innermost grid (h, i, b).

    Same residency argument as _fwd_kernel_nj1: the bias tile index depends
    only on (i, h), so with b innermost its copy is elided across the batch
    sweep. With a single KV tile, dq is complete after one visit (no aliased
    HBM accumulation), dk/dv accumulate over i in a (batch,)-indexed VMEM
    scratch (their output blocks change every inner step, so they cannot be
    the accumulator), and dW accumulates directly in its output block, whose
    index is constant for the whole grid.

    dW batch-summing: every (h, i, b) visit shares one tile geometry, so the
    score gradient is summed over the batch sweep in a resident g_scr tile
    and the skew-roll diagonal binning (the dominant VPU cost of this kernel)
    runs ONCE per (h, i) instead of once per program — 1/batch the skew work
    for one extra (BM, BN) add per visit.
    """
    h = pl.program_id(0)
    i = pl.program_id(1)
    b = pl.program_id(2)

    @pl.when((i == 0) & (b == 0))
    def _init_kv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when((h == 0) & (i == 0) & (b == 0))
    def _init_w():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    q = q_ref[0, 0]
    k = k_ref[b, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    s = s + bias_ref[0, 0]
    if full_tile:
        # statically all-valid tile: no mask / lse-validity chains (see
        # _fwd_kernel_nj1); g is exact on every element so dW needs no
        # zeroing either
        p = jnp.exp(s - lse_ref[0, 0])
    else:
        rows = i * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, block_n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
        mask = (cols < n_len) & (rows < m_len)
        if causal:
            mask = mask & (cols <= rows + (n_len - m_len))

        lse = lse_ref[0, 0]
        lse_ok = lse > _NEG_INF / 2
        p = jnp.where(mask & lse_ok,
                      jnp.exp(s - jnp.where(lse_ok, lse, 0.0)), 0.0)

    do = do_ref[0, 0]
    dp = jax.lax.dot_general(do, v_ref[b, 0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(o_ref[0, 0].astype(jnp.float32)
                    * do.astype(jnp.float32), axis=-1, keepdims=True)
    g = p * (dp - delta)

    dv_new = dv_scr[b] + jax.lax.dot_general(
        p.astype(do_ref.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_new = dk_scr[b] + jax.lax.dot_general(
        g.astype(q_ref.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    dv_scr[b] = dv_new
    dk_scr[b] = dk_new
    # unconditional VMEM write; the out spec routes every visit except the
    # final (i = n_i - 1) one to a constant-index garbage block, so only the
    # completed per-(b, h) sums are actually DMAed to HBM
    dk_ref[0, 0] = dk_new
    dv_ref[0, 0] = dv_new

    dq_ref[0, 0] = (jax.lax.dot_general(
        g.astype(k_ref.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)

    if dw_mode != "skip":
        n_b = pl.num_programs(2)

        @pl.when(b == 0)
        def _g_init():
            g_scr[...] = g

        @pl.when(b != 0)
        def _g_accum():
            g_scr[...] += g

        @pl.when(b == n_b - 1)
        def _g_bin():
            _dw_accum(dw_ref, g_scr[...], h, i, 0, mode=dw_mode,
                      block_m=block_m, block_n=block_n,
                      bidirectional=bidirectional, num_buckets=num_buckets,
                      max_distance=max_distance)


def _bwd_fused_kernel_nj1_bfold(q_ref, k_ref, v_ref, bias_ref, lse_ref,
                                o_ref, do_ref, dq_ref, dk_ref, dv_ref,
                                dw_ref, *, sm_scale, causal, bidirectional,
                                num_buckets, max_distance, m_len, n_len,
                                block_m, block_n, batch, dw_mode,
                                exp2=False, full_tile=False):
    """Batch-folded single-KV-tile fused backward, grid (h, i) with the batch
    loop statically unrolled inside (opt-in, FLASHT5_RPE_BFOLD=1).

    Vs _bwd_fused_kernel_nj1: the dk/dv output blocks span all batches and
    index only on h, so they ARE the across-i accumulators — no VMEM scratch,
    no garbage-block copy-out routing. The unrolled body gives Mosaic `batch`
    independent MXU->VPU chains to interleave, and the dW skew-binning (the
    dominant VPU cost) runs once per program on the batch-summed score
    gradient, same as the g_scr trick but on a local value.

    delta (sum o*do per row, the reference's _bwd_preprocess,
    flash_attention_v2_bias.py:516) is fused in-kernel from the o tile —
    no separate XLA pass over o/do and no delta stream."""
    h = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    @pl.when((h == 0) & (i == 0))
    def _init_w():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # f32-hoist before the unrolled batch loop (same win as the forward:
    # docs/fwd_epilogue_probe.json v1_hoist_f32; bit-identical output)
    bias = bias_ref[0, 0].astype(jnp.float32)
    if not full_tile:
        rows = i * block_m + jax.lax.broadcasted_iota(
            jnp.int32, (block_m, block_n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_m, block_n), 1)
        mask = (cols < n_len) & (rows < m_len)
        if causal:
            mask = mask & (cols <= rows + (n_len - m_len))

    # exp2: q pre-scaled by sm_scale*log2e, bias table in the log2 domain —
    # p is identical; g stays natural-domain, so dW needs no change; dk
    # contracts against the SCALED q and picks up ln2 (see _exp2_on)
    expf = jnp.exp2 if exp2 else jnp.exp
    lse_mult = _LOG2E if exp2 else 1.0
    dk_mult = _LN2 if exp2 else sm_scale

    g_sum = None
    for b in range(batch):
        q = q_ref[b, 0]
        k = k_ref[b, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if sm_scale != 1.0 and not exp2:
            s = s * sm_scale
        s = s + bias
        if full_tile:
            p = expf(s - lse_ref[b, 0] * lse_mult)
        else:
            lse = lse_ref[b, 0]
            lse_ok = lse > _NEG_INF / 2
            p = jnp.where(mask & lse_ok,
                          expf(s - jnp.where(lse_ok, lse, 0.0)
                               * lse_mult), 0.0)

        do = do_ref[b, 0]
        dp = jax.lax.dot_general(do, v_ref[b, 0], (((1,), (1,)), ((), ())),
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
        # dq is written once (no across-i accumulation): emit in the input
        # dtype directly so XLA has no f32->bf16 cast pass to run after
        dq_ref[b, 0] = (jax.lax.dot_general(
            g.astype(k_ref.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            * sm_scale).astype(dq_ref.dtype)
        if dw_mode != "skip":
            g_sum = g if g_sum is None else g_sum + g

    if dw_mode != "skip":
        _dw_accum(dw_ref, g_sum, h, i, 0, mode=dw_mode, block_m=block_m,
                  block_n=block_n, bidirectional=bidirectional,
                  num_buckets=num_buckets, max_distance=max_distance)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, w_ref, bias_ref, brange_ref, lse_ref,
                   delta_ref, do_ref, dq_ref, *, sm_scale, causal,
                   bidirectional, num_buckets, max_distance, m_len, n_len,
                   block_m, block_n, use_table, g_off, t_min, dw_mode,
                   full_tile=False):
    del dw_mode  # dq pass produces no bucket-weight gradient
    h = pl.program_id(1)
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
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if sm_scale != 1.0:
            s = s * sm_scale
        if use_table:
            s = s + bias_ref[0, 0]
        else:
            bucket = _bucket_tile(i, j, block_m, block_n,
                                  bidirectional=bidirectional,
                                  num_buckets=num_buckets,
                                  max_distance=max_distance)
            s = s + _bias_from_buckets(bucket, w_ref, h, num_buckets)
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
            p = jnp.where(mask & lse_ok,
                          jnp.exp(s - jnp.where(lse_ok, lse, 0.0)), 0.0)
        do = do_ref[0, 0]
        dp = jax.lax.dot_general(do, v_ref[0, 0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = p * (dp - delta_ref[0, 0])
        dq_ref[0, 0] += jax.lax.dot_general(
            g.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale


def _bwd(q, k, v, w, causal, sm_scale, bidirectional, num_buckets,
         max_distance, block_m, block_n, lse, o, do):
    batch, heads, m_len, d = q.shape
    n_len = k.shape[2]
    qp = _pad_to(q, 2, block_m)
    kp = _pad_to(k, 2, block_n)
    vp = _pad_to(v, 2, block_n)
    dop = _pad_to(do, 2, block_m)
    mp, np_ = qp.shape[2], kp.shape[2]
    wp = _prep_w(w)
    nb_pad = max(8, ((w.shape[0] + 7) // 8) * 8)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    deltap = _pad_to(delta, 2, block_m)[..., None]
    lsep = _pad_to(lse, 2, block_m)[..., None]

    n_i, n_j = mp // block_m, np_ // block_n
    use_table = (_table_bytes(mp, np_, heads, block_m, block_n)
                 <= _TABLE_BUDGET_BYTES)
    if use_table:
        g_off, t_min, _ = _offset_geometry(mp, np_, block_m, block_n)
        table, bmin, bmax = _build_offset_table(
            w, mp, np_, block_m, block_n, bidirectional=bidirectional,
            num_buckets=num_buckets, max_distance=max_distance,
            dtype=_table_dtype(q.dtype))
        brange = jnp.stack([bmin, bmax], axis=1)          # (n_off, 2) SMEM
    else:
        g_off, t_min = 1, 0
        table = jnp.zeros((1, 1, block_m, block_n), jnp.float32)
        brange = jnp.zeros((1, 2), jnp.int32)

    common = dict(sm_scale=sm_scale, causal=causal, bidirectional=bidirectional,
                  num_buckets=num_buckets, max_distance=max_distance,
                  m_len=m_len, n_len=n_len, block_m=block_m, block_n=block_n,
                  use_table=use_table, g_off=g_off, t_min=t_min,
                  dw_mode=_dw_mode(),
                  full_tile=(not causal and mp == m_len and np_ == n_len))

    def specs(order):
        # order: "kv" (b,h,j,i) or "q" (b,h,i,j)
        if order == "kv":
            qi = lambda b, h, j, i: (b, h, i, 0)
            ki = lambda b, h, j, i: (b, h, j, 0)
            ri = lambda b, h, j, i: (b, h, i, 0)
            bi = lambda b, h, j, i: (
                (j * block_n - i * block_m - t_min) // g_off, h, 0, 0)
        else:
            qi = lambda b, h, i, j: (b, h, i, 0)
            ki = lambda b, h, i, j: (b, h, j, 0)
            ri = lambda b, h, i, j: (b, h, i, 0)
            bi = lambda b, h, i, j: (
                (j * block_n - i * block_m - t_min) // g_off, h, 0, 0)
        if not use_table:
            bi = (lambda b, h, x, y: (0, 0, 0, 0))
        return [
            pl.BlockSpec((1, 1, block_m, d), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n, d), ki, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n, d), ki, memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, (lambda *a: (0, 0)), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_m, block_n), bi, memory_space=pltpu.VMEM),
            pl.BlockSpec(brange.shape, (lambda *a: (0, 0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_m, 1), ri, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_m, 1), ri, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_m, d), qi, memory_space=pltpu.VMEM),
        ]

    # Default ON: the single-sweep backward measured 111.7k tok/s vs 105.1k
    # for the two-pass backward on a full fat5-small train step (v5e, round 2
    # on-chip A/B).  Set FLASHT5_RPE_FUSED_BWD=0 to fall back to two-pass.
    fused = _os.environ.get("FLASHT5_RPE_FUSED_BWD", "1") != "0"

    # batch-innermost resident-bias specialization (see _bwd_fused_kernel_nj1)
    # gated on the dk/dv scratch fitting comfortably in scoped VMEM
    if (fused and use_table and n_j == 1
            and _os.environ.get("FLASHT5_RPE_FWD_RESIDENT", "1") != "0"
            and 2 * batch * block_n * d * 4 <= 8 * 1024 * 1024):
        # Bwd q-tile sweep on a full v5e train step (round 2, bwd-only knob):
        # 128 -> 119.5k tok/s, 256 -> 122.2-123.5k (plateau; repeats within
        # ~1k noise). Bigger tiles amortize per-program overhead (~2-5us x
        # 512 programs at 128); the skew-roll dW cost grows with block_m and
        # cancels further gains. Needs the raised vmem_limit_bytes below
        # (at 256 the kernel exceeds Mosaic's 16MB default scoped budget).
        # FLASHT5_RPE_BWD_BM overrides for A/B (capped by the padded M).
        bm2 = min(mp, max(16, int(
            _os.environ.get("FLASHT5_RPE_BWD_BM", "256"))))
        while mp % bm2:
            bm2 //= 2
        g2, t2, _ = _offset_geometry(mp, np_, bm2, block_n)
        bfold = _bfold_ok(batch, block_n, d)
        exp2 = _exp2_on() and bfold
        table2, _, _ = _build_offset_table(
            w * _LOG2E if exp2 else w, mp, np_, bm2, block_n,
            bidirectional=bidirectional,
            num_buckets=num_buckets, max_distance=max_distance,
            dtype=_table_dtype(q.dtype))
        nb_j1 = max(8, ((w.shape[0] + 7) // 8) * 8)
        if bfold:
            if exp2:
                qp = (qp * (sm_scale * _LOG2E)).astype(q.dtype)
            # batch-folded variant (see _bwd_fused_kernel_nj1_bfold)
            dq, dk, dv, dw_all = pl.pallas_call(
                functools.partial(
                    _bwd_fused_kernel_nj1_bfold, sm_scale=sm_scale,
                    causal=causal, bidirectional=bidirectional,
                    num_buckets=num_buckets, max_distance=max_distance,
                    m_len=m_len, n_len=n_len, block_m=bm2,
                    block_n=block_n, batch=batch, dw_mode=_dw_mode(),
                    exp2=exp2,
                    full_tile=(not causal and mp == m_len and np_ == n_len)),
                grid=(heads, mp // bm2),
                in_specs=[
                    pl.BlockSpec((batch, 1, bm2, d),
                                 lambda h, i: (0, h, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch, 1, block_n, d),
                                 lambda h, i: (0, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch, 1, block_n, d),
                                 lambda h, i: (0, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, bm2, block_n),
                                 lambda h, i: ((-i * bm2 - t2) // g2, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch, 1, bm2, 1),
                                 lambda h, i: (0, h, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch, 1, bm2, d),
                                 lambda h, i: (0, h, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch, 1, bm2, d),
                                 lambda h, i: (0, h, i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((batch, 1, bm2, d),
                                 lambda h, i: (0, h, i, 0),
                                 memory_space=pltpu.VMEM),
                    # dk/dv blocks index only on h: they are the across-i
                    # accumulators, copied out once per head
                    pl.BlockSpec((batch, 1, block_n, d),
                                 lambda h, i: (0, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((batch, 1, block_n, d),
                                 lambda h, i: (0, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, nb_j1, _HEAD_LANES),
                                 lambda h, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(qp.shape, q.dtype),
                    jax.ShapeDtypeStruct(kp.shape, jnp.float32),
                    jax.ShapeDtypeStruct(vp.shape, jnp.float32),
                    jax.ShapeDtypeStruct((1, nb_j1, _HEAD_LANES),
                                         jnp.float32),
                ],
                compiler_params=_compiler_params(
                    ("arbitrary", "arbitrary"),
                    vmem_limit_bytes=96 * 1024 * 1024),
                interpret=interpret_mode(),
            )(qp, kp, vp, table2, lsep, _pad_to(o, 2, block_m), dop)
            nb, h_real = w.shape
            dw = dw_all[0, :nb, :h_real].astype(w.dtype)
            return (dq[:, :, :m_len].astype(q.dtype),
                    dk[:, :, :n_len].astype(k.dtype),
                    dv[:, :, :n_len].astype(v.dtype),
                    dw)
        dq, dk, dv, dw_all = pl.pallas_call(
            functools.partial(
                _bwd_fused_kernel_nj1, sm_scale=sm_scale, causal=causal,
                bidirectional=bidirectional, num_buckets=num_buckets,
                max_distance=max_distance, m_len=m_len, n_len=n_len,
                block_m=bm2, block_n=block_n, dw_mode=_dw_mode(),
                full_tile=(not causal and mp == m_len and np_ == n_len)),
            grid=(heads, mp // bm2, batch),
            in_specs=[
                pl.BlockSpec((1, 1, bm2, d),
                             lambda h, i, b: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                # k/v span all batches (index only on h): fetched once per
                # head instead of once per (i, b) program
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i, b: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((batch, 1, block_n, d),
                             lambda h, i, b: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bm2, block_n),
                             lambda h, i, b: (
                                 (-i * bm2 - t2) // g2, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bm2, 1),
                             lambda h, i, b: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bm2, d),
                             lambda h, i, b: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bm2, d),
                             lambda h, i, b: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bm2, d),
                             lambda h, i, b: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                # dk/dv accumulate across the i sweep; only the LAST i visit
                # holds slot b's final sum. Intermediate visits are routed to
                # a garbage block (row `batch`) whose index never changes, so
                # Pallas elides their HBM copy-outs — without this, every
                # program DMAs 2x(block_n, d) fp32 (~0.5MB x grid-size per
                # layer of dead writes, ~30% of this kernel's runtime).
                pl.BlockSpec(
                    (1, 1, block_n, d),
                    lambda h, i, b: (
                        jnp.where(i == (mp // bm2) - 1, b, batch), h, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, block_n, d),
                    lambda h, i, b: (
                        jnp.where(i == (mp // bm2) - 1, b, batch), h, 0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb_j1, _HEAD_LANES),
                             lambda h, i, b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(qp.shape, q.dtype),
                jax.ShapeDtypeStruct((batch + 1,) + kp.shape[1:], jnp.float32),
                jax.ShapeDtypeStruct((batch + 1,) + vp.shape[1:], jnp.float32),
                jax.ShapeDtypeStruct((1, nb_j1, _HEAD_LANES), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((batch, block_n, d), jnp.float32),
                pltpu.VMEM((batch, block_n, d), jnp.float32),
                pltpu.VMEM((bm2, block_n), jnp.float32),
            ],
            compiler_params=_compiler_params(
                ("arbitrary", "arbitrary", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret_mode(),
        )(qp, kp, vp, table2, lsep, _pad_to(o, 2, block_m), dop)
        nb, h_real = w.shape
        dw = dw_all[0, :nb, :h_real].astype(w.dtype)
        return (dq[:, :, :m_len],
                dk[:batch, :, :n_len].astype(k.dtype),
                dv[:batch, :, :n_len].astype(v.dtype),
                dw)

    if fused:
        # single-sweep backward: p computed once per tile, dq accumulated
        # through an aliased HBM buffer (see _bwd_fused_kernel)
        dq_zero = jnp.zeros(qp.shape, jnp.float32)
        dq, dk, dv, dw_all = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, **common),
            grid=(batch, heads, np_ // block_n, mp // block_m),
            in_specs=specs("kv") + [
                pl.BlockSpec((1, 1, block_m, d),
                             lambda b, h, j, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((1, 1, block_m, d),
                             lambda b, h, j, i: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d),
                             lambda b, h, j, i: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_n, d),
                             lambda b, h, j, i: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb_pad, _HEAD_LANES),
                             lambda b, h, j, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(qp.shape, jnp.float32),
                jax.ShapeDtypeStruct(kp.shape, jnp.float32),
                jax.ShapeDtypeStruct(vp.shape, jnp.float32),
                jax.ShapeDtypeStruct((batch, nb_pad, _HEAD_LANES),
                                     jnp.float32),
            ],
            input_output_aliases={9: 0},
            compiler_params=_compiler_params(
                ("parallel", "parallel", "arbitrary", "arbitrary")),
            interpret=interpret_mode(),
        )(qp, kp, vp, wp, table, brange, lsep, deltap, dop, dq_zero)
        nb, h_real = w.shape
        dw = jnp.sum(dw_all, axis=0)[:nb, :h_real].astype(w.dtype)
        return (dq[:, :, :m_len].astype(q.dtype),
                dk[:, :, :n_len].astype(k.dtype),
                dv[:, :, :n_len].astype(v.dtype),
                dw)

    dk, dv, dw_all = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(batch, heads, np_ // block_n, mp // block_m),
        in_specs=specs("kv"),
        out_specs=[
            pl.BlockSpec((1, 1, block_n, d), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n, d), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_pad, _HEAD_LANES),
                         lambda b, h, j, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(kp.shape, jnp.float32),
            jax.ShapeDtypeStruct(vp.shape, jnp.float32),
            jax.ShapeDtypeStruct((batch, nb_pad, _HEAD_LANES), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(qp, kp, vp, wp, table, brange, lsep, deltap, dop)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(batch, heads, mp // block_m, np_ // block_n),
        in_specs=specs("q"),
        out_specs=pl.BlockSpec((1, 1, block_m, d),
                               lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
        compiler_params=_compiler_params(("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(qp, kp, vp, wp, table, brange, lsep, deltap, dop)

    nb, h_real = w.shape
    dw = jnp.sum(dw_all, axis=0)[:nb, :h_real].astype(w.dtype)
    return (dq[:, :, :m_len].astype(q.dtype),
            dk[:, :, :n_len].astype(k.dtype),
            dv[:, :, :n_len].astype(v.dtype),
            dw)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _far(q, k, v, w, causal, sm_scale, bidirectional, num_buckets,
         max_distance, block_m, block_n):
    o, _ = _fwd(q, k, v, w, causal, sm_scale, bidirectional, num_buckets,
                max_distance, block_m, block_n)
    return o


def _far_fwd(q, k, v, w, causal, sm_scale, bidirectional, num_buckets,
             max_distance, block_m, block_n):
    o, lse = _fwd(q, k, v, w, causal, sm_scale, bidirectional, num_buckets,
                  max_distance, block_m, block_n)
    return o, (q, k, v, w, lse, o)


def _far_bwd(causal, sm_scale, bidirectional, num_buckets, max_distance,
             block_m, block_n, res, do):
    q, k, v, w, lse, o = res
    bm, bn = _bwd_blocks(block_m, block_n, q.shape[2], k.shape[2])
    return _bwd(q, k, v, w, causal, sm_scale, bidirectional, num_buckets,
                max_distance, bm, bn, lse, o, do)


_far.defvjp(_far_fwd, _far_bwd)


def flash_attention_rpe(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rpe_weights: Optional[jnp.ndarray],
    *,
    causal: bool = False,
    sm_scale: float = 1.0,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
    block_m: int = DEFAULT_BLOCK_M,
    block_n: int = DEFAULT_BLOCK_N,
) -> jnp.ndarray:
    """Linear-memory RPE flash attention.

    q: (B,H,M,D); k,v: (B,H,N,D); rpe_weights: (num_buckets, H) bucket
    embedding (the reference passes `relative_attention_bias.weight.t()`,
    modeling_flash_t5.py:277). With rpe_weights=None (e.g. decoder
    cross-attention, which has no positional bias) this is plain flash
    attention.
    """
    if rpe_weights is None:
        from flasht5_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, None, causal=causal, sm_scale=sm_scale,
                               block_m=block_m, block_n=block_n)
    round16 = lambda x: ((x + 15) // 16) * 16
    if block_m == DEFAULT_BLOCK_M:
        # forward q-tile (trace-time env knob). Default 512 since round 3:
        # halves the (h, i) grid's program count and K/V re-reads; chained
        # A/B at (B16,H12,S1024,D64) measured fwd 0.981->0.872ms with the
        # bf16 table, end-to-end neutral. 1024 crashes the remote compiler.
        block_m = int(_os.environ.get("FLASHT5_RPE_FWD_BM", "512"))
    block_m = min(block_m, round16(q.shape[2]))
    block_n = min(block_n, round16(k.shape[2]))
    return _far(q, k, v, rpe_weights, causal, sm_scale, bidirectional,
                num_buckets, max_distance, block_m, block_n)
