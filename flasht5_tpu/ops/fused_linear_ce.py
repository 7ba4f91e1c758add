"""Fused lm_head matmul + cross-entropy: logits never round-trip HBM.

The reference's fused Triton CE (src/model/ops/cross_entropy_loss.py) kills
the softmax round-trip but still materializes the (rows, vocab) logits that
the lm_head matmul wrote to HBM, reads them in the CE forward, reads them
again in the CE backward, writes dlogits, and reads dlogits twice more in the
dW/dx matmuls — ~5 full (rows x V) HBM round-trips per step. On TPU the
right fusion boundary is the *matmul epilogue*: compute each (BR, BV) logits
tile on the MXU inside the kernel, consume it immediately (streaming LSE in
the forward; dlogits -> dx/dW contraction in the backward), and never write
it out. At the flagship shape (rows=2048, V=32768, bf16) that removes
~640 MB of logits traffic per train step.

Forward: grid (V/BV, rows/BR) with rows innermost, so each weight tile is
fetched exactly once (W streamed once = 32 MB; x re-read V/BV times = 32 MB).
The kernel is a pure matmul + streaming logsumexp (same online rescaling
recurrence as flash attention); the label-logit term is an XLA column gather
of W outside the kernel (reads rows*d elements, not rows*V), mirroring the
round-3 finding that the in-kernel one-hot compare costs ~0.1 ms/call.

Backward: same grid. Each tile recomputes its logits (one extra MXU pass —
~0.35 ms at flagship, cheaper than the ~0.6 ms of dlogits HBM traffic it
replaces), forms dlogits in registers from (probs, one-hot, z-loss terms),
and contracts immediately: dx accumulates in a full-rows f32 VMEM scratch
across weight tiles; dW accumulates per weight tile across row blocks in a
(d, BV) f32 scratch and is emitted once per tile.

Semantics match ops/cross_entropy.cross_entropy_loss (reference
cross_entropy_loss.py:52-111): per-row loss, z-loss (lse_square_scale),
label smoothing over total_classes, logit_scale, ignore_index. The split/
tensor-parallel combine stays in parallel/vocab_parallel.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flasht5_tpu.runtime import interpret_mode
from flasht5_tpu.ops.flash_attention import _compiler_params

_IGNORE = -100


def _blocks(rows: int, v: int) -> Tuple[int, int]:
    import os
    br = int(os.environ.get("FLASHT5_FLCE_ROWS", "0") or 0) or 256
    bv = int(os.environ.get("FLASHT5_FLCE_COLS", "0") or 0) or 2048
    br = min(br, max(8, -(-rows // 8) * 8))
    bv = min(bv, max(128, -(-v // 128) * 128))
    return br, bv


# ---------------------------------------------------------------------------
# Forward kernel: streaming LSE over weight tiles, W read exactly once
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, lse_ref, sum_ref, m_acc, se_acc, sl_acc, *,
                n_cols: int, logit_scale: float, smoothing: float,
                block_r: int, block_v: int, n_vtiles: int, ragged: bool):
    j = pl.program_id(0)          # weight tile (outer: W streamed once)
    i = pl.program_id(1)          # row block (inner)

    x = x_ref[...]
    w = w_ref[...]
    logits = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
    if logit_scale != 1.0:
        logits = logits * logit_scale
    br, bv = logits.shape
    if ragged:
        col_ids = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (br, bv), 1)
        valid = col_ids < n_cols
        masked = jnp.where(valid, logits, -jnp.inf)
    else:
        valid = None
        masked = logits

    rows_slice = (pl.ds(i * block_r, block_r), slice(None))

    @pl.when(j == 0)
    def _init():
        m_acc[rows_slice] = jnp.full((br, 1), -1e30, jnp.float32)
        se_acc[rows_slice] = jnp.zeros((br, 1), jnp.float32)
        sl_acc[rows_slice] = jnp.zeros((br, 1), jnp.float32)

    m_old = m_acc[rows_slice]
    m_new = jnp.maximum(m_old, jnp.max(masked, axis=-1, keepdims=True))
    m_new = jnp.maximum(m_new, -1e30)
    p = jnp.exp(masked - m_new)
    if ragged:
        p = jnp.where(valid, p, 0.0)
    se = (se_acc[rows_slice] * jnp.exp(m_old - m_new)
          + jnp.sum(p, axis=-1, keepdims=True))
    m_acc[rows_slice] = m_new
    se_acc[rows_slice] = se

    if smoothing > 0.0:
        zeroed = jnp.where(valid, logits, 0.0) if ragged else logits
        sl = sl_acc[rows_slice] + jnp.sum(zeroed, axis=-1, keepdims=True)
        sl_acc[rows_slice] = sl

    @pl.when(j == n_vtiles - 1)
    def _emit():
        lse_ref[...] = jnp.log(se) + m_new
        sum_ref[...] = sl_acc[rows_slice] if smoothing > 0.0 else se


# ---------------------------------------------------------------------------
# Backward kernel: recompute logits tile, contract dlogits in place
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, w_ref, labels_ref, lse_ref, dloss_ref, dz_ref,
                dx_ref, dw_ref, dx_acc, dw_acc, *,
                n_cols: int, total_classes: int, smoothing: float,
                logit_scale: float, lse_square_scale: float,
                ignore_index: int, block_r: int, block_v: int,
                n_vtiles: int, n_rblocks: int, ragged: bool):
    j = pl.program_id(0)
    i = pl.program_id(1)

    x = x_ref[...]
    w = w_ref[...]
    logits = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
    if logit_scale != 1.0:
        logits = logits * logit_scale
    br, bv = logits.shape
    col_ids = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (br, bv), 1)

    labels = labels_ref[...][:, 0]
    lse = lse_ref[...][:, 0]
    ignored = labels == ignore_index
    dloss = jnp.where(ignored, 0.0, dloss_ref[...][:, 0])
    dz = jnp.where(ignored, 0.0, dz_ref[...][:, 0])

    probs = jnp.exp(logits - lse[:, None])
    onehot = col_ids == labels[:, None]
    if smoothing > 0.0:
        ce_grad = (probs - smoothing / total_classes
                   - jnp.where(onehot, 1.0 - smoothing, 0.0))
    else:
        ce_grad = probs - jnp.where(onehot, 1.0, 0.0)
    # loss = ce + z with z = s*lse^2: z's probs term flows from BOTH
    # cotangents (loss includes z), ce only from dloss — matches _bwd_kernel
    # in ops/cross_entropy.py.
    z_grad = (2.0 * lse_square_scale * lse)[:, None] * probs
    dl = dloss[:, None] * ce_grad + (dloss + dz)[:, None] * z_grad
    if logit_scale != 1.0:
        dl = dl * logit_scale
    if ragged:
        dl = jnp.where(col_ids < n_cols, dl, 0.0)
    # Cast to the compute dtype for the two contractions: the unfused path's
    # dlogits are materialized in bf16 before XLA's dx/dW matmuls, so this
    # keeps gradient numerics identical while feeding the MXU its fast path.
    dl_c = dl.astype(x.dtype)

    rows_slice = (pl.ds(i * block_r, block_r), slice(None))

    # dx_i += dl @ W_j^T   (contract over the vocab tile)
    dx_part = jax.lax.dot_general(dl_c, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    prev = jnp.where(j == 0, jnp.zeros_like(dx_part), dx_acc[rows_slice])
    dx_acc[rows_slice] = prev + dx_part

    # dW_j += x_i^T @ dl   (contract over the row block)
    dw_part = jax.lax.dot_general(x, dl_c, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init_dw():
        dw_acc[...] = dw_part

    @pl.when(i > 0)
    def _add_dw():
        dw_acc[...] += dw_part

    @pl.when(i == n_rblocks - 1)
    def _emit_dw():
        dw_ref[...] = dw_acc[...].astype(dw_ref.dtype)

    @pl.when(j == n_vtiles - 1)
    def _emit_dx():
        dx_ref[...] = dx_acc[rows_slice].astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

def _pad_rows(x, labels, br, ignore_index):
    rows = x.shape[0]
    pad = (-rows) % br
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, pad),), constant_values=ignore_index)
    return x, labels, rows


def _pad_cols(w, bv):
    v = w.shape[1]
    pad = (-v) % bv
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    return w


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_linear_cross_entropy(
    x: jnp.ndarray,
    w: jnp.ndarray,
    labels: jnp.ndarray,
    lse_square_scale: float = 0.0,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    ignore_index: int = _IGNORE,
    total_classes: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (loss, z_loss) of softmax-CE over logits = x @ w.

    x: (rows, d) activations; w: (d, V) lm_head weight (any float dtype —
    cast to x.dtype for the matmul exactly like models/t5._matmul);
    labels: (rows,) int. Returns fp32 per-row losses; reduce outside.
    Gradients flow to x and w; logits are never materialized in HBM.
    """
    (loss, z), _ = _flce_fwd(x, w, labels, lse_square_scale, label_smoothing,
                             logit_scale, ignore_index, total_classes)
    return loss, z


def _flce_fwd(x, w, labels, lse_square_scale, label_smoothing, logit_scale,
              ignore_index, total_classes):
    rows, d = x.shape
    v = w.shape[1]
    br, bv = _blocks(rows, v)
    wc = w.astype(x.dtype)
    px, plabels, rows = _pad_rows(x, labels, br, ignore_index)
    pw = _pad_cols(wc, bv)
    prow = px.shape[0]
    vpad = pw.shape[1]
    n_vtiles = vpad // bv
    n_rblocks = prow // br

    kern = functools.partial(
        _fwd_kernel, n_cols=v, logit_scale=logit_scale,
        smoothing=label_smoothing, block_r=br, block_v=bv,
        n_vtiles=n_vtiles, ragged=(vpad != v))
    out_spec = pl.BlockSpec((br, 1), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    plse, psum = pl.pallas_call(
        kern, grid=(n_vtiles, n_rblocks),
        in_specs=[
            pl.BlockSpec((br, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((prow, 1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((prow, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(
            ("arbitrary", "arbitrary"), vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret_mode(),
    )(px, pw)
    lse = plse[:rows, 0]

    # Label-logit term via a column gather of W — reads rows*d elements
    # instead of scanning rows*V logits (round-3 ce_tile_sweep finding).
    labels = labels.astype(jnp.int32)
    safe = jnp.clip(labels, 0, v - 1)
    wl = jnp.take(wc, safe, axis=1)                     # (d, rows)
    label_logit = jnp.sum(x.astype(jnp.float32) * wl.T.astype(jnp.float32),
                          axis=-1) * logit_scale

    if label_smoothing > 0.0:
        tc = total_classes or v
        sum_logits = psum[:rows, 0]
        loss = (lse - label_smoothing * sum_logits / tc
                - (1.0 - label_smoothing) * label_logit)
    else:
        loss = lse - label_logit
    z = lse_square_scale * lse * lse
    loss = loss + z
    ignored = labels == ignore_index
    loss = jnp.where(ignored, 0.0, loss)
    z = jnp.where(ignored, 0.0, z)
    return (loss, z), (x, w, labels, lse)


def _flce_bwd(lse_square_scale, label_smoothing, logit_scale, ignore_index,
              total_classes, res, grads):
    x, w, labels, lse = res
    dloss, dz = grads
    rows, d = x.shape
    v = w.shape[1]
    br, bv = _blocks(rows, v)
    wc = w.astype(x.dtype)
    px, plabels, rows = _pad_rows(x, labels, br, ignore_index)
    pw = _pad_cols(wc, bv)
    prow = px.shape[0]
    vpad = pw.shape[1]
    n_vtiles = vpad // bv
    n_rblocks = prow // br
    pad = prow - rows
    plse = jnp.pad(lse, ((0, pad),)) if pad else lse
    pdloss = jnp.pad(dloss, ((0, pad),)) if pad else dloss
    pdz = jnp.pad(dz, ((0, pad),)) if pad else dz

    kern = functools.partial(
        _bwd_kernel, n_cols=v, total_classes=total_classes or v,
        smoothing=label_smoothing, logit_scale=logit_scale,
        lse_square_scale=lse_square_scale, ignore_index=ignore_index,
        block_r=br, block_v=bv, n_vtiles=n_vtiles, n_rblocks=n_rblocks,
        ragged=(vpad != v))
    row_spec = pl.BlockSpec((br, 1), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    dx, dw = pl.pallas_call(
        kern, grid=(n_vtiles, n_rblocks),
        in_specs=[
            pl.BlockSpec((br, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=[
            pl.BlockSpec((br, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bv), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((prow, d), x.dtype),
            jax.ShapeDtypeStruct((d, vpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((prow, d), jnp.float32),
            pltpu.VMEM((d, bv), jnp.float32),
        ],
        compiler_params=_compiler_params(
            ("arbitrary", "arbitrary"), vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret_mode(),
    )(px, pw, plabels.reshape(-1, 1).astype(jnp.int32),
      plse.reshape(-1, 1), pdloss.reshape(-1, 1), pdz.reshape(-1, 1))
    return dx[:rows], dw[:, :v].astype(w.dtype), None


fused_linear_cross_entropy.defvjp(_flce_fwd, _flce_bwd)
