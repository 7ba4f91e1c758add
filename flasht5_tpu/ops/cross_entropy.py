"""Fused cross-entropy + z-loss + label smoothing: jnp reference + Pallas kernel.

Capability parity with the reference's fused Triton CE
(src/model/ops/cross_entropy_loss.py): per-row loss with online LSE,
`logit_scale`, label smoothing (smoothing mass spread over `total_classes`),
z-loss (`lse_square_scale * lse^2`, reference :105), `ignore_index`, and the
vocab-split tensor-parallel semantics (`split=True` + `class_start_idx`:
per-shard partial loss that omits the not-yet-final LSE, reference :52-111);
the cross-shard combine lives in parallel/vocab_parallel.py and uses XLA
collectives instead of NCCL calls (reference :303-351).

The fused backward writes dlogits directly from (logits, lse, labels) — the
reference's in-place-backward memory saving (reference :247) is achieved here
by XLA buffer donation rather than explicit aliasing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flasht5_tpu.runtime import interpret_mode
from flasht5_tpu.ops.flash_attention import _compiler_params
import os as _os
_IGNORE = -100


# ---------------------------------------------------------------------------
# Reference (oracle)
# ---------------------------------------------------------------------------

def cross_entropy_loss_ref(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    lse_square_scale: float = 0.0,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    ignore_index: int = _IGNORE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (loss, z_loss) in fp32. logits: (rows, V); labels: (rows,)."""
    logits = logits.astype(jnp.float32) * logit_scale
    rows, v = logits.shape
    lse = jax.nn.logsumexp(logits, axis=-1)
    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    label_logit = jnp.take_along_axis(logits, safe_labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        loss = (lse
                - label_smoothing * jnp.sum(logits, axis=-1) / v
                - (1.0 - label_smoothing) * label_logit)
    else:
        loss = lse - label_logit
    z_loss = lse_square_scale * lse * lse
    loss = loss + z_loss
    ignored = labels == ignore_index
    return jnp.where(ignored, 0.0, loss), jnp.where(ignored, 0.0, z_loss)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(logits_ref, labels_ref, loss_ref, lse_ref, zloss_ref, *,
                n_cols: int, total_classes: int, class_start_idx: int,
                smoothing: float, logit_scale: float, lse_square_scale: float,
                ignore_index: int, split: bool):
    logits = logits_ref[...].astype(jnp.float32) * logit_scale  # (br, Vpad)
    br, vpad = logits.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (br, vpad), 1)
    valid = col_ids < n_cols
    masked = jnp.where(valid, logits, -jnp.inf)

    m = jnp.max(masked, axis=-1, keepdims=True)
    # guard all--inf rows (cannot happen for n_cols>=1 but keeps NaNs out)
    m = jnp.maximum(m, -1e30)
    sumexp = jnp.sum(jnp.where(valid, jnp.exp(masked - m), 0.0), axis=-1, keepdims=True)
    lse = (jnp.log(sumexp) + m)[:, 0]
    lse_ref[...] = lse[:, None]

    labels = labels_ref[...][:, 0]                 # (br,)
    local_label = labels - class_start_idx
    in_shard = (local_label >= 0) & (local_label < n_cols)
    onehot = (col_ids == local_label[:, None]) & valid
    label_logit = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)

    lse_term = jnp.float32(0.0) if split else lse
    if smoothing > 0.0:
        sum_logits = jnp.sum(jnp.where(valid, logits, 0.0), axis=-1)
        loss_in = (lse_term
                   - smoothing * sum_logits / total_classes
                   - (1.0 - smoothing) * label_logit)
        # label owned by another shard: keep the smoothing part only
        # (reference: cross_entropy_loss.py:100-103)
        loss_out = smoothing * (lse_term - sum_logits / total_classes)
        loss = jnp.where(in_shard, loss_in, loss_out)
    else:
        loss = jnp.where(in_shard, lse_term - label_logit, 0.0)

    if split:
        z = jnp.zeros_like(lse)
    else:
        z = lse_square_scale * lse * lse
        loss = loss + z

    ignored = labels == ignore_index
    loss_ref[...] = jnp.where(ignored, 0.0, loss)[:, None]
    zloss_ref[...] = jnp.where(ignored, 0.0, z)[:, None]


def _bwd_kernel(logits_ref, labels_ref, lse_ref, dloss_ref, dz_ref,
                dlogits_ref, *,
                n_cols: int, total_classes: int, class_start_idx: int,
                smoothing: float, logit_scale: float, lse_square_scale: float,
                ignore_index: int):
    logits = logits_ref[...].astype(jnp.float32) * logit_scale
    br, vpad = logits.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (br, vpad), 1)
    valid = col_ids < n_cols

    labels = labels_ref[...][:, 0]
    lse = lse_ref[...][:, 0]
    ignored = labels == ignore_index
    dloss = jnp.where(ignored, 0.0, dloss_ref[...][:, 0])
    dz = jnp.where(ignored, 0.0, dz_ref[...][:, 0])

    probs = jnp.exp(logits - lse[:, None])
    local_label = labels - class_start_idx
    onehot = (col_ids == local_label[:, None]) & valid
    if smoothing > 0.0:
        ce_grad = probs - smoothing / total_classes - jnp.where(onehot, 1.0 - smoothing, 0.0)
    else:
        ce_grad = probs - jnp.where(onehot, 1.0, 0.0)
    # loss = ce + z and z = s*lse^2 are both outputs; dz/dlogits = 2s*lse*probs
    # flows from BOTH cotangents (loss includes z), ce only from dloss.
    z_grad = (2.0 * lse_square_scale * lse)[:, None] * probs
    grad = dloss[:, None] * ce_grad + (dloss + dz)[:, None] * z_grad
    grad = jnp.where(valid, grad * logit_scale, 0.0)
    dlogits_ref[...] = grad.astype(dlogits_ref.dtype)


def _fwd_kernel_tiled(logits_ref, lse_ref, sum_ref, m_acc, se_acc, sl_acc, *,
                      n_cols: int, logit_scale: float, smoothing: float,
                      block_v: int, n_tiles: int, ragged: bool):
    """Vocab-tiled streaming LSE: grid (row_blocks, vocab_tiles) with the
    vocab dimension sequential and online-LSE accumulators in VMEM scratch
    (same rescaling recurrence as flash attention). The kernel is a PURE
    streaming logsumexp (+ optional row-sum for label smoothing): the
    label-logit gather and all loss assembly live OUTSIDE in XLA — a gather
    reads `rows` elements from HBM and the row-wise arithmetic fuses for
    free, so the per-element hot loop here is only convert/scale/max/exp/add
    (the one-hot compare + iota + select the previous version ran per element
    cost ~0.1ms/call at the flagship shape). Semantics identical to
    _fwd_kernel (reference cross_entropy_loss.py:52-111)."""
    j = pl.program_id(1)
    logits = logits_ref[...].astype(jnp.float32)
    if logit_scale != 1.0:
        logits = logits * logit_scale
    br, bv = logits.shape
    if ragged:
        col_ids = j * block_v + jax.lax.broadcasted_iota(
            jnp.int32, (br, bv), 1)
        valid = col_ids < n_cols
        masked = jnp.where(valid, logits, -jnp.inf)
    else:
        valid = None
        masked = logits

    @pl.when(j == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, -1e30)
        se_acc[...] = jnp.zeros_like(se_acc)
        sl_acc[...] = jnp.zeros_like(sl_acc)

    m_old = m_acc[...]                                   # (br, 1)
    m_new = jnp.maximum(m_old, jnp.max(masked, axis=-1, keepdims=True))
    m_new = jnp.maximum(m_new, -1e30)
    p = jnp.exp(masked - m_new)
    if ragged:
        p = jnp.where(valid, p, 0.0)
    se = se_acc[...] * jnp.exp(m_old - m_new) + jnp.sum(p, axis=-1,
                                                        keepdims=True)
    m_acc[...] = m_new
    se_acc[...] = se

    if smoothing > 0.0:
        zeroed = jnp.where(valid, logits, 0.0) if ragged else logits
        sl = sl_acc[...] + jnp.sum(zeroed, axis=-1, keepdims=True)
        sl_acc[...] = sl

    @pl.when(j == n_tiles - 1)
    def _emit():
        lse_ref[...] = jnp.log(se) + m_new
        sum_ref[...] = sl_acc[...] if smoothing > 0.0 else se


def _bwd_kernel_tiled(logits_ref, labels_ref, lse_ref, dloss_ref, dz_ref,
                      dlogits_ref, *,
                      n_cols: int, total_classes: int, class_start_idx: int,
                      smoothing: float, logit_scale: float,
                      lse_square_scale: float, ignore_index: int,
                      block_v: int, ragged: bool):
    """Vocab-tiled backward: each (br, bv) tile of dlogits depends only on
    its logits tile plus per-row (lse, labels, cotangents) — embarrassingly
    tile-parallel, no accumulators."""
    j = pl.program_id(1)
    logits = logits_ref[...].astype(jnp.float32) * logit_scale
    br, bv = logits.shape
    col_ids = j * block_v + jax.lax.broadcasted_iota(jnp.int32, (br, bv), 1)

    labels = labels_ref[...][:, 0]
    lse = lse_ref[...][:, 0]
    ignored = labels == ignore_index
    dloss = jnp.where(ignored, 0.0, dloss_ref[...][:, 0])
    dz = jnp.where(ignored, 0.0, dz_ref[...][:, 0])

    probs = jnp.exp(logits - lse[:, None])
    local_label = labels - class_start_idx
    onehot = col_ids == local_label[:, None]
    if ragged:
        onehot = onehot & (col_ids < n_cols)
    if smoothing > 0.0:
        ce_grad = (probs - smoothing / total_classes
                   - jnp.where(onehot, 1.0 - smoothing, 0.0))
    else:
        ce_grad = probs - jnp.where(onehot, 1.0, 0.0)
    z_grad = (2.0 * lse_square_scale * lse)[:, None] * probs
    grad = dloss[:, None] * ce_grad + (dloss + dz)[:, None] * z_grad
    grad = grad * logit_scale
    if ragged:
        grad = jnp.where(col_ids < n_cols, grad, 0.0)
    dlogits_ref[...] = grad.astype(dlogits_ref.dtype)


def _tiled_blocks(v: int):
    """(row_block, vocab_block) for the tiled kernels, env-overridable for
    on-chip sweeps (FLASHT5_CE_ROWS / FLASHT5_CE_COLS)."""
    br = int(_os.environ.get("FLASHT5_CE_ROWS", "0") or 0) or 256
    bv = int(_os.environ.get("FLASHT5_CE_COLS", "0") or 0) or 2048
    bv = min(bv, max(128, -(-v // 128) * 128))
    return br, bv


def _use_tiled() -> bool:
    return _os.environ.get("FLASHT5_CE_TILED", "1") != "0"


def _row_block(v: int) -> int:
    # The bwd kernel holds the logits block, the dlogits block, and fp32
    # temporaries at once — budget ~4MB fp32 per (br, V) buffer (32 rows at
    # vocab 32768; FLASHT5_CE_ROWS overrides for A/B). Round-1 used 1MB
    # (8 rows): at 2048 train rows that was 256 programs whose per-program
    # overhead alone (~2-5us) accounted for most of the measured 1.16ms CE
    # forward. 32 rows needs the raised vmem_limit_bytes passed below (it
    # overflows Mosaic's default 16MB scoped budget by 32KB on v5e).
    env = _os.environ.get("FLASHT5_CE_ROWS")
    if env:
        return max(1, int(env))
    br = max(1, (4 * 1024 * 1024) // (4 * v))
    b = 8
    while b * 2 <= min(br, 256):
        b *= 2
    return b


def _pad_inputs(logits, labels, br, ignore_index):
    rows, v = logits.shape
    pad = (-rows) % br
    if pad:
        logits = jnp.pad(logits, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, pad),), constant_values=ignore_index)
    return logits, labels, rows


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    lse_square_scale: float = 0.0,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    ignore_index: int = _IGNORE,
    total_classes: Optional[int] = None,
    class_start_idx: int = 0,
    split: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused per-row (loss, z_loss); reduce outside (the model wrapper
    reproduces the reference's mean-over-all-rows quirk, modeling:68)."""
    (loss, z), _ = _ce_fwd(logits, labels, lse_square_scale, label_smoothing,
                           logit_scale, ignore_index, total_classes,
                           class_start_idx, split)
    return loss, z


def _ce_call(logits, labels, *, kernel, extra_inputs=(), out_shapes,
             lse_square_scale, label_smoothing, logit_scale, ignore_index,
             total_classes, class_start_idx, split):
    rows, v = logits.shape
    br = _row_block(v)
    kern = functools.partial(
        kernel, n_cols=v, total_classes=total_classes or v,
        class_start_idx=class_start_idx, smoothing=label_smoothing,
        logit_scale=logit_scale, lse_square_scale=lse_square_scale,
        ignore_index=ignore_index, **({"split": split} if kernel is _fwd_kernel else {}))
    grid = (logits.shape[0] // br,)
    in_specs = [
        pl.BlockSpec((br, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
         for _ in extra_inputs]
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=[s for s, _ in out_shapes],
        out_shape=[o for _, o in out_shapes],
        compiler_params=_compiler_params(
            ("arbitrary",), vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret_mode(),
    )(logits, labels.reshape(-1, 1).astype(jnp.int32), *extra_inputs)


def _pad_cols(logits, bv):
    v = logits.shape[1]
    pad = (-v) % bv
    if pad:
        logits = jnp.pad(logits, ((0, 0), (0, pad)))
    return logits


def _ce_fwd_tiled(logits, labels, lse_square_scale, label_smoothing,
                  logit_scale, ignore_index, total_classes, class_start_idx,
                  split):
    rows, v = logits.shape
    br, bv = _tiled_blocks(v)
    plogits, plabels, rows = _pad_inputs(logits, labels, br, ignore_index)
    plogits = _pad_cols(plogits, bv)
    prow, vpad = plogits.shape
    n_tiles = vpad // bv
    kern = functools.partial(
        _fwd_kernel_tiled, n_cols=v, logit_scale=logit_scale,
        smoothing=label_smoothing, block_v=bv, n_tiles=n_tiles,
        ragged=(vpad != v))
    out_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    plse, psum = pl.pallas_call(
        kern, grid=(prow // br, n_tiles),
        in_specs=[
            pl.BlockSpec((br, bv), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((prow, 1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((br, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(
            ("parallel", "arbitrary"), vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret_mode(),
    )(plogits)
    lse = plse[:rows, 0]

    # Loss assembly in XLA: gather + row-wise ops on (rows,) vectors, fused
    # for free next to the kernel. Mirrors _fwd_kernel exactly.
    local_label = labels.astype(jnp.int32) - class_start_idx
    in_shard = (local_label >= 0) & (local_label < v)
    safe = jnp.clip(local_label, 0, v - 1)
    label_logit = jnp.take_along_axis(
        logits, safe[:, None], axis=1)[:, 0].astype(jnp.float32) * logit_scale
    lse_term = jnp.zeros_like(lse) if split else lse
    if label_smoothing > 0.0:
        sum_logits = psum[:rows, 0]
        tc = total_classes or v
        loss_in = (lse_term - label_smoothing * sum_logits / tc
                   - (1.0 - label_smoothing) * label_logit)
        loss_out = label_smoothing * (lse_term - sum_logits / tc)
        loss = jnp.where(in_shard, loss_in, loss_out)
    else:
        loss = jnp.where(in_shard, lse_term - label_logit, 0.0)
    if split:
        z = jnp.zeros_like(lse)
    else:
        z = lse_square_scale * lse * lse
        loss = loss + z
    ignored = labels == ignore_index
    loss = jnp.where(ignored, 0.0, loss)
    z = jnp.where(ignored, 0.0, z)
    res = (logits, labels, lse)
    return (loss, z), res


def _ce_bwd_tiled(lse_square_scale, label_smoothing, logit_scale,
                  ignore_index, total_classes, class_start_idx, split, res,
                  grads):
    logits, labels, lse = res
    dloss, dz = grads
    rows, v = logits.shape
    br, bv = _tiled_blocks(v)
    plogits, plabels, rows = _pad_inputs(logits, labels, br, ignore_index)
    plogits = _pad_cols(plogits, bv)
    prow, vpad = plogits.shape
    pad = prow - rows
    plse = jnp.pad(lse, ((0, pad),)) if pad else lse
    pdloss = jnp.pad(dloss, ((0, pad),)) if pad else dloss
    pdz = jnp.pad(dz, ((0, pad),)) if pad else dz
    kern = functools.partial(
        _bwd_kernel_tiled, n_cols=v, total_classes=total_classes or v,
        class_start_idx=class_start_idx, smoothing=label_smoothing,
        logit_scale=logit_scale, lse_square_scale=lse_square_scale,
        ignore_index=ignore_index, block_v=bv, ragged=(vpad != v))
    row_spec = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    dlogits = pl.pallas_call(
        kern, grid=(prow // br, vpad // bv),
        in_specs=[
            pl.BlockSpec((br, bv), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=[pl.BlockSpec((br, bv), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((prow, vpad), logits.dtype)],
        compiler_params=_compiler_params(
            ("parallel", "arbitrary"), vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret_mode(),
    )(plogits, plabels.reshape(-1, 1).astype(jnp.int32),
      plse.reshape(-1, 1), pdloss.reshape(-1, 1), pdz.reshape(-1, 1))
    if isinstance(dlogits, (list, tuple)):
        dlogits = dlogits[0]
    return dlogits[:rows, :v], None


def _ce_fwd(logits, labels, lse_square_scale, label_smoothing, logit_scale,
            ignore_index, total_classes, class_start_idx, split):
    if _use_tiled():
        return _ce_fwd_tiled(logits, labels, lse_square_scale,
                             label_smoothing, logit_scale, ignore_index,
                             total_classes, class_start_idx, split)
    rows, v = logits.shape
    br = _row_block(v)
    plogits, plabels, rows = _pad_inputs(logits, labels, br, ignore_index)
    prow = plogits.shape[0]
    spec = pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    loss, lse, z = _ce_call(
        plogits, plabels, kernel=_fwd_kernel,
        out_shapes=[(spec, jax.ShapeDtypeStruct((prow, 1), jnp.float32))] * 3,
        lse_square_scale=lse_square_scale, label_smoothing=label_smoothing,
        logit_scale=logit_scale, ignore_index=ignore_index,
        total_classes=total_classes, class_start_idx=class_start_idx, split=split)
    res = (logits, labels, lse[:rows, 0])
    return (loss[:rows, 0], z[:rows, 0]), res


def _ce_bwd(lse_square_scale, label_smoothing, logit_scale, ignore_index,
            total_classes, class_start_idx, split, res, grads):
    if _use_tiled():
        return _ce_bwd_tiled(lse_square_scale, label_smoothing, logit_scale,
                             ignore_index, total_classes, class_start_idx,
                             split, res, grads)
    logits, labels, lse = res
    dloss, dz = grads  # cotangents for (per-row loss, z_loss)
    rows, v = logits.shape
    br = _row_block(v)
    plogits, plabels, rows = _pad_inputs(logits, labels, br, ignore_index)
    pad = plogits.shape[0] - rows
    plse = jnp.pad(lse, ((0, pad),)) if pad else lse
    pdloss = jnp.pad(dloss, ((0, pad),)) if pad else dloss
    pdz = jnp.pad(dz, ((0, pad),)) if pad else dz
    spec = pl.BlockSpec((br, v), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dlogits = _ce_call(
        plogits, plabels, kernel=_bwd_kernel,
        extra_inputs=(plse.reshape(-1, 1), pdloss.reshape(-1, 1),
                      pdz.reshape(-1, 1)),
        out_shapes=[(spec, jax.ShapeDtypeStruct(plogits.shape, logits.dtype))],
        lse_square_scale=lse_square_scale, label_smoothing=label_smoothing,
        logit_scale=logit_scale, ignore_index=ignore_index,
        total_classes=total_classes, class_start_idx=class_start_idx, split=split)
    if isinstance(dlogits, (list, tuple)):
        dlogits = dlogits[0]
    return dlogits[:rows], None


cross_entropy_loss.defvjp(_ce_fwd, _ce_bwd)
