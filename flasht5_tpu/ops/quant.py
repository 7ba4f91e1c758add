"""INT8 weight-only quantization: quantize/dequantize + fused dequant-matmul.

North-star component (BASELINE.json): the reference has no quantization at
all; this provides per-output-channel symmetric INT8 weights with a Pallas
dequant+matmul kernel so weights stream from HBM at half/quarter the bytes of
bf16/fp32 — decode on TPU is HBM-bandwidth-bound, so weight bytes ≈ decode
latency.

Kernel design: grid (M/BM, N/BN, K/BK) with K innermost; the int8 weight tile
is dequantized in VMEM (VPU multiply by the per-column scale) and fed to the
MXU in bf16; accumulation in an fp32 VMEM scratch tile written out on the
last K step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flasht5_tpu.ops.flash_attention import _compiler_params
from flasht5_tpu.runtime import interpret_mode


class QuantizedTensor(NamedTuple):
    """Symmetric weight-only tensor: w ≈ qvalues * expand(scales).

    qvalues: (in, out) int8 or fp8-e4m3; scales: (groups, out) float32 where
    `groups` divides `in` — groups == 1 is plain per-output-channel scaling,
    groups > 1 is sub-channel ("group-wise") scaling over contiguous
    input-dim slices of size in/groups (finer scales → smaller rounding
    error where a column has outliers).
    Registered as a pytree (NamedTuple), so it slots into parameter trees.
    """
    qvalues: jnp.ndarray
    scales: jnp.ndarray

    @property
    def shape(self):
        return self.qvalues.shape

    @property
    def ndim(self):
        return self.qvalues.ndim

    @property
    def group_size(self):
        return self.qvalues.shape[0] // self.scales.shape[0]


def _group_absmax(w32: jnp.ndarray, group_size) -> jnp.ndarray:
    """(groups, out) absmax over contiguous input-dim groups."""
    k, n = w32.shape
    if group_size is None or group_size >= k:
        return jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    assert k % group_size == 0, (k, group_size)
    return jnp.max(jnp.abs(w32.reshape(k // group_size, group_size, n)),
                   axis=1)


def _expand_scales(scales: jnp.ndarray, k: int) -> jnp.ndarray:
    """(groups, out) -> (k, out) by repeating each group's row."""
    g, n = scales.shape
    if g == 1:
        return scales  # broadcasts
    return jnp.broadcast_to(scales[:, None, :], (g, k // g, n)).reshape(k, n)


def quantize_int8(w: jnp.ndarray, group_size: int | None = None
                  ) -> QuantizedTensor:
    """Symmetric INT8 quantization, per-output-channel (group_size=None) or
    group-wise over `group_size` input rows."""
    w32 = w.astype(jnp.float32)
    absmax = _group_absmax(w32, group_size)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    s_full = _expand_scales(scales, w32.shape[0])
    q = jnp.clip(jnp.round(w32 / s_full), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, scales)


def quantize_fp8(w: jnp.ndarray, group_size: int | None = None
                 ) -> QuantizedTensor:
    """FP8 (e4m3) quantization: scale each column (or input-dim group) so its
    absmax maps to the e4m3 max (448); 4 bits of mantissa beat int8 for
    near-zero weights at the same byte width (north-star: "INT8/FP8
    weight-only")."""
    w32 = w.astype(jnp.float32)
    absmax = _group_absmax(w32, group_size)
    scales = jnp.where(absmax > 0, absmax / 448.0, 1.0)
    s_full = _expand_scales(scales, w32.shape[0])
    q = (w32 / s_full).astype(jnp.float8_e4m3fn)
    return QuantizedTensor(q, scales)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    s_full = _expand_scales(qt.scales, qt.qvalues.shape[0])
    return (qt.qvalues.astype(jnp.float32) * s_full).astype(dtype)


def quant_matmul_ref(x: jnp.ndarray, qt: QuantizedTensor) -> jnp.ndarray:
    """jnp oracle: x @ dequant(w)."""
    return jnp.dot(x, dequantize(qt, x.dtype))


# ---------------------------------------------------------------------------
# Pallas fused dequant-matmul
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc_scr, *, n_k: int,
                per_group: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    w = q_ref[...].astype(jnp.bfloat16)          # dequant on VPU
    x = x_ref[...].astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if per_group:
        # group-wise scales: each k-tile lies inside one input-dim group, so
        # its scale is per-column-constant and distributes over the partial
        # product — the MXU still runs pure bf16. s_ref is (1, 1, bn) (the
        # group axis is the leading block dim, kept size-1 so the trailing
        # two dims satisfy Mosaic's (8, 128)-divisibility rule).
        acc_scr[...] += part * s_ref[0].astype(jnp.float32)
    else:
        acc_scr[...] += part

    @pl.when(k == n_k - 1)
    def _finalize():
        if per_group:
            o_ref[...] = acc_scr[...].astype(o_ref.dtype)
        else:
            o_ref[...] = (acc_scr[...]
                          * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def quant_matmul(x: jnp.ndarray, qt: QuantizedTensor,
                 *, block_m: int = 256, block_n: int = 512,
                 block_k: int = 512) -> jnp.ndarray:
    """Fused dequant + matmul for INT8 or FP8-e4m3 storage.

    x: (..., K); qt: (K, N) -> (..., N). The weight tile is upcast to bf16 on
    the VPU regardless of storage dtype (v5e has no fp8 MXU; the win is HBM
    bytes, not MXU rate), and scales are applied to the fp32 accumulator —
    once at the end for per-output-channel scaling, per k-tile for group-wise
    scaling — so the MXU runs pure bf16 either way.
    """
    orig_shape = x.shape
    k_dim = orig_shape[-1]
    n_dim = qt.qvalues.shape[1]
    x2 = x.reshape(-1, k_dim)
    m_dim = x2.shape[0]

    bm = min(block_m, max(8, ((m_dim + 7) // 8) * 8))
    bn = min(block_n, n_dim)
    bk = min(block_k, k_dim)
    n_groups = qt.scales.shape[0]
    per_group = n_groups > 1
    if per_group:
        # every k-tile must lie inside one scale group: shrink the k-tile to
        # the group size unless the group is a multiple of the tile
        gs = k_dim // n_groups
        if not (gs > bk and gs % bk == 0):
            bk = gs
    if n_dim % bn or k_dim % bk or bk % 128 or qt.qvalues.dtype not in (
            jnp.int8, jnp.float8_e4m3fn):
        # bk % 128: Mosaic requires the x-block's minor dim be a multiple of
        # 128, so group sizes < 128 (e.g. g64) take the XLA path (which still
        # fuses the dequant); the Pallas kernel handles group_size >= 128.
        # awkward shapes or exotic storage: XLA path (still fuses the dequant)
        return quant_matmul_ref(x, qt)

    pad_m = (-m_dim) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    grid = (x2.shape[0] // bm, n_dim // bn, k_dim // bk)

    if per_group:
        # (groups, 1, N) so the scale block's trailing dims are (1, bn)
        scales_in = qt.scales[:, None, :]
        s_spec = pl.BlockSpec(
            (1, 1, bn),
            lambda i, j, k: ((k * bk) // (k_dim // n_groups), 0, j),
            memory_space=pltpu.VMEM)
    else:
        scales_in = qt.scales
        s_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=grid[2], per_group=per_group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], n_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(x2, qt.qvalues, scales_in)
    return out[:m_dim].reshape(*orig_shape[:-1], n_dim)


# ---------------------------------------------------------------------------
# KV-cache quantization (per-position, per-head scales)
# ---------------------------------------------------------------------------

def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric INT8 over the head_dim (last) axis.

    x: (..., D) -> (int8 values (..., D), fp32 scales (..., 1)).
    Per-(batch, head, position) scaling keeps decode-time dequant exact up to
    rounding; scales ride along the cache and multiply back into the fp32
    attention scores (north-star INT8 KV cache, BASELINE.json).
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / scales), -127, 127).astype(jnp.int8)
    return q, scales


def dequantize_kv(q: jnp.ndarray, scales: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scales).astype(dtype)
