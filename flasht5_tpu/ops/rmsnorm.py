"""T5-style RMS layernorm: jnp reference + fused Pallas TPU kernel.

Capability parity with the reference's fused Triton RMSNorm
(src/model/ops/rms_norm.py): no mean subtraction, no bias, fp32 accumulation,
memory-lean backward that recomputes the normalized activations from the saved
input + rstd (reference design note: rms_norm.py:261). The weight gradient is
accumulated across row-blocks inside the kernel — TPU Pallas grids execute
sequentially per core, so accumulating into a revisited output block replaces
the reference's per-SM partial buffer + host reduction (rms_norm.py:211-234).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flasht5_tpu.runtime import interpret_mode


def _block_rows(n_rows: int, d: int) -> int:
    # Target ~2MB fp32 working set per block; keep sublane-aligned.
    target = max(1, (2 * 1024 * 1024) // (4 * d))
    br = 1
    while br * 2 <= min(target, n_rows):
        br *= 2
    return max(8, min(br, 1024))


# ---------------------------------------------------------------------------
# Reference (oracle)
# ---------------------------------------------------------------------------

def rms_norm_ref(x: jnp.ndarray, w: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """fp32-accumulated RMS norm, output cast to w.dtype when w is low precision
    (matches reference torch fallback, modeling_flash_t5.py:100-112)."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (w * y.astype(w.dtype)) if w.dtype != jnp.float32 else (w * y).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, y_ref, rstd_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    rstd_ref[...] = rstd
    y = x * rstd * w_ref[...].astype(jnp.float32)  # w_ref: (1, d), broadcasts
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, rstd_ref, dy_ref, dx_ref, dw_ref):
    x = x_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...]
    dy = dy_ref[...].astype(jnp.float32)

    xhat = x * rstd                       # recompute normalized activations
    wdy = dy * w
    c = jnp.mean(wdy * xhat, axis=-1, keepdims=True)
    dx = (wdy - xhat * c) * rstd
    dx_ref[...] = dx.astype(dx_ref.dtype)

    partial_dw = jnp.sum(dy * xhat, axis=0, keepdims=True)  # (1, d)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dw_ref[...] += partial_dw


def _pallas_fwd(x2d, w, eps):
    rows, d = x2d.shape
    br = _block_rows(rows, d)
    pad = (-rows) % br
    xp = jnp.pad(x2d, ((0, pad), (0, 0))) if pad else x2d
    grid = (xp.shape[0] // br,)
    y, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
            jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(xp, w.reshape(1, d))
    return y[:rows], rstd[:rows]


def _pallas_bwd(x2d, w, rstd, dy2d):
    rows, d = x2d.shape
    br = _block_rows(rows, d)
    pad = (-rows) % br
    if pad:
        # zero-padded rows contribute xhat=0 and dy=0, hence 0 to dw — safe.
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        dy2d = jnp.pad(dy2d, ((0, pad), (0, 0)))
        rstd = jnp.pad(rstd, ((0, pad), (0, 0)), constant_values=1.0)
    grid = (x2d.shape[0] // br,)
    dx, dw = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2d.shape, dy2d.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(x2d, w.reshape(1, d), rstd, dy2d)
    return dx[:rows], dw.reshape(d)


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Fused RMS norm over the last axis. x: (..., d); w: (d,)."""
    y, _ = _rms_norm_fwd(x, w, eps)
    return y


def _rms_norm_fwd(x, w, eps):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    y, rstd = _pallas_fwd(x2d, w, eps)
    return y.reshape(shape), (x2d, w, rstd)


def _rms_norm_bwd(eps, res, dy):
    x2d, w, rstd = res
    dy2d = dy.reshape(-1, dy.shape[-1])
    dx, dw = _pallas_bwd(x2d, w, rstd, dy2d)
    return dx.reshape(dy.shape), dw.astype(w.dtype)


rms_norm.defvjp(_rms_norm_fwd, _rms_norm_bwd)
