"""Parameter-tree quantization tool.

Converts every large linear weight in a model pytree to per-channel INT8
(ops/quant.py QuantizedTensor); norms, biases, positional tables and
(optionally) embeddings stay high-precision. The model's matmul dispatch
(models/t5.py _matmul) picks the fused dequant kernel automatically, so a
quantized tree is a drop-in replacement for forward/generate.

North-star tooling (BASELINE.json): "calibration/quantize tool over imported
checkpoints"; the Δppl harness lives in bench_quality.py.
"""

from __future__ import annotations

from typing import Any

import jax

from flasht5_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    quantize_fp8,
    quantize_int8,
)

_QUANT_KEYS = ("'Wq'", "'Wk'", "'Wv'", "['o']", "'wi'", "'wi_0'", "'wi_1'",
               "'wo'", "lm_head")


def _should_quantize(path_str: str, leaf) -> bool:
    if getattr(leaf, "ndim", 0) != 2:
        return False
    if "relative_attention_bias" in path_str or "pe_encoding" in path_str:
        return False
    return any(k in path_str for k in _QUANT_KEYS)


def quantize_params(params: Any, mode: str = "int8",
                    group_size: int | None = None) -> Any:
    """Quantize all eligible linears to INT8 or FP8. Returns a new pytree.

    group_size=None gives per-output-channel scales; an integer gives
    sub-channel (group-wise) scales over `group_size` input rows — finer
    scales shrink the quantization error of columns with outliers at a
    scale-storage cost of 4·(K/group_size)·N bytes per weight.
    """
    quantizer = {"int8": quantize_int8, "fp8": quantize_fp8}[mode]
    fallbacks = []

    def leaf(path, x):
        if _should_quantize(jax.tree_util.keystr(path), x):
            if group_size is not None:
                if x.shape[0] % group_size == 0:
                    return quantizer(x, group_size)
                fallbacks.append(jax.tree_util.keystr(path))
            return quantizer(x)
        return x

    out = jax.tree_util.tree_map_with_path(
        leaf, params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    if fallbacks:
        import warnings
        warnings.warn(
            f"quantize_params: {len(fallbacks)} weight(s) with input dim not "
            f"divisible by group_size={group_size} fell back to per-channel "
            f"scales (first: {fallbacks[0]})", stacklevel=2)
    return out


def count_group_fallbacks(params: Any, group_size: int) -> int:
    """Number of quantizable weights whose input dim is not divisible by
    `group_size` (these fall back to per-channel scales in quantize_params)."""
    n = 0

    def leaf(path, x):
        nonlocal n
        if (_should_quantize(jax.tree_util.keystr(path), x)
                and x.shape[0] % group_size != 0):
            n += 1
        return x

    jax.tree_util.tree_map_with_path(
        leaf, params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    return n


def dequantize_params(params: Any, dtype=None) -> Any:
    def leaf(x):
        if isinstance(x, QuantizedTensor):
            return dequantize(x, dtype or x.scales.dtype)
        return x

    return jax.tree.map(leaf, params,
                        is_leaf=lambda x: isinstance(x, QuantizedTensor))


def quantized_bytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(params,
                                is_leaf=lambda x: isinstance(x, QuantizedTensor)):
        if isinstance(leaf, QuantizedTensor):
            total += leaf.qvalues.size + leaf.scales.size * 4
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total
