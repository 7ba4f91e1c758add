"""Parameter sharding rules (Megatron-style tensor parallelism for T5).

The reference has no weight sharding (DDP-only; SURVEY.md §2.8); these rules
define the TPU-native tensor layout over the ("data", "tensor") mesh:

- attention Wq/Wk/Wv: column-parallel over heads      (d_model, H*d_kv/t)
- attention o:        row-parallel                     (H*d_kv/t, d_model)
- MLP wi/wi_0/wi_1:   column-parallel                  (d_model, d_ff/t)
- MLP wo:             row-parallel                     (d_ff/t, d_model)
- lm_head:            column(vocab)-parallel           (d_model, V/t)
- relative bias:      head-parallel                    (num_buckets, H/t)
- embeddings, norms, FIRE mlp, scalars: replicated

Under pjit these are GSPMD layout annotations (XLA inserts the collectives);
the same PartitionSpecs drive the explicit shard_map training path.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_str: str, ndim: int, shape=None) -> P:
    col = P(None, "tensor")
    row = P("tensor", None)
    # int8/fp8 weight-only leaves: `.qvalues` shards exactly like the
    # unquantized weight; `.scales` follows the OUTPUT axis — column-
    # parallel weights split their per-output-channel scales with the
    # columns, row-parallel weights need the full output width of scales on
    # every shard (dequant happens before the psum), so per-channel (1, out)
    # scales replicate while group-wise (in/g, out) scales split their
    # input-group rows with the rows.
    quant_leaf = None
    for suf in (".qvalues", ".scales"):
        if path_str.endswith(suf):
            path_str = path_str[: -len(suf)]
            quant_leaf = suf[1:]

    def _base() -> P:
        if any(k in path_str for k in ("'Wq'", "'Wk'", "'Wv'")):
            return col
        if path_str.endswith("['o']"):
            return row
        if any(k in path_str for k in ("'wi'", "'wi_0'", "'wi_1'")):
            return col
        if "'wo'" in path_str:
            return row
        if "lm_head" in path_str:
            return col
        if "relative_attention_bias" in path_str:
            return col
        return P(*([None] * ndim))

    spec = _base()
    if quant_leaf == "scales" and spec == row:
        per_channel = shape is not None and len(shape) >= 1 and shape[0] == 1
        return P(None, None) if per_channel else row
    return spec


def param_pspecs(params) -> Any:
    """PartitionSpec pytree matching a parameter pytree."""

    def leaf(path, x):
        return _spec_for(jax.tree_util.keystr(path), getattr(x, "ndim", 0),
                         getattr(x, "shape", None))

    return jax.tree_util.tree_map_with_path(leaf, params)


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_pspecs(params))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
