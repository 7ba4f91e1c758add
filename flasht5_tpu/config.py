"""Model configuration.

Mirrors the configuration surface of the reference `FlashT5Config`
(reference: src/model/configuration_flash_t5.py:16-73 and the T5Config fields
it inherits), re-expressed as a frozen dataclass so it can be closed over by
jitted functions (hashable, static). YAML configs use the same three-section
layout as the reference (`model_args` / `training_args` / `collator_args`,
reference: train_flash_t5.py:32-65).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import yaml

# Canonical attention backends. The reference's names are accepted as aliases:
#   "ref"      -> "ref"        (pure-jnp reference math, attn_ref)
#   "triton"   -> "pallas"     (in-tree kernel w/ materialized bias)
#   "fa2_bias" -> "pallas"     (same capability class on TPU)
#   "fa2_rpe"  -> "pallas_rpe" (bias computed in-kernel from bucket weights,
#                               linear memory in sequence length)
_ATTENTION_ALIASES = {
    "ref": "ref",
    "triton": "pallas",
    "fa2_bias": "pallas",
    "fa2_rpe": "pallas_rpe",
    "pallas": "pallas",
    "pallas_rpe": "pallas_rpe",
}

POSITION_ENCODING_TYPES = ("t5", "ALiBi", "RoPE", "FIRE")


@dataclasses.dataclass(frozen=True)
class FlashT5Config:
    """Static model configuration.

    Field semantics follow the reference one-to-one so configs are
    interchangeable; see docs/configuration.md for the field reference
    (mirrors reference docs/configuration_file.md:7-69).
    """

    # --- T5 architecture (T5Config-inherited surface) ---
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 8
    num_decoder_layers: Optional[int] = None
    num_heads: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    initializer_factor: float = 1.0
    feed_forward_proj: str = "gated-gelu"  # informational; use_glu_mlp governs
    tie_word_embeddings: bool = False
    eos_token_id: int = 1
    # Reference defaults (configuration_flash_t5.py:22-23): decoder starts at 0,
    # pad defaults to -100 (the loss ignore index) unless the tokenizer sets it.
    decoder_start_token_id: int = 0
    pad_token_id: int = -100

    # --- flashT5 extensions (configuration_flash_t5.py:24-44) ---
    use_glu_mlp: bool = True
    position_encoding_type: str = "t5"
    use_randomized_position_encoding: bool = False
    label_smoothing: float = 0.0
    z_loss: Optional[float] = None
    attention_type: str = "ref"
    max_sequence_length: int = 1024
    attention_dropout_rate: float = 0.0
    alibi_mode: str = "symetric"
    # Kernel toggles. The reference exposes use_triton_layernorm /
    # use_triton_crossentropy (configuration_flash_t5.py:33-35); here the
    # fused implementations are Pallas. Aliases are normalized in from_dict.
    use_fused_layernorm: bool = False
    use_fused_crossentropy: bool = False
    # Fuse the lm_head matmul INTO the CE kernel (ops/fused_linear_ce.py):
    # logits never round-trip HBM in either direction. Goes beyond the
    # reference's fused CE (cross_entropy_loss.py:247 only avoids the
    # softmax round-trip). Applies when labels are given, the lm_head is
    # untied, and tp_axis is unset (the vocab-parallel path keeps its own
    # split CE).
    use_fused_lm_head_ce: bool = False
    crossentropy_inplace_backward: bool = False  # accepted, no-op under XLA
    use_gelu_act: bool = True
    use_full_bias_size: bool = False
    rotary_emb_fraction: float = 1.0
    rotary_base: float = 10000.0
    rotary_interleaved: bool = False
    rotary_scale_base: Optional[float] = None
    fire_mlp_width: int = 32
    use_masking: bool = False
    attention_scale: Optional[float] = None
    # Reference quirk (positional_encoding.py:319-330): FlashT5Attention calls
    # its rotary encoder with (q, k, v) all present, which hits the branch
    # that rotates **v** as well (with the k-side tables). True = bit-parity
    # with reference RoPE checkpoints; False = standard RoPE (q/k only).
    rope_rotate_v: bool = True

    # --- TPU-native extensions (no reference equivalent) ---
    dtype: str = "bfloat16"          # activation/compute dtype
    param_dtype: str = "float32"     # parameter storage dtype
    remat: bool = False              # jax.checkpoint each block
    decode_block_size: int = 128     # KV-cache padding granularity
    # Roll identical blocks (1..N-1) into one lax.scan: ~Nx smaller HLO and
    # compile time; numerics identical. Block 0 stays unrolled (it owns the
    # positional encoding).
    scan_blocks: bool = True
    # Set inside shard_map tensor-parallel regions: the mesh axis name over
    # which attention heads / MLP / vocab are sharded. When set, the model
    # inserts psums after row-parallel matmuls and uses the vocab-parallel
    # loss. None = single-shard semantics (pjit/GSPMD handles any sharding).
    tp_axis: Optional[str] = None
    # With tp_axis set: replace the blocking psum after row-parallel o/wo
    # matmuls with the ring-decomposed matmul_reducescatter + tiled
    # all_gather (parallel/collective_matmul.py), overlapping ICI hops with
    # the per-chunk matmuls (north-star "ICI collectives overlapped with
    # dequant-matmul"). Falls back to psum when token count doesn't divide
    # the axis.
    use_collective_matmul: bool = False

    def __post_init__(self):
        object.__setattr__(
            self, "attention_type",
            _ATTENTION_ALIASES.get(self.attention_type, self.attention_type),
        )
        if self.attention_type not in ("ref", "pallas", "pallas_rpe"):
            raise ValueError(f"unknown attention_type {self.attention_type!r}")
        if self.position_encoding_type not in POSITION_ENCODING_TYPES:
            raise ValueError(
                f"unknown position_encoding_type {self.position_encoding_type!r}")
        if self.attention_type == "pallas_rpe" and self.position_encoding_type != "t5":
            # reference: modeling_flash_t5.py:196-197
            raise ValueError("pallas_rpe requires T5 relative position encoding")
        if self.use_masking and not self.use_full_bias_size:
            # reference: modeling_flash_t5.py:186-187
            raise ValueError("use_masking requires use_full_bias_size")
        if self.num_decoder_layers is None:
            object.__setattr__(self, "num_decoder_layers", self.num_layers)

    # -- derived --
    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    @property
    def softmax_scale(self) -> float:
        # Reference quirk (modeling_flash_t5.py:183): default scale is
        # 1/sqrt(n_heads), NOT 1/sqrt(d_kv); configs typically override
        # with attention_scale=1.0 for T5's unscaled-dot-product convention.
        if self.attention_scale is not None:
            return float(self.attention_scale)
        return 1.0 / (self.num_heads ** 0.5)

    # -- construction --
    @classmethod
    def from_dict(cls, d: dict) -> "FlashT5Config":
        d = dict(d)
        # accept reference key names
        renames = {
            "use_triton_layernorm": "use_fused_layernorm",
            "use_triton_crossentropy": "use_fused_crossentropy",
        }
        for old, new in renames.items():
            if old in d:
                d[new] = d.pop(old)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        return cls(**d)

    @classmethod
    def from_json(cls, text: str) -> "FlashT5Config":
        return cls.from_dict(json.loads(text))

    @classmethod
    def from_yaml(cls, path: str) -> "FlashT5Config":
        with open(path) as f:
            cfg = yaml.safe_load(f)
        model_args = cfg.get("model_args", cfg)
        return cls.from_dict(model_args)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    def replace(self, **kw) -> "FlashT5Config":
        return dataclasses.replace(self, **kw)


def load_run_config(path: str) -> dict:
    """Load a full YAML run config with the reference's three-section layout.

    Returns {"model_args": ..., "training_args": ..., "collator_args": ...}
    with missing sections defaulted to {} (reference: train_flash_t5.py:32-65).
    """
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    return {
        "model_args": cfg.get("model_args", {}),
        "training_args": cfg.get("training_args", {}),
        "collator_args": cfg.get("collator_args", {}),
    }
