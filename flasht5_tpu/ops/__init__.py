"""Compute ops: pure-jnp references (oracles) and fused Pallas TPU kernels.

Layout mirrors the reference's L1 kernel layer (src/model/ops/ + utils/attn_ref.py):

- attn_ref:            pure-jnp attention oracle (reference: src/utils/attn_ref.py)
- rmsnorm:             T5 RMSNorm — jnp ref + fused Pallas fwd/bwd
- cross_entropy:       CE + z-loss + label smoothing — jnp ref + fused Pallas,
                       vocab-parallel variant
- flash_attention:     Pallas flash attention with additive bias (+dbias bwd)
- flash_attention_rpe: Pallas flash attention computing the T5 bucketed bias
                       in-kernel (linear memory in sequence length)
"""

from flasht5_tpu.ops.attn_ref import attn_ref
from flasht5_tpu.ops.rmsnorm import rms_norm, rms_norm_ref
from flasht5_tpu.ops.cross_entropy import cross_entropy_loss, cross_entropy_loss_ref

__all__ = [
    "attn_ref",
    "rms_norm",
    "rms_norm_ref",
    "cross_entropy_loss",
    "cross_entropy_loss_ref",
]
