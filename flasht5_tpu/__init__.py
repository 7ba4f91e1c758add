"""flasht5_tpu — a TPU-native T5/UL2 framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of catie-aq/flashT5
(reference mounted read-only at /root/reference): T5 v1.1 encoder-decoder with
UL2 pretraining, flash attention fused with relative-position biases, fused
RMSNorm and cross-entropy(+z-loss) kernels, four positional-encoding families,
a bf16-safe scaled AdamW, UL2 span-corruption collation with sequence packing,
HF-weight import, sharded (pjit/shard_map) training and a quantized inference
engine with KV caches — all designed TPU-first (MXU-aligned shapes, static
shapes under jit, Pallas/Mosaic kernels, mesh sharding over ICI/DCN).

Nothing here is a port: the reference defines *what* exists (math, API surface,
test strategy); the implementation is idiomatic JAX.
"""

from flasht5_tpu.config import FlashT5Config

__version__ = "0.1.0"

__all__ = ["FlashT5Config", "__version__"]
