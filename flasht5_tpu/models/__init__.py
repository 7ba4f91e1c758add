"""Model layer: T5 v1.1 encoder-decoder stacks and task heads.

Pure-functional JAX re-design of the reference model layer
(src/model/modeling_flash_t5.py, src/model/custom_heads_flash_t5.py):
parameters are explicit pytrees whose key names follow the reference's
canonical checkpoint naming (convert_huggingface_t5.py:12-28), models are
pure `apply(config, params, ...)` functions with explicit PRNG handling.
"""

from flasht5_tpu.models import t5
from flasht5_tpu.models import heads

__all__ = ["t5", "heads"]
