"""Inference engine: KV-cached decoding, sampling, batching.

The reference has NO KV cache — its generate() re-runs the decoder over the
full prefix every step (modeling_flash_t5.py:648-690, SURVEY.md §3.2). This
package is new TPU-native design territory: static-shape decoder self-attn
caches, once-computed cross-attention caches, greedy/sampling loops under
`lax.while_loop`, with quantized cache layouts and continuous batching built
on top.
"""

from flasht5_tpu.inference.kv_cache import (DecodeState, init_decode_state,
                                            decode_step, decode_window_step)
from flasht5_tpu.inference.generate import generate
from flasht5_tpu.inference.beam_search import beam_generate
from flasht5_tpu.inference.speculative import speculative_generate

__all__ = ["DecodeState", "init_decode_state", "decode_step",
           "decode_window_step", "generate", "beam_generate",
           "speculative_generate"]
