"""Host-side data pipeline: UL2 span-corruption collation with packing."""

from flasht5_tpu.data.ul2_collator import (
    DataCollatorForUL2,
    Denoiser,
    compute_input_and_target_lengths,
    random_spans_noise_mask,
)

__all__ = [
    "DataCollatorForUL2",
    "Denoiser",
    "compute_input_and_target_lengths",
    "random_spans_noise_mask",
]
