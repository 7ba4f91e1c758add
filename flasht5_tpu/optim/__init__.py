"""Optimization: bf16-safe scaled AdamW and LR schedules."""

from flasht5_tpu.optim.adamw_scaled import adamw_scale, no_decay_mask
from flasht5_tpu.optim.schedules import (
    cosine_schedule,
    wsd_schedule,
)

__all__ = ["adamw_scale", "no_decay_mask", "cosine_schedule", "wsd_schedule"]
