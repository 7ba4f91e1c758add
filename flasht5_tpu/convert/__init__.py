"""Checkpoint interchange: HF T5 / FAT5 safetensors -> flasht5_tpu pytrees."""

from flasht5_tpu.convert.hf_import import (
    load_fat5_safetensors,
    load_hf_t5_safetensors,
    params_to_fat5_state_dict,
)

__all__ = [
    "load_hf_t5_safetensors",
    "load_fat5_safetensors",
    "params_to_fat5_state_dict",
]
