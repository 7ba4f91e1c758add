"""Training drivers: trainer loop, checkpointing, metrics."""

from flasht5_tpu.train.trainer import Trainer, TrainerConfig

__all__ = ["Trainer", "TrainerConfig"]
