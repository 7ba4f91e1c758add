"""Minipile pretraining example.

Parity with the reference example driver (examples/minipile/
train_fat5_minipile.py): FAT5-small-ish config, WSD scheduler, automatic
detection of prior checkpoints for resume. Uses the shared YAML driver
plumbing (train.py).

    python examples/minipile/train_fat5_minipile.py \
        [examples/minipile/config/flash-t5-small-minipile.yaml]
"""

import os
import sys

sys.path.insert(0, ".")

DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "config",
                              "flash-t5-small-minipile.yaml")

if __name__ == "__main__":
    import train as train_mod
    config_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CONFIG
    train_mod.main(config_path)
