"""On-chip CE forward tile sweep (chained differential timing).

    python tools/ce_tile_sweep.py

FLASHT5_CE_ROWS / FLASHT5_CE_COLS are trace-time env knobs of the
vocab-tiled streaming CE kernels; this sweeps them at the flagship loss
shape (2048 rows x 32768 vocab, bf16 logits) to pick defaults.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import jax
import jax.numpy as jnp

CASES = [(256, 2048), (512, 2048), (256, 4096), (512, 4096),
         (1024, 2048), (2048, 2048), (256, 8192)]


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from speed_of_light_tpu import chained_seconds

    V, rows = 32768, 2048
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    logits = jax.random.normal(ks[0], (rows, V), jnp.bfloat16)
    labels = jax.random.randint(ks[1], (rows,), 0, V)
    bound_ms = rows * V * 4 / 819e9 * 1e3  # harness byte model

    for br, bv in CASES:
        os.environ["FLASHT5_CE_ROWS"] = str(br)
        os.environ["FLASHT5_CE_COLS"] = str(bv)
        from flasht5_tpu.ops.cross_entropy import cross_entropy_loss

        def step(lg):
            losses, _ = cross_entropy_loss(lg, labels, 1e-4, 0.0)
            return (lg + losses[:, None] * 1e-30).astype(lg.dtype)

        try:
            sec = chained_seconds(step, logits)
            print(json.dumps({"rows": br, "cols": bv,
                              "ms": round(sec * 1e3, 3),
                              "sol": round(bound_ms / (sec * 1e3), 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"rows": br, "cols": bv,
                              "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
