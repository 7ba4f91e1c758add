"""Full train-step A/B harness: measure tokens/s under the current env.

Usage (on the TPU chip; one process at a time):

    FLASHT5_RPE_FWD_RESIDENT=0 python tools/ab_train_step.py --label baseline
    FLASHT5_RPE_FWD_RESIDENT=1 python tools/ab_train_step.py --label resident

Prints one JSON line per run: {"label", "batch", "tokens_per_sec",
"ms_per_step", "compile_s"}. Uses the same step as bench.py (FAT5-small,
enc 1024 / dec 256) so numbers are comparable with the headline bench;
kernel-variant env flags are read at trace time inside the Pallas wrappers,
so flipping them changes the compiled program (and the compile-cache key).

Timing rule (NOTES_ROUND1): the axon backend's block_until_ready returns at
dispatch, so the loop is chained on the loss value and ends with float(loss)
— a real device->host transfer.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="ab")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship_config
    from flasht5_tpu.models import t5
    from flasht5_tpu.optim import adamw_scale, no_decay_mask

    config = _flagship_config()
    if os.environ.get("FLASHT5_AB_REMAT") == "1":
        import dataclasses
        config = dataclasses.replace(config, remat=True)
    on_tpu = jax.default_backend() == "tpu"
    batch = args.batch
    enc_len, dec_len = (1024, 256) if on_tpu else (128, 64)

    tx = adamw_scale(1e-3, weight_decay=0.0, mask=no_decay_mask)

    @jax.jit
    def init(rng):
        params = t5.init_params(rng, config)
        return params, tx.init(params)

    params, opt_state = init(jax.random.PRNGKey(0))

    input_ids = jax.random.randint(jax.random.PRNGKey(1), (batch, enc_len), 0,
                                   config.vocab_size, dtype=jnp.int32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch, dec_len), 0,
                                config.vocab_size, dtype=jnp.int32)

    @jax.jit
    def step(params, opt_state, input_ids, labels):
        def loss_fn(p):
            return t5.forward(config, p, input_ids=input_ids,
                              labels=labels)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, input_ids, labels)
    float(loss)
    compile_s = time.perf_counter() - t0

    n_steps = args.steps if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, input_ids, labels)
    float(loss)
    dt = time.perf_counter() - t0

    tokens = n_steps * batch * (enc_len + dec_len)
    print(json.dumps({
        "label": args.label,
        "batch": batch,
        "tokens_per_sec": round(tokens / dt, 1),
        "ms_per_step": round(dt / n_steps * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
