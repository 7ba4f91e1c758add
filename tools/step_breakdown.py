"""Coarse train-step time breakdown: fwd, fwd+bwd, optimizer.

Where does the FAT5-small step's wall time go? Remote tracing is unreliable
over the axon tunnel, so this ablates instead: times (a) forward loss only,
(b) forward+backward (grads materialized, no optimizer), (c) the full step,
and attributes (c)-(b) to the optimizer and (b)-(a) to the backward. Each
variant is its own compile; the persistent cache keeps re-runs cheap.

    python tools/step_breakdown.py [--batch 8] [--steps 20]

Prints one JSON line with ms per variant.
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


def _timeit(fn, args, n, sync):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship_config
    from flasht5_tpu.models import t5
    from flasht5_tpu.optim import adamw_scale, no_decay_mask

    config = _flagship_config()
    on_tpu = jax.default_backend() == "tpu"
    batch = args.batch
    enc_len, dec_len = (1024, 256) if on_tpu else (128, 64)
    n = args.steps if on_tpu else 2

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

    def loss_fn(p):
        return t5.forward(config, p, input_ids=input_ids,
                          labels=labels)["loss"]

    fwd = jax.jit(loss_fn)
    fwd_bwd = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p))

    @jax.jit
    def full(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def opt_only(grads, opt_state, params):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    sync_scalar = lambda o: float(o if not isinstance(o, tuple) else
                                  (o[-1] if o[-1].ndim == 0 else o[0]))

    ms_fwd = _timeit(fwd, (params,), n, lambda o: float(o))
    ms_fwd_bwd = _timeit(
        fwd_bwd, (params,), n, lambda o: float(o[0]))
    _, grads = fwd_bwd(params)
    ms_opt = _timeit(
        opt_only, (grads, opt_state, params), n,
        lambda o: float(jnp.sum(jax.tree.leaves(o[0])[0].astype(jnp.float32))))
    ms_full = _timeit(
        full, (params, opt_state), n, lambda o: float(o[2]))

    tokens = batch * (enc_len + dec_len)
    print(json.dumps({
        "batch": batch,
        "ms_fwd": round(ms_fwd, 2),
        "ms_fwd_bwd": round(ms_fwd_bwd, 2),
        "ms_bwd_attributed": round(ms_fwd_bwd - ms_fwd, 2),
        "ms_opt_only": round(ms_opt, 2),
        "ms_full_step": round(ms_full, 2),
        "tokens_per_sec_full": round(tokens / (ms_full / 1e3), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
