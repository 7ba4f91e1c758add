"""Headline benchmark: FAT5-small pretraining-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference trains FAT5-small (147M, seq 1024, UL2) at
~79.7k tokens/s on one A100 80GB (reference README.md:36,187; BASELINE.md).
vs_baseline = our tokens/s / 79700.

Token accounting matches the reference's published number (total processed
tokens per wall-clock second for the full fwd+bwd+optimizer step; encoder and
decoder tokens both count, as in the UL2 training mix where inputs are 1024
and targets are bounded by max_labels_length).

Cold-start design (round-1 bench timed out under the driver, rc=124):
- persistent JAX compilation cache in <repo>/.jax_cache — the repo's own
  verification runs pre-warm it, so the driver's run hits compiled programs;
- exactly TWO compiled programs (fused init, train step) instead of three;
- the JSON line is printed the moment a valid measurement exists.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def main():
    sys.path.insert(0, _REPO)
    from __graft_entry__ import _flagship_config
    from flasht5_tpu.models import t5
    from flasht5_tpu.optim import adamw_scale, no_decay_mask

    config = _flagship_config()
    on_tpu = jax.default_backend() == "tpu"
    batch, enc_len, dec_len = (8, 1024, 256) if on_tpu else (2, 128, 64)

    # FLASHT5_OPT_STATE=bf16: optimizer m/v in bf16 + Kahan-compensated
    # updates (the reference's bf16-safe AdamW design). Halves the
    # optimizer's HBM stream: 139.9k -> 142.6k tok/s on-chip A/B (round 3).
    # NOT the default: the 3000-step delta-ppl smoke at that config trained
    # to ppl 35.09 vs 34.90 with fp32 state, and its checkpoint's fp8
    # per-channel delta (+0.19) breached the <=0.1 target
    # (QUALITY_r03_bf16state.json) — throughput is not worth the measured
    # quality cost as a default.
    _state = os.environ.get("FLASHT5_OPT_STATE", "fp32")
    tx = adamw_scale(1e-3, weight_decay=0.0, mask=no_decay_mask,
                     state_dtype=jnp.bfloat16 if _state == "bf16" else None,
                     kahan_sum=(_state == "bf16"))

    # ONE compiled init program: params + optimizer state together (eager
    # init is hundreds of tiny dispatches; two separate jits were two slow
    # remote compiles in round 1).
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

    # compile + warmup. NOTE: sync via scalar transfer (float(...)), not
    # block_until_ready — the axon remote backend returns from
    # block_until_ready at dispatch time, so only a value transfer proves
    # the steps actually executed.
    params, opt_state, loss = step(params, opt_state, input_ids, labels)
    float(loss)

    # Median of >=3 timed loops with a dispersion field: round-3's driver
    # capture (126.9k) sat 9% below the round-3 dev-time number (139.9k)
    # with no way to tell chip/tunnel load from a real regression — a single
    # timed loop cannot distinguish them. (The bench program itself was
    # bit-identical across those two captures; the spread is environmental.)
    n_steps = 20 if on_tpu else 3
    n_loops = 3
    rates = []
    for _ in range(n_loops):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, loss = step(params, opt_state, input_ids,
                                           labels)
        float(loss)  # chained data dependency -> waits for all steps
        dt = time.perf_counter() - t0
        tokens = n_steps * batch * (enc_len + dec_len)
        rates.append(tokens / dt)

    rates.sort()
    tps = rates[len(rates) // 2]
    spread = (rates[-1] - rates[0]) / tps if tps else 0.0
    print(json.dumps({
        "metric": "fat5_small_train_tokens_per_sec",
        "value": round(tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tps / 79700.0, 4),
        "median_of": n_loops,
        "spread_pct": round(100.0 * spread, 2),
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
    }), flush=True)


if __name__ == "__main__":
    # The shared remote-compile service intermittently returns HTTP 500 /
    # transient INTERNAL errors under load; the measurement itself is cheap
    # once compiled, so retry rather than lose the round's headline number.
    last = None
    for attempt in range(6):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last = e
            print(f"bench attempt {attempt + 1} failed: {e}"[:300],
                  file=sys.stderr, flush=True)
            # outages of the shared backend last minutes, not seconds:
            # back off up to ~5 min so a driver-window run can ride one out
            time.sleep(min(300, 45 * (attempt + 1)))
    else:
        raise last
