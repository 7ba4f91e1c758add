"""Chip/host scaling harness (north-star: >=85% linear scaling 1 chip ->
1 host -> N hosts).

Runs the explicit shard_map TP+DP train step on progressively larger meshes
and reports tokens/sec and scaling efficiency vs the single-device run. On a
multi-host pod slice, launch one process per host (jax.distributed handles
rendezvous via parallel/distributed.initialize_multihost); on a single host
it sweeps device counts; under JAX_PLATFORMS=cpu with
--xla_force_host_platform_device_count=8 it validates the orchestration.

    python tools/scaling_harness.py [--tensor 1] [--steps 10]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def measure(config, data, tensor, steps, seq, dec, per_device_batch):
    from flasht5_tpu.optim import adamw_scale, no_decay_mask
    from flasht5_tpu.parallel import make_mesh
    from flasht5_tpu.parallel.sharding import batch_sharding
    from flasht5_tpu.parallel.tp_step import (
        make_tp_train_step, tp_stat_axes, tp_train_state)

    mesh = make_mesh(data, tensor)
    tx = adamw_scale(1e-3, mask=no_decay_mask, stat_axes=tp_stat_axes)
    params, opt_state = tp_train_state(config, mesh, tx)
    step = make_tp_train_step(config, mesh, tx)

    b = per_device_batch * data
    rng = np.random.default_rng(0)
    bs = batch_sharding(mesh)
    batch = {
        "input_ids": jax.device_put(
            jnp.asarray(rng.integers(2, config.vocab_size, size=(b, seq)),
                        jnp.int32), bs),
        "labels": jax.device_put(
            jnp.asarray(rng.integers(2, config.vocab_size, size=(b, dec)),
                        jnp.int32), bs),
    }
    params, opt_state, m = step(params, opt_state, batch, None)
    float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, m = step(params, opt_state, batch, None)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return steps * b * (seq + dec) / dt


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--tensor", type=int, default=1)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--dec", type=int, default=64)
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--out", default=None,
                    help="write the full results JSON to this path")
    args = ap.parse_args()

    from flasht5_tpu.config import FlashT5Config
    on_tpu = jax.default_backend() == "tpu"
    config = FlashT5Config(
        vocab_size=4096, d_model=256, d_kv=32, num_heads=8, d_ff=512,
        num_layers=4, dropout_rate=0.0, attention_scale=1.0, pad_token_id=0,
        attention_type="pallas_rpe" if on_tpu else "ref",
        dtype="bfloat16" if on_tpu else "float32")

    n_dev = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c * args.tensor <= n_dev]
    results = []
    base = None
    for data in counts:
        tps = measure(config, data, args.tensor, args.steps, args.seq,
                      args.dec, args.per_device_batch)
        if base is None:
            base = tps
        eff = tps / (base * data)
        results.append({"devices": data * args.tensor, "data": data,
                        "tensor": args.tensor,
                        "tokens_per_sec": round(tps, 1),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    on_cpu = jax.default_backend() == "cpu"
    ok = all(r["scaling_efficiency"] >= 0.85 for r in results[1:]) \
        if len(results) > 1 else True
    summary = {"metric": "host_scaling",
               # On virtual CPU devices the 85% criterion is NOT applicable:
               # N virtual devices share one host's fixed cores, and with
               # per-device batch held constant the global work grows Nx on
               # the same silicon, so aggregate tokens/sec saturates at the
               # host FLOP ceiling and per-device "efficiency" falls ~1/N BY
               # CONSTRUCTION (this, plus background load, is the whole
               # r2->r3 0.336->0.221 "regression" — same code both rounds).
               # What this artifact validates on CPU: the sharded
               # orchestration compiles, collectives execute, throughput
               # rises monotonically until the host saturates. The ICI-chip
               # projection lives in docs/scaling_model.json, whose overlap
               # assumption is checked against the real 8-chip TPU
               # executable by tools/hlo_overlap_check.py.
               "passes_85pct": None if on_cpu else ok,
               "criterion_applicable": not on_cpu,
               "measures": ("orchestration-on-shared-silicon" if on_cpu
                            else "chip-scaling"),
               "note": ("virtual CPU devices share one host's cores: "
                        "per-device efficiency falls ~1/N by construction "
                        "once the host saturates; see docs/scaling_model."
                        "json + docs/hlo_overlap.json for the ICI story"
                        if on_cpu else ""),
               "process_count": jax.process_count(),
               "backend": jax.default_backend(),
               "results": results}
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}),
          flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
