"""Decode-attention crossover: fused Pallas kernel vs XLA einsum path.

Round-1 measured the fused kernel ~10% SLOWER at tiny caches (8 slots x 66
positions: per-program overhead dominates) and left `use_decode_kernel`
defaulted off. This sweeps (slots, cache length) at serving shapes, records
where the kernel wins, and emits the crossover rule the engine default uses.

    python benchmarks/bench_decode_crossover.py [--out docs/decode_crossover.json]

Timing: chained-loop with a terminal value transfer (axon's
block_until_ready is a no-op — see NOTES_ROUND1), median of repeats.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, args, iters, repeats=3):
    out = fn(*args)
    jnp.asarray(out).block_until_ready()
    float(jnp.sum(out))  # real sync
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        o = out
        for _ in range(iters):
            o = fn(*args)
        float(jnp.sum(o))
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from flasht5_tpu.ops.decode_attention import (decode_attention,
                                                  decode_attention_ref)
    from flasht5_tpu.ops.quant import quantize_kv

    h, d = 8, 64
    rows = []
    for slots in (8, 32, 64):
        for L in (128, 512, 1024, 2048):
            rng = jax.random.PRNGKey(slots * 10000 + L)
            kq, kk, kv_ = jax.random.split(rng, 3)
            q = jax.random.normal(kq, (slots, h, d), jnp.bfloat16)
            k = jax.random.normal(kk, (slots, h, L, d), jnp.bfloat16)
            v = jax.random.normal(kv_, (slots, h, L, d), jnp.bfloat16)
            qk, ks = quantize_kv(k)
            qv, vs = quantize_kv(v)
            lengths = jnp.full((slots,), L, jnp.int32)

            fused = jax.jit(lambda q, k, v, ks, vs, l: decode_attention(
                q, k, v, ks, vs, l, sm_scale=0.125))
            ref = jax.jit(lambda q, k, v, ks, vs, l: decode_attention_ref(
                q, k, v, ks, vs, l, sm_scale=0.125))

            t_fused = _time_fn(fused, (q, qk, qv, ks, vs, lengths), args.iters)
            t_ref = _time_fn(ref, (q, qk, qv, ks, vs, lengths), args.iters)
            row = {"slots": slots, "L": L,
                   "fused_us": round(t_fused * 1e6, 1),
                   "xla_us": round(t_ref * 1e6, 1),
                   "speedup": round(t_ref / t_fused, 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    wins = [r for r in rows if r["speedup"] >= 1.0]
    summary = {
        "metric": "decode_attention_crossover",
        "backend": jax.default_backend(),
        "kernel_wins_at": [{"slots": r["slots"], "L": r["L"]} for r in wins],
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}),
          flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
