"""RPE-attention tile sweep at training shapes, robust timing.

Sweeps (block_m, block_n) for fwd and fwd+bwd of the RPE-fused kernel at the
shapes the FAT5-small train step actually runs (encoder 1024 self-attn,
decoder 256 causal, cross 256x1024), plus the bias-table dtype variant.
Median-of-repeats chained-loop timing (the shared tunneled chip carries
2-4x noise on single measurements — docs/perf_report.md caveat).

    python benchmarks/bench_attention_sweep.py [--out docs/attn_sweep.json]
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timed(fn, args, iters=20, repeats=3):
    o = fn(*args)
    float(jnp.sum(jax.tree.leaves(o)[0]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        float(jnp.sum(jax.tree.leaves(o)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe

    b, h, d = 8, 8, 64
    shapes = [("enc_self", 1024, 1024, False),
              ("dec_self", 256, 256, True),
              ("cross", 256, 1024, False)]
    tiles = [(256, 512), (256, 1024), (512, 512), (512, 1024), (128, 1024),
             (256, 256)]

    rows = []
    for name, m, n, causal in shapes:
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        q = jax.random.normal(ks[0], (b, h, m, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, n, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, n, d), jnp.bfloat16)
        w = jax.random.normal(ks[3], (32, h), jnp.float32) * 0.5

        for bm, bn in tiles:
            if bm > m or bn > n:
                continue
            kw = dict(causal=causal, sm_scale=0.125, bidirectional=not causal,
                      block_m=bm, block_n=bn)
            fwd = jax.jit(lambda q, k, v, w: flash_attention_rpe(
                q, k, v, w, **kw))

            def loss(q, k, v, w):
                return jnp.sum(flash_attention_rpe(
                    q, k, v, w, **kw).astype(jnp.float32))

            fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            try:
                t_f = timed(fwd, (q, k, v, w), args.iters)
                t_fb = timed(fb, (q, k, v, w), args.iters)
            except Exception as e:  # Mosaic lowering / VMEM failures
                rows.append({"shape": name, "bm": bm, "bn": bn,
                             "error": str(e)[:120]})
                print(json.dumps(rows[-1]), flush=True)
                continue
            flops = 4 * b * h * m * n * d / (2 if causal else 1)
            rows.append({
                "shape": name, "bm": bm, "bn": bn,
                "fwd_ms": round(t_f * 1e3, 3),
                "fwd_tflops": round(flops / t_f / 1e12, 1),
                "fwdbwd_ms": round(t_fb * 1e3, 3),
                "fwdbwd_tflops": round(3.5 * flops / t_fb / 1e12, 1),
            })
            print(json.dumps(rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"metric": "rpe_tile_sweep",
                       "backend": jax.default_backend(), "rows": rows}, f,
                      indent=2)


if __name__ == "__main__":
    main()
