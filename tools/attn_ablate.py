"""Ablate the RPE attention backward at the training shape.

    python tools/attn_ablate.py [--variants fwd,diag,skip,twopass,bias]

Times flash_attention_rpe at the encoder train shape (B=8, H=8, S=1024,
D=64, bidirectional) under different trace-time env settings, printing one
JSON line per variant AS SOON as it is measured (remote compiles are slow
and flaky; partial output is still useful). Env flags are read at trace
time, so setting os.environ between jits changes the compiled program.

Timing rule: chained-loop + float() transfer (axon block_until_ready no-op).
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import jax
import jax.numpy as jnp


def _measure(fn, args, n):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    prev = None
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    del prev
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="fwd,diag,skip,twopass,bias,chain")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    from flasht5_tpu.ops.flash_attention import flash_attention
    from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe

    on_tpu = jax.default_backend() == "tpu"
    b, h, s, d = (8, 8, 1024, 64) if on_tpu else (2, 2, 128, 32)
    n = args.steps if on_tpu else 2

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    w = jax.random.normal(ks[3], (32, h), jnp.float32) * 0.5

    def rpe_loss(q, k, v, w):
        return jnp.sum(flash_attention_rpe(
            q, k, v, w, sm_scale=1.0, causal=False,
            bidirectional=True).astype(jnp.float32))

    def bias_loss(q, k, v, bias):
        return jnp.sum(flash_attention(
            q, k, v, bias, sm_scale=1.0, causal=False).astype(jnp.float32))

    for variant in args.variants.split(","):
        os.environ.pop("FLASHT5_RPE_DW_MODE", None)
        os.environ.pop("FLASHT5_RPE_FUSED_BWD", None)
        os.environ.pop("FLASHT5_ABL", None)
        try:
            if variant == "fwd" or variant.startswith("fwd-"):
                # fwd-<component>: drop a component pass inside the bfold
                # forward kernel (qk / bias / exp / softmax / pv — see
                # _fwd_kernel_nj1_bfold ablate) to expose the cost anatomy.
                # Differential chained-scan timing (dispatch cancelled).
                if variant.startswith("fwd-"):
                    os.environ["FLASHT5_ABL"] = variant[4:].replace("+", ",")
                from speed_of_light_tpu import chained_seconds

                def fstep(qq, kk, vv, ww):
                    return flash_attention_rpe(
                        qq, kk, vv, ww, sm_scale=1.0, causal=False,
                        bidirectional=True).astype(qq.dtype)

                ms = chained_seconds(fstep, q, k, v, w) * 1e3
            elif variant == "bias":
                bias = jax.random.normal(
                    jax.random.PRNGKey(9), (1, h, s, s), jnp.bfloat16)
                fn = jax.jit(jax.grad(bias_loss, argnums=(0, 1, 2, 3)))
                ms = _measure(fn, (q, k, v, bias), n)
            else:
                if variant == "skip":
                    os.environ["FLASHT5_RPE_DW_MODE"] = "skip"
                elif variant == "chain":
                    os.environ["FLASHT5_RPE_DW_MODE"] = "chain"
                elif variant == "twopass":
                    os.environ["FLASHT5_RPE_FUSED_BWD"] = "0"
                fn = jax.jit(jax.grad(rpe_loss, argnums=(0, 1, 2, 3)))
                ms = _measure(fn, (q, k, v, w), n)
            print(json.dumps({"variant": variant, "ms": round(ms, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"variant": variant,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
