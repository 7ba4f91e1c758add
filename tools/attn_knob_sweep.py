"""A/B env-knob sweep for the RPE attention kernels at the report shape.

    python tools/attn_knob_sweep.py [--shape B,H,S,D] [--variants ...]

Measures rpe fwd and fwd+bwd with the chained-scan differential timing of
tools/speed_of_light_tpu.py under named env-knob combinations. Env knobs are
read at TRACE time, so setting os.environ between jit calls in one process
yields distinct compiled programs. One JSON line per (variant, direction)
as soon as it's measured (remote compiles are slow and flaky).
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import jax
import jax.numpy as jnp

VARIANTS = {
    "default": {},
    "table_bf16": {"FLASHT5_RPE_TABLE_BF16": "1"},
    "fwd_bm256": {"FLASHT5_RPE_FWD_BM": "256"},
    "fwd_bm512": {"FLASHT5_RPE_FWD_BM": "512"},
    "bwd_bm512": {"FLASHT5_RPE_BWD_BM": "512"},
    "fwd256_bwd512": {"FLASHT5_RPE_FWD_BM": "256",
                      "FLASHT5_RPE_BWD_BM": "512"},
    "exp2": {"FLASHT5_EXP2": "1"},
    "bm512_tbf16": {"FLASHT5_RPE_FWD_BM": "512",
                    "FLASHT5_RPE_TABLE_BF16": "1"},
    "bm512_tbf16_exp2": {"FLASHT5_RPE_FWD_BM": "512",
                         "FLASHT5_RPE_TABLE_BF16": "1",
                         "FLASHT5_EXP2": "1"},
    "tbf16_exp2": {"FLASHT5_RPE_TABLE_BF16": "1", "FLASHT5_EXP2": "1"},
}
_ALL_KEYS = sorted({k for v in VARIANTS.values() for k in v})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="16,12,1024,64")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--dirs", default="fwd,fwdbwd")
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from speed_of_light_tpu import chained_seconds

    b, h, s, d = map(int, args.shape.split(","))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    w = jax.random.normal(ks[3], (32, h), jnp.float32) * 0.5
    flops_fwd = 4.0 * b * h * s * s * d

    for name in args.variants.split(","):
        env = VARIANTS[name]
        for key in _ALL_KEYS:
            os.environ.pop(key, None)
        os.environ.update(env)
        # module reads env at trace time; fresh import not needed
        from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe

        def fwd_step(qq, kk, vv):
            return flash_attention_rpe(
                qq, kk, vv, w, causal=False, sm_scale=0.125,
                bidirectional=True).astype(qq.dtype)

        def bwd_step(qq, kk, vv):
            return jax.grad(lambda x: jnp.sum(flash_attention_rpe(
                x, kk, vv, w, causal=False, sm_scale=0.125,
                bidirectional=True).astype(jnp.float32)))(qq).astype(
                    jnp.bfloat16)

        for dirn in args.dirs.split(","):
            try:
                fn = fwd_step if dirn == "fwd" else bwd_step
                sec = chained_seconds(fn, q, k, v)
                fl = flops_fwd if dirn == "fwd" else flops_fwd * 3.5
                print(json.dumps({
                    "variant": name, "dir": dirn, "ms": round(sec * 1e3, 3),
                    "tflops": round(fl / sec / 1e12, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(json.dumps({"variant": name, "dir": dirn,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
