"""On-chip bwd cost anatomy at the report shape: dW share and block sizes.

    python tools/attn_bwd_probe.py

Chained-scan differential timing; FLASHT5_RPE_DW_MODE=skip is a DIAGNOSTIC
(drops the dW accumulation pass) to expose its share of the fused backward.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import jax
import jax.numpy as jnp

CASES = [
    ("bwd_default", {}),
    ("bwd_tbf16", {"FLASHT5_RPE_TABLE_BF16": "1"}),
    ("bwd_tbf16_dwskip", {"FLASHT5_RPE_TABLE_BF16": "1",
                          "FLASHT5_RPE_DW_MODE": "skip"}),
    ("bwd_tbf16_bm128", {"FLASHT5_RPE_TABLE_BF16": "1",
                         "FLASHT5_RPE_BWD_BM": "128"}),
    ("fwd_bm1024_tbf16", {"FLASHT5_RPE_FWD_BM": "1024",
                          "FLASHT5_RPE_TABLE_BF16": "1"}),
]
_KEYS = sorted({k for _, v in CASES for k in v})


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from speed_of_light_tpu import chained_seconds

    b, h, s, d = 16, 12, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    w = jax.random.normal(ks[3], (32, h), jnp.float32) * 0.5

    for name, env in CASES:
        for key in _KEYS:
            os.environ.pop(key, None)
        os.environ.update(env)
        from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe

        if name.startswith("fwd"):
            def step(qq, kk, vv):
                return flash_attention_rpe(
                    qq, kk, vv, w, causal=False, sm_scale=0.125,
                    bidirectional=True).astype(qq.dtype)
        else:
            def step(qq, kk, vv):
                return jax.grad(lambda x: jnp.sum(flash_attention_rpe(
                    x, kk, vv, w, causal=False, sm_scale=0.125,
                    bidirectional=True).astype(jnp.float32)))(qq).astype(
                        jnp.bfloat16)
        try:
            sec = chained_seconds(step, q, k, v)
            print(json.dumps({"case": name, "ms": round(sec * 1e3, 3)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
