"""Serving benchmark: decode tokens/sec/chip and p50 TTFT through the
continuous-batching engine (north-star headline metrics, BASELINE.json).

Runs FAT5-small-shaped serving in three precision modes: bf16, INT8 weights,
INT8 weights + INT8 KV cache. Prints one JSON line per mode.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_per_sync", type=int, default=8,
                    help="decode steps per host sync (lax.scan window); "
                         "bigger windows amortize the ~25ms tunnel "
                         "round-trip, at bounded over-decode cost")
    ap.add_argument("--max_new", type=int, default=None)
    args = ap.parse_args()
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config
    from flasht5_tpu.inference.engine import EngineConfig, InferenceEngine, Request
    from flasht5_tpu.models import t5
    from flasht5_tpu.quantize import quantize_params

    on_tpu = jax.default_backend() == "tpu"
    config = _flagship_config(tiny=not on_tpu).replace(dropout_rate=0.0)
    params = jax.jit(lambda r: t5.init_params(r, config))(jax.random.PRNGKey(0))

    n_req = 32 if on_tpu else 6
    enc_len, max_new = (512, 64) if on_tpu else (16, 8)
    if args.max_new:
        max_new = args.max_new
    slots = 8 if on_tpu else 3
    rng = np.random.default_rng(0)
    mk_reqs = lambda: [
        Request(uid=i,
                input_ids=rng.integers(2, config.vocab_size,
                                       size=(enc_len,)).astype(np.int32),
                max_new_tokens=max_new)
        for i in range(n_req)
    ]
    ecfg_base = dict(max_slots=slots, max_decode_len=max_new + 2,
                     max_encode_len=enc_len, encode_buckets=(enc_len,),
                     steps_per_sync=args.steps_per_sync)

    modes = [
        ("bf16", params, "native", False),
        ("int8_weights", quantize_params(params), "native", False),
        ("int8_weights_kv", quantize_params(params), "int8", False),
        ("int8_wkv_fused_kernel", quantize_params(params), "int8", True),
    ]
    for tag, p, kv, kern in modes:
        engine = InferenceEngine(config, p,
                                 EngineConfig(kv_dtype=kv,
                                              use_decode_kernel=kern,
                                              **ecfg_base))
        # TTFT: median over several single warm requests decoding one
        # sync window each (prefill + first decode window; through the
        # tunnel each sample carries a ~25ms round-trip floor)
        warm = engine.run(mk_reqs()[:slots])  # compile everything
        samples = []
        short = min(args.steps_per_sync, max_new)
        for s in range(5):
            r = mk_reqs()[0]
            r.max_new_tokens = short
            t0 = time.perf_counter()
            engine.run([r])
            samples.append(time.perf_counter() - t0)
        ttft = sorted(samples)[len(samples) // 2]

        reqs = mk_reqs()
        t0 = time.perf_counter()
        done = engine.run(reqs)
        dt = time.perf_counter() - t0
        toks = sum(len(r.result) for r in done)
        print(json.dumps({
            "metric": f"decode_tokens_per_sec_{tag}",
            "value": round(toks / dt, 1),
            "unit": "tokens/s/chip",
            "p50_ttft_ms": round(ttft * 1e3, 1),
            "requests": n_req,
            "steps_per_sync": args.steps_per_sync,
            "vs_baseline": None,
        }), flush=True)


if __name__ == "__main__":
    main()
