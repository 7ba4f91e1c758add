"""Serving benchmark: decode tokens/sec/chip and p50 TTFT through the
continuous-batching engine (north-star headline metrics, BASELINE.json).

Default runs FAT5-small-shaped serving in four precision modes (bf16, INT8
weights, INT8 weights + INT8 KV, fused decode kernel) and prints one JSON
line per mode. `--config configs/flan/fat5-flan-xl.yaml` serves any model
size (the T5-XL INT8 row of BASELINE.md target 1). `--load` switches to a
load test: requests arrive mid-run on a staggered schedule and per-request
TTFT (first_token_at - arrival_s) is reported — admission under load, not
just warm single-request prefill latency.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def hbm_footprint(params, engine):
    """Bytes held in HBM: weights (+ scales) and the engine's KV caches
    (slot-pool or paged — both expose state.layers as a KVTensor pytree)."""
    import jax.tree_util as jtu

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize
                   for x in jtu.tree_leaves(tree)
                   if hasattr(x, "dtype"))

    return {"weights_bytes": int(nbytes(params)),
            "kv_pool_bytes": int(nbytes(engine.state.layers))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps_per_sync", type=int, default=8,
                    help="decode steps per host sync (lax.scan window); the "
                         "scheduler overlaps the sync with the next window, "
                         "so this bounds token-harvest granularity")
    ap.add_argument("--max_new", type=int, default=None)
    ap.add_argument("--config", default=None,
                    help="YAML model config (model_args section); default = "
                         "flagship FAT5-small")
    ap.add_argument("--modes", default=None,
                    help="comma list among bf16,int8_weights,int8_weights_kv,"
                         "int8_wkv_fused_kernel")
    ap.add_argument("--n_req", type=int, default=None)
    ap.add_argument("--slots", type=int, default=None)
    ap.add_argument("--enc_len", type=int, default=None)
    ap.add_argument("--load", action="store_true",
                    help="staggered-arrival load test with per-request TTFT")
    ap.add_argument("--engine", default="slot", choices=("slot", "paged"),
                    help="slot-pool engine (default) or paged-KV engine "
                         "(chunked packed kernel)")
    ap.add_argument("--page_size", type=int, default=64)
    ap.add_argument("--pages_per_item", type=int, default=8)
    ap.add_argument("--arrival_gap_ms", type=float, default=20.0)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed engine.run repetitions; the row reports the "
                         "median with min/max (the tunneled dev chip varies "
                         "run to run under external load)")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from flasht5_tpu.config import FlashT5Config
    from flasht5_tpu.inference.engine import EngineConfig, InferenceEngine, Request
    from flasht5_tpu.models import t5
    from flasht5_tpu.quantize import quantize_params

    on_tpu = jax.default_backend() == "tpu"
    if args.config:
        config = FlashT5Config.from_yaml(args.config).replace(
            dropout_rate=0.0, dtype="bfloat16", param_dtype="bfloat16")
    else:
        from __graft_entry__ import _flagship_config
        config = _flagship_config(tiny=not on_tpu).replace(dropout_rate=0.0)
    params = jax.jit(lambda r: t5.init_params(r, config))(jax.random.PRNGKey(0))

    n_req = args.n_req or (32 if on_tpu else 6)
    enc_len, max_new = (512, 64) if on_tpu else (16, 8)
    if args.enc_len:
        enc_len = args.enc_len
    if args.max_new:
        max_new = args.max_new
    slots = args.slots or (8 if on_tpu else 3)
    rng = np.random.default_rng(0)

    def mk_reqs(arrival_gap_s=0.0):
        return [
            Request(uid=i,
                    input_ids=rng.integers(2, config.vocab_size,
                                           size=(enc_len,)).astype(np.int32),
                    max_new_tokens=max_new,
                    arrival_s=i * arrival_gap_s)
            for i in range(n_req)
        ]

    ecfg_base = dict(max_slots=slots, max_decode_len=max_new + 2,
                     max_encode_len=enc_len, encode_buckets=(enc_len,),
                     steps_per_sync=args.steps_per_sync)

    all_modes = [
        ("bf16", lambda: params, "native", False),
        ("int8_weights", lambda: quantize_params(params), "native", False),
        ("int8_weights_kv", lambda: quantize_params(params), "int8", False),
        ("int8_wkv_fused_kernel", lambda: quantize_params(params), "int8", True),
    ]
    if args.modes:
        wanted = set(args.modes.split(","))
        all_modes = [m for m in all_modes if m[0] in wanted]

    results = []
    for tag, mk_p, kv, kern in all_modes:
        p = mk_p()
        if args.engine == "paged":
            from flasht5_tpu.inference.paged_engine import (
                PagedEngineConfig, PagedInferenceEngine)
            maxp = -(-(max_new + 2) // args.page_size)
            engine = PagedInferenceEngine(config, p, PagedEngineConfig(
                max_slots=slots, page_size=args.page_size,
                num_pages=slots * maxp, max_pages_per_slot=maxp,
                max_encode_len=enc_len, encode_buckets=(enc_len,),
                kv_dtype=kv, steps_per_sync=args.steps_per_sync,
                pages_per_item=args.pages_per_item))
            tag = f"{tag}_paged"
        else:
            engine = InferenceEngine(config, p,
                                     EngineConfig(kv_dtype=kv,
                                                  use_decode_kernel=kern,
                                                  **ecfg_base))
        hbm = hbm_footprint(p, engine)
        if hasattr(engine, "warmup"):
            engine.warmup()                   # compile all prefill variants
        warm = engine.run(mk_reqs()[:slots])  # and exercise the full loop

        if args.load:
            # staggered arrivals: TTFT measured per request under contention
            reqs = mk_reqs(arrival_gap_s=args.arrival_gap_ms / 1e3)
            t0 = time.perf_counter()
            done = engine.run(reqs)
            dt = time.perf_counter() - t0
            ttfts = sorted(r.first_token_at - r.arrival_s for r in done)
            ttft = ttfts[len(ttfts) // 2]
            ttft_p90 = ttfts[int(len(ttfts) * 0.9)]
            toks = sum(len(r.result) for r in done)
            row = {
                "metric": f"decode_tokens_per_sec_{tag}_load",
                "value": round(toks / dt, 1),
                "unit": "tokens/s/chip",
                "p50_ttft_ms": round(ttft * 1e3, 1),
                "p90_ttft_ms": round(ttft_p90 * 1e3, 1),
                "arrival_gap_ms": args.arrival_gap_ms,
            }
        else:
            # TTFT: median of single warm requests decoding one sync window
            samples = []
            short = min(args.steps_per_sync, max_new)
            for s in range(5):
                r = mk_reqs()[0]
                r.max_new_tokens = short
                t0 = time.perf_counter()
                engine.run([r])
                samples.append(time.perf_counter() - t0)
            ttft = sorted(samples)[len(samples) // 2]

            rates = []
            for _ in range(max(args.repeats, 1)):
                reqs = mk_reqs()
                t0 = time.perf_counter()
                done = engine.run(reqs)
                dt = time.perf_counter() - t0
                toks = sum(len(r.result) for r in done)
                rates.append(toks / dt)
            rates.sort()
            row = {
                "metric": f"decode_tokens_per_sec_{tag}",
                "value": round(rates[len(rates) // 2], 1),
                "unit": "tokens/s/chip",
                "p50_ttft_ms": round(ttft * 1e3, 1),
                "median_of": len(rates),
                "min": round(rates[0], 1),
                "max": round(rates[-1], 1),
            }
        row.update({
            "requests": n_req,
            "slots": slots,
            "enc_len": enc_len,
            "max_new": max_new,
            "steps_per_sync": args.steps_per_sync,
            "model": args.config or "fat5-small",
            "hbm_weights_gib": round(hbm["weights_bytes"] / 2**30, 3),
            "hbm_kv_pool_gib": round(hbm["kv_pool_bytes"] / 2**30, 4),
            "vs_baseline": None,
        })
        print(json.dumps(row), flush=True)
        results.append(row)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
