"""On-chip A/B: slot engine with per-slot speculative windows vs standard.

Measures the standard greedy engine, the spec engine with prompt drafts
(random-init logits -> acceptance ~0: the overhead floor), and the spec
engine with oracle drafts (each request's own greedy output as
draft_source -> acceptance ~1 modulo near-tie argmax flips at default
matmul precision: the ceiling). Token throughput is decoded tokens /
run() wall time, median of --reps interleaved repetitions.

Writes docs/spec_engine.json.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.engine import (EngineConfig, InferenceEngine,
                                          Request)
from flasht5_tpu.models import t5


def make_requests(n, enc_len, max_new, seed=0):
    rng = np.random.default_rng(seed)
    return [Request(uid=i,
                    input_ids=rng.integers(2, 32000,
                                           size=(enc_len,)).astype(np.int32),
                    max_new_tokens=max_new)
            for i in range(n)]


def run_once(config, params, reqs, ecfg):
    import copy
    engine = InferenceEngine(config, params, ecfg)
    engine.warmup()
    my = copy.deepcopy(reqs)
    t0 = time.time()
    done = engine.run(my)
    dt = time.time() - t0
    toks = sum(len(r.result) for r in done)
    stats = getattr(engine, "spec_stats", None)
    return dt, toks, {r.uid: r.result for r in done}, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--enc_len", type=int, default=256)
    ap.add_argument("--max_new", type=int, default=128)
    ap.add_argument("--spec_window", type=int, default=4)
    ap.add_argument("--steps_per_sync", type=int, default=16)
    ap.add_argument("--kv_dtype", type=str, default="int8")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", type=str, default="default",
                    help="jax matmul precision: default | float32 (float32 "
                         "eliminates the near-tie argmax flips that break "
                         "oracle acceptance on random-init logits)")
    ap.add_argument("--out", type=str, default="docs/spec_engine.json")
    args = ap.parse_args()

    import contextlib
    prec_ctx = (jax.default_matmul_precision(args.precision)
                if args.precision != "default" else contextlib.nullcontext())
    prec_ctx.__enter__()

    cfg = FlashT5Config(
        vocab_size=32128, d_model=512, d_kv=64, num_heads=6, d_ff=1024,
        num_layers=8, dropout_rate=0.0, dtype=args.dtype, pad_token_id=0,
        max_sequence_length=1024)
    params = t5.init_params(jax.random.PRNGKey(0), cfg)
    reqs = make_requests(args.requests, args.enc_len, args.max_new)

    base = dict(max_slots=args.slots, max_decode_len=args.max_new + 2,
                max_encode_len=args.enc_len,
                encode_buckets=(args.enc_len,), kv_dtype=args.kv_dtype,
                steps_per_sync=args.steps_per_sync)

    variants = {
        "standard": EngineConfig(**base),
        "spec_prompt": EngineConfig(**base, spec_window=args.spec_window),
        "spec_oracle": EngineConfig(**base, spec_window=args.spec_window),
    }

    # oracle drafts come from the standard run's outputs
    _, _, std_results, _ = run_once(cfg, params, reqs, variants["standard"])
    oracle_reqs = []
    import copy as _copy
    for r in reqs:
        rr = _copy.deepcopy(r)
        rr.draft_source = np.concatenate(
            [[0], std_results[r.uid]]).astype(np.int32)
        oracle_reqs.append(rr)

    rows = {name: [] for name in variants}
    parity = {}
    stats_last = {}
    for rep in range(args.reps):
        for name, ecfg in variants.items():
            use = oracle_reqs if name == "spec_oracle" else reqs
            dt, toks, results, stats = run_once(cfg, params, use, ecfg)
            rows[name].append((dt, toks))
            stats_last[name] = stats
            if name != "standard":
                agree = sum(
                    int(np.array_equal(results[u], std_results[u]))
                    for u in results)
                parity[name] = f"{agree}/{len(results)} requests token-exact"

    out = {
        "device": str(jax.devices()[0]),
        "model": f"d512/L8/H6 {args.dtype} (random init)",
        "slots": args.slots, "requests": args.requests,
        "enc_len": args.enc_len, "max_new": args.max_new,
        "spec_window": args.spec_window, "kv_dtype": args.kv_dtype,
        "steps_per_sync": args.steps_per_sync, "reps": args.reps,
        "matmul_precision": args.precision,
        "note": ("spec_prompt = drafts from the request's own input "
                 "(random init: acceptance ~0 -> overhead floor); "
                 "spec_oracle = drafts from the standard run's output "
                 "(ceiling; request-parity below counts near-tie argmax "
                 "flips at default matmul precision, see "
                 "tools/spec_window_numerics_probe.py)."),
        "rows": [],
        "request_parity_vs_standard": parity,
    }
    for name, samples in rows.items():
        tps = [t / d for d, t in samples]
        med = float(np.median(tps))
        row = {
            "variant": name,
            "decode_tokens_per_sec": round(med, 1),
            "min": round(min(tps), 1), "max": round(max(tps), 1),
        }
        if name != "standard":
            std_med = float(np.median([t / d for d, t in rows["standard"]]))
            row["speedup_vs_standard"] = round(med / std_med, 3)
            st = stats_last[name]
            if st and st.get("slot_windows"):
                row["tokens_per_slot_window"] = round(
                    st["tokens"] / st["slot_windows"], 2)
        out["rows"].append(row)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
