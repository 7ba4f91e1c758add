"""Interleaved A/B: plain InferenceEngine vs ShardedEngine at mesh (1,1).

The ShardedEngine docstring's no-regression claim needs a number measured
the way this chip can be measured: both engines in ONE process, full runs
interleaved (external tunnel load drifts minute-to-minute and hits both
arms alike), median of N. With mesh (1,1) the sharded program is the plain
engine plus two size-1 collectives and the shard_map wrapping — any gap is
pure sharding machinery overhead, the cost of serving through the
multi-host topology on a single chip.

    python tools/sharded_serving_ab.py [--out docs/serving_sharded_ab.json]

Writes the ratio + per-arm medians; wired into the ShardedEngine docstring.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/serving_sharded_ab.json")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps_per_sync", type=int, default=64)
    ap.add_argument("--n_req", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--enc_len", type=int, default=512)
    ap.add_argument("--max_new", type=int, default=64)
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config
    from flasht5_tpu.inference.engine import (EngineConfig, InferenceEngine,
                                              Request)
    from flasht5_tpu.inference.sharded_engine import (ShardedEngine,
                                                      make_serving_mesh)
    from flasht5_tpu.models import t5
    from flasht5_tpu.quantize import quantize_params

    on_tpu = jax.default_backend() == "tpu"
    config = _flagship_config(tiny=not on_tpu).replace(dropout_rate=0.0)
    if not on_tpu:
        args.enc_len, args.max_new, args.n_req, args.slots = 16, 8, 6, 3
    params = quantize_params(
        jax.jit(lambda r: t5.init_params(r, config))(jax.random.PRNGKey(0)))

    ecfg = EngineConfig(max_slots=args.slots,
                        max_decode_len=args.max_new + 2,
                        max_encode_len=args.enc_len,
                        encode_buckets=(args.enc_len,),
                        kv_dtype="int8",
                        steps_per_sync=args.steps_per_sync)
    engines = {
        "plain": InferenceEngine(config, params, ecfg),
        "mesh_1x1": ShardedEngine(config, params, ecfg,
                                  make_serving_mesh(1, 1)),
    }

    rng = np.random.default_rng(0)

    def mk_reqs():
        return [Request(uid=i,
                        input_ids=rng.integers(
                            2, config.vocab_size,
                            size=(args.enc_len,)).astype(np.int32),
                        max_new_tokens=args.max_new)
                for i in range(args.n_req)]

    for eng in engines.values():          # warm both fully
        eng.run(mk_reqs()[: args.slots])
        eng.run(mk_reqs())

    samples = {t: [] for t in engines}
    for _ in range(args.reps):
        for tag, eng in engines.items():  # interleaved
            reqs = mk_reqs()
            t0 = time.perf_counter()
            done = eng.run(reqs)
            dt = time.perf_counter() - t0
            toks = sum(len(r.result) for r in done)
            samples[tag].append(toks / dt)

    rows = {}
    for tag, s in samples.items():
        s.sort()
        rows[tag] = {"tokens_per_sec_chip": round(s[len(s) // 2], 1),
                     "min": round(s[0], 1), "max": round(s[-1], 1),
                     "median_of": len(s)}
    payload = {
        "description": ("plain slot engine vs ShardedEngine at mesh (1,1), "
                        "IDENTICAL settings (FAT5-small int8 w+kv, "
                        f"{args.n_req} req, {args.slots} slots, enc "
                        f"{args.enc_len}, max_new {args.max_new}, sync "
                        f"{args.steps_per_sync}), INTERLEAVED median-of-"
                        f"{args.reps} full runs in one process."),
        "rows": rows,
        "mesh_over_plain": round(
            rows["mesh_1x1"]["tokens_per_sec_chip"]
            / rows["plain"]["tokens_per_sec_chip"], 3),
        "backend": jax.default_backend(),
    }
    print(json.dumps(payload))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
