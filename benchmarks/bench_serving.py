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
    ap.add_argument("--varied_new", default=None,
                    help="lo,hi: draw each request's max_new uniform in "
                         "[lo,hi] instead of a fixed --max_new")
    ap.add_argument("--tail", default=None,
                    help="p,lo,hi: with probability p a request instead "
                         "draws max_new from [lo,hi] (heavy-tailed budgets); "
                         "applies on top of --varied_new or a fixed --max_new")
    ap.add_argument("--mesh", default=None,
                    help="data,tensor: run the mesh-sharded ShardedEngine on "
                         "a (data, tensor) device mesh instead of the plain "
                         "slot engine; '1,1' is the single-device "
                         "no-regression gate (sharded_engine.py docstring)")
    ap.add_argument("--budget", type=int, default=None,
                    help="largest decode budget any request may carry; the "
                         "slot engine provisions max_decode_len=budget per "
                         "slot, the paged engine allocates pages on demand "
                         "(defaults to the largest drawable max_new)")
    ap.add_argument("--num_pages", type=int, default=None,
                    help="paged: shared pool size (default worst-case "
                         "slots*max_pages_per_slot; set lower to "
                         "oversubscribe — admission defers when exhausted)")
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

    def init_master():
        return jax.jit(lambda r: t5.init_params(r, config))(
            jax.random.PRNGKey(0))

    n_req = args.n_req or (32 if on_tpu else 6)
    enc_len, max_new = (512, 64) if on_tpu else (16, 8)
    if args.enc_len:
        enc_len = args.enc_len
    if args.max_new:
        max_new = args.max_new
    slots = args.slots or (8 if on_tpu else 3)
    # per-request decode budgets: fixed max_new, or drawn uniform from
    # --varied_new lo,hi with an optional heavy tail --tail p,lo,hi
    # (e.g. "most outputs are short; any may run to the cap" serving traffic)
    varied = (tuple(int(x) for x in args.varied_new.split(","))
              if args.varied_new else None)
    tail = (tuple(float(x) for x in args.tail.split(","))
            if args.tail else None)
    # the slot/paged engines must provision for the LARGEST budget any
    # request may draw, whichever distribution it came from
    _cands = list(varied) if varied else [max_new]
    if tail:
        _cands.append(int(tail[2]))
    budget = args.budget or max(_cands)
    rng = np.random.default_rng(0)

    def draw_new(r):
        # tail applies on top of either distribution (a --tail-only run is
        # "mostly fixed max_new, occasionally a long one")
        if tail and r.random() < tail[0]:
            return int(r.integers(int(tail[1]), int(tail[2]) + 1))
        if varied is None:
            return max_new
        return int(r.integers(varied[0], varied[1] + 1))

    def mk_reqs(arrival_gap_s=0.0):
        return [
            Request(uid=i,
                    input_ids=rng.integers(2, config.vocab_size,
                                           size=(enc_len,)).astype(np.int32),
                    max_new_tokens=draw_new(rng),
                    arrival_s=i * arrival_gap_s)
            for i in range(n_req)
        ]

    # the slot engine must provision EVERY slot at the largest budget any
    # request may carry; the paged engine provisions pages per request
    ecfg_base = dict(max_slots=slots, max_decode_len=budget + 2,
                     max_encode_len=enc_len, encode_buckets=(enc_len,),
                     steps_per_sync=args.steps_per_sync)

    all_modes = [
        ("bf16", lambda m: m, "native", False),
        ("int8_weights", quantize_params, "native", False),
        ("int8_weights_kv", quantize_params, "int8", False),
        ("int8_wkv_fused_kernel", quantize_params, "int8", True),
    ]
    if args.modes:
        wanted = set(args.modes.split(","))
        all_modes = [m for m in all_modes if m[0] in wanted]

    results = []
    for tag, mk_p, kv, kern in all_modes:
        master = init_master()
        p = mk_p(master)
        if p is not master:
            # a real int8 deployment holds only the quantized weights; the
            # bf16 master (2x the int8 bytes) must not sit in HBM skewing
            # every capacity ceiling this harness measures. Quantization
            # passes unquantized leaves (norms, embedding) through by
            # reference — free only the leaves it replaced.
            kept = {id(x) for x in jax.tree_util.tree_leaves(p)}
            for leaf in jax.tree_util.tree_leaves(master):
                if id(leaf) not in kept:
                    leaf.delete()
        del master
        if args.engine == "paged":
            from flasht5_tpu.inference.paged_engine import (
                PagedEngineConfig, PagedInferenceEngine)
            maxp = -(-(budget + 2) // args.page_size)
            engine = PagedInferenceEngine(config, p, PagedEngineConfig(
                max_slots=slots, page_size=args.page_size,
                num_pages=args.num_pages or slots * maxp,
                max_pages_per_slot=maxp,
                max_encode_len=enc_len, encode_buckets=(enc_len,),
                kv_dtype=kv, steps_per_sync=args.steps_per_sync,
                pages_per_item=args.pages_per_item))
            tag = f"{tag}_paged"
        elif args.mesh:
            from flasht5_tpu.inference.sharded_engine import (
                ShardedEngine, make_serving_mesh)
            dshape, tshape = (int(x) for x in args.mesh.split(","))
            engine = ShardedEngine(
                config, p,
                EngineConfig(kv_dtype=kv, use_decode_kernel=kern,
                             **ecfg_base),
                make_serving_mesh(data=dshape, tensor=tshape))
            tag = f"{tag}_mesh{dshape}x{tshape}"
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
            "max_new": ((f"U[{varied[0]},{varied[1]}]" if varied
                         else str(max_new))
                        + (f"+tail{args.tail}" if tail else "")
                        if (varied or tail) else max_new),
            "budget": budget,
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
