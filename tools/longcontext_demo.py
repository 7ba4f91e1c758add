"""Long-context demonstration: FAT5-small encoder fwd+bwd at 8k tokens.

The reference's long-context capability is kernel-side linear bias memory
(fa2_rpe computes the T5 bucketed bias inside the CUDA kernel — README.md:60,
SURVEY.md §5). This tool demonstrates the TPU equivalent end-to-end at
S ∈ {2048, 4096, 8192} on the flagship encoder:

  - `pallas_rpe`: bias from the (num_buckets, H) table, in-kernel. At 8192
    the O(S) precomputed-offset-table fast path exceeds its 128MB budget
    (ops/flash_attention_rpe.py:_TABLE_BUDGET_BYTES) and the fully in-kernel
    select-chain path takes over — the very fallback the budget exists for.
  - `pallas` + materialized bias: the (1, H, S, S) bias tensor the reference's
    non-rpe paths carry; memory grows O(S^2).

For each (path, S): XLA's compile-time memory analysis (argument + output +
temp + peak bytes — exact, from the compiled executable) and the measured
fwd+bwd wall time. Writes docs/longcontext.json.

Usage: python tools/longcontext_demo.py [--out docs/longcontext.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_case(attention_type: str, seq_len: int):
    from __graft_entry__ import _flagship_config
    from flasht5_tpu.models import t5

    config = _flagship_config().replace(
        attention_type=attention_type,
        max_sequence_length=max(seq_len, 1024),
        # encoder-only: decoder layers unused, keep them out of params
        num_decoder_layers=1,
    )
    params = jax.jit(lambda r: t5.init_params(r, config))(jax.random.PRNGKey(0))

    def loss_fn(p, ids):
        enc = t5.encode(config, p, ids)
        return jnp.sum(enc.astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    ids = jnp.ones((1, seq_len), jnp.int32)
    return grad_fn, params, ids


def mem_report(grad_fn, params, ids):
    compiled = grad_fn.lower(params, ids).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return {}
    return {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "peak_temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
    }


def timed(grad_fn, params, ids, iters=3):
    loss, _ = grad_fn(params, ids)
    float(loss)  # warm + force completion (tunnel: block_until_ready no-ops)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = grad_fn(params, ids)
    float(loss)
    f = jax.tree_util.tree_leaves(grads)[0]
    float(jnp.sum(f))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/longcontext.json")
    ap.add_argument("--seqs", default="2048,4096,8192")
    ap.add_argument("--skip_bias_at", type=int, default=100000,
                    help="skip the materialized-bias path at/above this S "
                         "(O(S^2) bias may not fit)")
    args = ap.parse_args()
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from flasht5_tpu.ops import flash_attention_rpe as rpe_mod

    rows = []
    for seq_len in [int(s) for s in args.seqs.split(",")]:
        for path in ("pallas_rpe", "pallas"):
            if path == "pallas" and seq_len >= args.skip_bias_at:
                continue
            grad_fn, params, ids = build_case(path, seq_len)
            row = {"path": path, "seq_len": seq_len}
            if path == "pallas_rpe":
                # the kernel's actual dispatch geometry (round-3 defaults:
                # fwd q-tile 512, k-tile 1024) decides table vs chain
                import os as _o
                bm = int(_o.environ.get("FLASHT5_RPE_FWD_BM", "512"))
                bn = 1024
                tb = rpe_mod._table_bytes(seq_len, seq_len,
                                          8, min(bm, seq_len),
                                          min(bn, seq_len))
                row["rpe_table_bytes"] = tb
                row["rpe_mode"] = ("offset_table"
                                   if tb <= rpe_mod._TABLE_BUDGET_BYTES
                                   else "in_kernel_chain")
            try:
                row.update(mem_report(grad_fn, params, ids))
                row["fwd_bwd_ms"] = round(timed(grad_fn, params, ids) * 1e3, 1)
            except Exception as e:
                # compile-time HBM overflow for the materialized-bias path at
                # large S is the expected O(S^2) failure — record it
                row["error"] = f"{type(e).__name__}: {e}"[:300]
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(args.out, "w") as f:  # incremental: survive later OOMs
                json.dump(rows, f, indent=2)
                f.write("\n")


if __name__ == "__main__":
    main()
