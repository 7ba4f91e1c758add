"""Paged-decode roofline on the chip: occupancy sweep, ragged vs dense grid.

VERDICT r2 item 9: "a measured roofline row at realistic pool sizes (many
slots, fragmented page tables) ... at >=3 occupancy points, >=0.6 SoL or
documented ceiling."

Scenario: FAT5-small decode shape (H=8, D=64), 64 slots, int8 KV pages,
FRAGMENTED page tables (pages allocated round-robin across slots so
consecutive in-slot pages are strided in the pool). Occupancy = fraction of
slots holding a live 2048-token sequence; the rest are empty (released).

For each (kernel, page_size, occupancy): per-call ms via chained-scan
differential timing, achieved GB/s over the bytes the kernel MUST read
(live K+V pages + scales), and sol = fraction of the HBM roofline. The
dense-grid kernel's time is expected to be flat in occupancy (its grid is
slots x max_pages); the work-list kernel's should scale with live tokens.

    python tools/paged_roofline.py [--out docs/paged_roofline.json]
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
import numpy as np

H, D = 8, 64
SLOTS = 64
SEQ = 2048
HBM_GBPS = 819e9


def build_state(page_size, occupancy, quantized=True, seed=0):
    """Fragmented pool: live slots' pages interleaved round-robin."""
    from flasht5_tpu.inference.paged_kv import PagedKVPool

    live = max(1, int(round(SLOTS * occupancy)))
    maxp = SEQ // page_size
    num_pages = live * maxp  # pool provisioned for tokens in flight
    pool = PagedKVPool(num_pages=num_pages, num_heads=H, page_size=page_size,
                       head_dim=D, max_slots=SLOTS, max_pages_per_slot=maxp,
                       quantized=quantized)
    # round-robin page allocation => fragmented tables
    pt = np.zeros((SLOTS, maxp), np.int32)
    next_page = 0
    for j in range(maxp):
        for slot in range(live):
            pt[slot, j] = next_page
            next_page += 1
    rng = np.random.default_rng(seed)
    pool.page_table = jnp.asarray(pt)
    pool.lengths = jnp.asarray(
        [SEQ if s < live else 0 for s in range(SLOTS)], jnp.int32)
    shape = pool.pages_k.shape
    if quantized:
        pool.pages_k = jnp.asarray(
            rng.integers(-127, 127, size=shape), jnp.int8)
        pool.pages_v = jnp.asarray(
            rng.integers(-127, 127, size=shape), jnp.int8)
        sshape = pool.scales_k.shape
        pool.scales_k = jnp.asarray(rng.random(sshape) * 0.02, jnp.float32)
        pool.scales_v = jnp.asarray(rng.random(sshape) * 0.02, jnp.float32)
    else:
        pool.pages_k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        pool.pages_v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    return pool, live


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/paged_roofline.json")
    ap.add_argument("--page_sizes", default="16,128")
    ap.add_argument("--occupancies", default="0.25,0.5,1.0")
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import functools

    from flasht5_tpu.inference.paged_kv import (
        pack_kv_pages_fused, paged_decode_attention_arrays,
        paged_decode_attention_chunked_packed, paged_decode_attention_ragged)
    from speed_of_light_tpu import chained_seconds

    rows = []
    for P in [int(x) for x in args.page_sizes.split(",")]:
        for occ in [float(x) for x in args.occupancies.split(",")]:
            pool, live = build_state(P, occ)
            q0 = jax.random.normal(jax.random.PRNGKey(1), (SLOTS, H, D),
                                   jnp.float32)
            # bytes the kernel must read: live K+V int8 pages + fp32 scales
            live_tokens = live * SEQ
            must_bytes = 2 * live_tokens * H * (D * 1 + 4)
            pkv, skv = pack_kv_pages_fused(pool.pages_k, pool.pages_v,
                                           pool.scales_k, pool.scales_v)
            kernels = [("ragged", paged_decode_attention_ragged, False),
                       ("dense_grid", paged_decode_attention_arrays, False)]
            for c in (4, 8, 16):
                if c * P <= SEQ:
                    kernels.append(
                        (f"chunked_c{c}",
                         functools.partial(
                             paged_decode_attention_chunked_packed, chunk=c),
                         True))
            for name, fn, packed in kernels:
                if packed:
                    def step(qq, fn=fn):
                        return fn(qq, pkv, skv, pool.page_table,
                                  pool.lengths,
                                  sm_scale=0.125).astype(jnp.float32)
                else:
                    def step(qq, fn=fn):
                        return fn(qq, pool.pages_k, pool.pages_v,
                                  pool.scales_k, pool.scales_v,
                                  pool.page_table, pool.lengths,
                                  sm_scale=0.125).astype(jnp.float32)

                try:
                    sec = chained_seconds(step, q0)
                    row = {"kernel": name, "page_size": P, "occupancy": occ,
                           "live_slots": live, "ms": round(sec * 1e3, 3),
                           "live_kv_gb_s": round(must_bytes / sec / 1e9, 1),
                           "sol": round(must_bytes / sec / HBM_GBPS, 3)}
                except Exception as e:  # noqa: BLE001
                    row = {"kernel": name, "page_size": P, "occupancy": occ,
                           "error": repr(e)[:200]}
                rows.append(row)
                print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
