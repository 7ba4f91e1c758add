"""On-chip probe for the RPE forward bias-add exposure (VERDICT r3 #6).

Round-3 ablation pinned the fwd anatomy at (B16,H12,S1024,D64), BM512:
bias-table add ~29%, softmax ~28%, QK/PV at the half-MXU floor. Exact
fusion of the bucket bias into the QK contraction is impossible (step
functions -> full-rank Toeplitz; an identity-matmul extension [q|I]@[k;bias]
multiplies contraction depth 64 -> 64+BM, ~9x the QK flops — strictly
worse). What CAN move: the per-batch VPU op count of the epilogue. The
batch loop is unrolled in-body (bfold), so loop-invariant work hoists.

Variants (all numerically equivalent to the production kernel):
  v0_current     s = qk + bias(bf16, mixed-type add); max; exp(s-m); sum; pv
  v1_hoist_f32   bias converted to f32 ONCE before the batch loop (is the
                 per-batch bf16->f32 convert real, or already CSE'd?)
  v2_exp_table   table stores exp(w - wmax_h): p = exp(s - max(s)) * etab.
                 The max no longer sees the bias (upper bound m+wmax is
                 exact in LSE: scaling p by exp(bias-wmax) cancels in pv/l);
                 the add+convert becomes one hoisted-f32 multiply.
  v3_ones_col    v2 + softmax sum folded into the PV matmul via a ones
                 column on V (D=64 leaves half the MXU lanes idle, so the
                 65th output lane is free): pv' = p @ [v|1] -> l = pv'[:,64]
  v4_sumcol_only v0 + the ones-column sum fold alone (decoupled measure)

Run:  python tools/fwd_epilogue_probe.py  (on the TPU chip)
Writes docs/fwd_epilogue_probe.json.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speed_of_light_tpu import chained_seconds

B, H, S, D = 16, 12, 1024, 64
BM, BN = 512, 1024
NB, MAXD = 32, 128


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, variant):
    if variant in ("v1_hoist_f32", "v2_exp_table", "v3_ones_col"):
        bias = bias_ref[0, 0].astype(jnp.float32)
    else:
        bias = bias_ref[0, 0]
    mult = variant in ("v2_exp_table", "v3_ones_col")
    sumcol = variant in ("v3_ones_col", "v4_sumcol_only")
    for b in range(B):
        s = jax.lax.dot_general(q_ref[b, 0], k_ref[b, 0],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if not mult:
            s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        if mult:
            p = p * bias
        if sumcol:
            pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b, 0],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            l = pv[:, D:D + 1]
            pv = pv[:, :D]
        else:
            l = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[b, 0],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        o_ref[b, 0] = (pv / l).astype(o_ref.dtype)
        lse_ref[b, 0] = m + jnp.log(l)


def run_variant(variant, q, k, v, table):
    dv = D + 1 if variant in ("v3_ones_col", "v4_sumcol_only") else D
    n_i = S // BM

    def call(qq, kk, vv, tt):
        return pl.pallas_call(
            functools.partial(_kernel, variant=variant),
            grid=(H, n_i),
            in_specs=[
                pl.BlockSpec((B, 1, BM, D), lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1, BN, D), lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1, BN, dv), lambda h, i: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BM, BN), lambda h, i: (i, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((B, 1, BM, D), lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 1, BM, 1), lambda h, i: (0, h, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qq, kk, vv, tt)

    if variant in ("v3_ones_col", "v4_sumcol_only"):
        v = jnp.concatenate([v, jnp.ones((B, H, S, 1), v.dtype)], -1)
    # chained_seconds returns (median, min, max) since the r4 median-of-N
    # update
    sec, sec_min, sec_max = chained_seconds(
        lambda qq, kk, vv, tt: call(qq, kk, vv, tt)[0], q, k, v, table)
    out = call(q, k, v, table)[0]
    return (sec, sec_min, sec_max), out


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
    w = jax.random.normal(ks[3], (NB, H), jnp.float32) * 0.5

    # additive table per (i, h): bias tiles for the 2 row offsets (n_j == 1)
    from flasht5_tpu.positional import relative_position_bucket
    rows = (jnp.arange(S // BM)[:, None, None] * BM
            + jax.lax.broadcasted_iota(jnp.int32, (1, BM, BN), 1))
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, BM, BN), 2)
    buckets = relative_position_bucket(cols - rows, bidirectional=True,
                                       num_buckets=NB, max_distance=MAXD)
    onehot = jax.nn.one_hot(buckets, NB, dtype=jnp.float32)
    add_tab = jnp.einsum("imbk,kh->ihmb", onehot, w)
    wmax = jnp.max(w, axis=0)                       # (H,)
    exp_tab = jnp.exp(add_tab - wmax[None, :, None, None])

    results = {}
    oref = None
    for variant in ("v0_current", "v1_hoist_f32", "v2_exp_table",
                    "v3_ones_col", "v4_sumcol_only"):
        mult = variant in ("v2_exp_table", "v3_ones_col")
        tab = (exp_tab if mult else add_tab).astype(jnp.bfloat16)
        (sec, sec_min, sec_max), out = run_variant(variant, q, k, v, tab)
        if oref is None:
            oref = out.astype(jnp.float32)
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - oref)))
        results[variant] = {"ms": round(sec * 1e3, 3),
                            "ms_min": round(sec_min * 1e3, 3),
                            "ms_max": round(sec_max * 1e3, 3),
                            "max_abs_err_vs_v0": err}
        print(variant, results[variant], flush=True)

    payload = {"shape": {"B": B, "H": H, "S": S, "D": D, "BM": BM, "BN": BN},
               "date": "round-5", "variants": results,
               "note": ("chained-scan differential timing; err vs v0 is the "
                        "fp difference of the epilogue restructuring at bf16 "
                        "table precision (production parity tests gate the "
                        "real kernel at the 2x-torch-error pattern)")}
    with open("docs/fwd_epilogue_probe.json", "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
