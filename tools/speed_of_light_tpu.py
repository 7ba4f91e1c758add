"""Per-kernel speed-of-light report on the chip.

North-star requirement: "every dequant+matmul and RPE-attention kernel at
speed-of-light per chip". Measures each kernel with DIFFERENTIAL chained-loop
timing: the kernel is iterated inside one jitted lax.scan (output feeds the
next input, so nothing can be elided), timed at two different lengths, and
the per-iteration time is the slope — which cancels dispatch/tunnel/transfer
overhead exactly (this environment adds ~25ms per dispatch, which would
otherwise swamp ms-scale kernels).

    python tools/speed_of_light_tpu.py   # writes docs/perf_report.md
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flasht5_tpu.utils.profiling import CHIP_SPECS

N1, N2 = 5, 45
REPS = 5   # independent differential samples per row (median + min/max)
ROWS = []


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def chained_seconds(step_fn, x0, *ops):
    """Per-iteration seconds via two-point chained-scan timing.

    Large tensors the kernel reads must be passed via *ops (explicit jit
    operands) — closure capture would inline them as constants and bloat the
    MLIR module past what the compile service accepts."""

    def make(n):
        @jax.jit
        def run(x, *ops):
            def body(c, _):
                return step_fn(c, *ops), None

            out, _ = jax.lax.scan(body, x, None, length=n)
            return out

        return run

    r1, r2 = make(N1), make(N2)
    _sync(r1(x0, *ops))
    _sync(r2(x0, *ops))  # compile + warm
    # REPS independent chained-differential samples -> per-row median +
    # min/max (VERDICT r3 #10: single-shot rows on the shared tunneled chip
    # carried a 2-4x variance caveat nobody could act on)
    samples = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(r1(x0, *ops))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(r2(x0, *ops))
        t2 = time.perf_counter() - t0
        samples.append(max((t2 - t1) / (N2 - N1), 1e-9))
    samples.sort()
    return samples[len(samples) // 2], samples[0], samples[-1]


def report(tag, sec3, flops, bytes_accessed, chip="v5e"):
    seconds, smin, smax = sec3 if isinstance(sec3, tuple) else (sec3,) * 3
    spec = CHIP_SPECS[chip]
    tflops = flops / seconds / 1e12
    gbps = bytes_accessed / seconds / 1e9
    bound_t = max(flops / spec["bf16_flops"], bytes_accessed / spec["hbm_gbps"])
    bound = ("compute" if flops / spec["bf16_flops"] >
             bytes_accessed / spec["hbm_gbps"] else "memory")
    sol = bound_t / seconds
    spread = smax / max(smin, 1e-12)
    row = {"ms": round(seconds * 1e3, 3), "ms_min": round(smin * 1e3, 3),
           "ms_max": round(smax * 1e3, 3), "tflops": round(tflops, 1),
           "gbps": round(gbps, 1), "bound": bound, "sol": round(sol, 3),
           "unstable": spread > 2.0}
    ROWS.append((tag, row))
    print(tag, row, flush=True)


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    B, H, S, D = 16, 12, 1024, 64
    bf = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, S, D), bf)
    k = jax.random.normal(ks[1], (B, H, S, D), bf)
    v = jax.random.normal(ks[2], (B, H, S, D), bf)
    bias = jax.random.normal(ks[3], (1, H, S, S), bf)
    wrpe = jax.random.normal(ks[3], (32, H), jnp.float32) * 0.5

    attn_flops = 4.0 * B * H * S * S * D
    attn_bytes = 4 * B * H * S * D * 2

    from flasht5_tpu.ops.flash_attention import flash_attention
    from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe

    sec = chained_seconds(
        lambda qq, kk, vv: flash_attention_rpe(qq, kk, vv, wrpe, causal=False,
                                               sm_scale=0.125,
                                               bidirectional=True), q, k, v)
    report("rpe_attention_fwd", sec, attn_flops, attn_bytes)

    sec = chained_seconds(
        lambda qq, kk, vv, bb: flash_attention(qq, kk, vv, bb, causal=False,
                                               sm_scale=0.125), q, k, v, bias)
    report("bias_attention_fwd", sec, attn_flops, attn_bytes + H * S * S * 2)

    def rpe_grad(qq, kk, vv):
        return jax.grad(lambda x: jnp.sum(flash_attention_rpe(
            x, kk, vv, wrpe, causal=False, sm_scale=0.125,
            bidirectional=True).astype(jnp.float32)))(qq).astype(bf)

    sec = chained_seconds(rpe_grad, q, k, v)
    report("rpe_attention_fwd_bwd", sec, attn_flops * 3.5, attn_bytes * 4)

    from flasht5_tpu.ops.rmsnorm import rms_norm
    rows, dmodel = 16384, 2048
    x = jax.random.normal(ks[0], (rows, dmodel), bf)
    w = jnp.ones((dmodel,), bf)
    sec = chained_seconds(lambda xx: rms_norm(xx, w), x)
    report("rmsnorm_fwd", sec, 4.0 * rows * dmodel,
           2 * rows * dmodel * 2 + rows * 4)

    from flasht5_tpu.ops.cross_entropy import cross_entropy_loss
    V = 32768
    # bf16 logits: what the flagship train step actually feeds CE
    # (lm_head matmul emits the activation dtype, models/t5.py:653)
    logits = jax.random.normal(ks[1], (2048, V), jnp.bfloat16)
    labels = jax.random.randint(ks[2], (2048,), 0, V)

    def ce_step(lg):
        losses, _ = cross_entropy_loss(lg, labels, 1e-4, 0.0)
        # keep the dependency live; cast back so the scan carry dtype holds
        return (lg + losses[:, None] * 1e-30).astype(lg.dtype)

    sec = chained_seconds(ce_step, logits)
    # bytes: bf16 logits read by the kernel + the bf16 pass-through write
    # the chaining harness adds to keep the dependency live
    report("cross_entropy_fwd", sec, 3.0 * 2048 * V, 2048 * V * 4)

    from flasht5_tpu.ops.quant import quant_matmul, quantize_int8
    M = 2048
    K = N = 4096
    xq = jax.random.normal(ks[0], (M, K), bf)
    wq = quantize_int8(jax.random.normal(ks[1], (K, N)) * 0.05)
    sec = chained_seconds(lambda xx: quant_matmul(xx, wq), xq)
    report("int8_dequant_matmul", sec, 2.0 * M * K * N,
           M * K * 2 + K * N * 1 + M * N * 2)

    from flasht5_tpu.ops.decode_attention import decode_attention
    from flasht5_tpu.ops.quant import quantize_kv
    slots, L = 8, 2048
    qd = jax.random.normal(ks[0], (slots, H, D), jnp.float32)
    kd, kds = quantize_kv(jax.random.normal(ks[1], (slots, H, L, D)))
    vd, vds = quantize_kv(jax.random.normal(ks[2], (slots, H, L, D)))
    lengths = jnp.full((slots,), L)
    sec = chained_seconds(
        lambda qq, a, b, c, d: decode_attention(
            qq, a, b, k_scales=c, v_scales=d, lengths=lengths,
            sm_scale=0.125, chunk=256), qd, kd, vd, kds, vds)
    report("decode_attention_int8", sec, 4.0 * slots * H * L * D,
           2 * slots * H * L * (D + 4))

    with open("docs/perf_report.md", "w") as fh:
        fh.write("# Kernel speed-of-light report (v5e-1)\n\n")
        fh.write("Generated by tools/speed_of_light_tpu.py — differential\n"
                 "chained-loop timing (dispatch overhead cancelled). `sol` =\n"
                 "fraction of the binding roofline achieved.\n\n")
        fh.write("Each row is the MEDIAN of 5 independent chained-\n"
                 "differential samples with min/max spread (r4: the shared\n"
                 "tunneled dev chip varies under external load; a row with\n"
                 "max/min > 2x is flagged UNSTABLE and should not drive\n"
                 "decisions). Treat the end-to-end train bench (bench.py,\n"
                 "median-of-3 with its own spread fields) as ground truth;\n"
                 "these rows identify which kernels have headroom.\n\n")
        fh.write("Attention rooflines: `sol` divides by the chip's nominal\n"
                 "bf16 peak, but at d_kv=64 the score matmul contracts over\n"
                 "64 (< the 128-deep MXU) and the PV matmul emits 64 lanes\n"
                 "(< the 128-wide MXU), so the achievable ceiling for the\n"
                 "attention kernels is ~0.5 of nominal before any softmax\n"
                 "VPU cost. Read attention `sol` against that ~0.5 bound.\n"
                 "Round-3 component ablation (tools/attn_ablate.py fwd-*)\n"
                 "pins the residual forward gap: bias-table add ~29%,\n"
                 "softmax max/exp/sum ~28%, QK/PV at the half-MXU floor;\n"
                 "the backward sits at 78% of its 5-matmul floor (dW skew\n"
                 "0.12ms at B16,H12,S1024). Practical fwd+bwd ceiling is\n"
                 "therefore ~0.39-0.41 of nominal; defaults (bf16 table,\n"
                 "fwd q-tile 512) were chosen by chained A/B against it.\n\n")
        fh.write("cross_entropy_fwd is VPU-bound, not tiling-bound: a\n"
                 "round-3 on-chip sweep (tools/ce_tile_sweep.py) measured\n"
                 "0.605-0.638ms flat across row/vocab tiles from (256,2048)\n"
                 "to (2048,2048)/(256,8192), before AND after the label-\n"
                 "gather hoist — the per-element bf16->f32 convert + online\n"
                 "max + exp + add floor sits at ~0.52 of the HBM roofline.\n"
                 "The remaining lever is fusing CE into the lm_head matmul\n"
                 "epilogue (logits never round-trip HBM), not tile shapes.\n\n")
        fh.write("| kernel | ms/call | ms min..max | TFLOPS | GB/s | bound "
                 "| sol | stable |\n")
        fh.write("|---|---|---|---|---|---|---|---|\n")
        for tag, d in ROWS:
            stab = "UNSTABLE" if d.get("unstable") else "ok"
            fh.write(f"| {tag} | {d['ms']} | {d['ms_min']}..{d['ms_max']} | "
                     f"{d['tflops']} | {d['gbps']} | "
                     f"{d['bound']} | {d['sol']} | {stab} |\n")
        fh.write(FLCE_SECTION)
    print("wrote docs/perf_report.md", flush=True)


FLCE_SECTION = """
Round-4 fused lm_head+CE (ops/fused_linear_ce.py, tools/flce_probe.py,
chained differential at rows 2048 x d 512 x V 32768):

| region | ms | MXU floor | of floor |
|---|---|---|---|
| lm_head+CE fwd+bwd, unfused (bf16 matmul -> tiled CE) | 1.728 | 1.046 (3 matmuls) | 0.606 |
| lm_head+CE fwd+bwd, FUSED (logits never in HBM) | 1.762 | 1.395 (4 matmuls) | 0.792 |
| lm_head+CE fwd only, unfused | 0.599 | — | — |
| lm_head+CE fwd only, FUSED | 0.532 | — | — |

The fused kernel achieves 0.79 of its own floor, but the strategy loses at
this shape: the backward's logits recompute is a 4th (rows x d x V) matmul
(+0.35ms MXU) and at d_model=512 XLA already hides most of the ~640MB
logits round-trip traffic behind the 3 unfused matmuls — the predicted
0.3-0.5ms/step win double-counted traffic that was never exposed. Forward-
only (eval/ppl scoring: no dlogits, no recompute) fusion wins 11%.
Defaults: training unfused, use_fused_lm_head_ce opt-in.

cross_entropy_fwd is VPU-bound, not tiling-bound: a round-3 on-chip sweep
(tools/ce_tile_sweep.py) measured 0.605-0.638ms flat across row/vocab tiles
from (256,2048) to (2048,2048)/(256,8192), before AND after the label-gather
hoist — the per-element bf16->f32 convert + online max + exp + add floor
sits at ~0.52 of the HBM roofline. The remaining lever was fusing CE into
the lm_head matmul epilogue — attempted in round 4, see the table above.

Paged decode rows live in docs/paged_roofline_chunked.json: the chunked
work-list kernel at 0.846 SoL (693 GB/s live-KV bandwidth) at 64 slots x
2048 tokens int8, fragmented tables — 8.8x the single-page forms. Small
pools (<= dense_read_max tokens/slot) use the launch-free XLA gather reader
(docs/paged_step_probe.json).
"""


if __name__ == "__main__":
    main()
