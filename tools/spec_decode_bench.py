"""On-chip A/B for speculative decoding: greedy vs verify-window decode.

Measures, on the real chip, (a) the ceiling speedup with oracle drafts
(draft_source = the greedy output itself, acceptance ~1), (b) the overhead
floor with adversarial drafts (acceptance ~0 — every window still pays the
Q-row verify), and derives the breakeven acceptance rate. Random-init
weights: the COPY rate of real tasks decides where between (a) and (b) a
deployment lands; the artifact pins the machine ceiling/floor, not a task
claim.

Writes docs/spec_decode.json. Timing note: block_until_ready is a no-op on
the tunneled backend — every timed region ends in np.asarray().
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import generate, speculative_generate
from flasht5_tpu.models import t5


def chained_window_cost(cfg, params, ids, q, iters=(128, 512), reps=5):
    """Per-window cost via chained differential timing (tunnel dispatch and
    encode/init cancel): run the same fori_loop at two iteration counts and
    divide the time delta by the iteration delta."""
    from flasht5_tpu.inference.kv_cache import (decode_window_step,
                                                init_decode_state)

    def make(n):
        @jax.jit
        def run(params, ids):
            enc = t5.encode(cfg, params, ids)
            st = init_decode_state(cfg, params, enc, 160)

            def body(i, carry):
                st, acc = carry
                toks = jnp.full((ids.shape[0], q), 5, jnp.int32)
                lg, st2 = decode_window_step(cfg, params, st, toks)
                st = st2._replace(t=jnp.minimum(st2.t, 120))
                return st, acc + jnp.sum(lg[:, 0, :4])
            _, acc = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
            return acc
        return run

    totals = []
    for n in iters:
        f = make(n)
        float(f(params, ids))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(params, ids))
            ts.append(time.time() - t0)
        totals.append(float(np.median(ts)))
    return (totals[1] - totals[0]) / (iters[1] - iters[0])


def timed(fn, reps=3):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.time() - t0)
    return float(np.median(times)), float(min(times)), float(max(times)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--enc_len", type=int, default=256)
    ap.add_argument("--max_length", type=int, default=128)
    ap.add_argument("--windows", type=str, default="4,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--out", type=str, default="docs/spec_decode.json")
    args = ap.parse_args()

    cfg = FlashT5Config(
        vocab_size=32128, d_model=512, d_kv=64, num_heads=6, d_ff=1024,
        num_layers=8, dropout_rate=0.0, dtype=args.dtype, pad_token_id=0,
        max_sequence_length=1024)
    params = t5.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1),
                             (args.batch, args.enc_len), 2, 32000)

    result = {
        "device": str(jax.devices()[0]),
        "model": f"d512/L8/H6 {args.dtype} (random init)",
        "batch": args.batch, "enc_len": args.enc_len,
        "max_length": args.max_length, "reps": args.reps,
        "note": ("random-init logits are nearly flat, so low-precision "
                 "near-ties between the Q-row verify matmul and the "
                 "single-row greedy matmul can flip argmax; exactness "
                 "holds whenever both paths see the same logit numerics "
                 "(f32 rows; CPU parity tests). agreement = fraction of "
                 "positions matching greedy up to each row's first EOS."),
        "rows": [],
    }

    g_ms, g_min, g_max, greedy_out = timed(
        lambda: generate(cfg, params, ids, max_length=args.max_length),
        args.reps)
    n_tok = int(np.asarray(
        jnp.sum(jnp.argmax(np.asarray(greedy_out) == cfg.eos_token_id,
                           axis=-1))))
    result["rows"].append({
        "variant": "greedy", "ms": round(g_ms * 1e3, 2),
        "min_ms": round(g_min * 1e3, 2), "max_ms": round(g_max * 1e3, 2),
        "decoded_tokens": n_tok,
        "ms_per_token": round(g_ms * 1e3 / max(n_tok, 1), 3),
    })
    greedy_np = jnp.asarray(np.asarray(greedy_out))
    bad_src = jnp.full((args.batch, 32), 7, jnp.int32)

    for w in [int(x) for x in args.windows.split(",")]:
        # self-oracle: the spec path's own output as its draft source — the
        # window argmax chain is deterministic, so drafts always hit and the
        # run shows the full-acceptance ceiling regardless of how flat the
        # random-init logits are (greedy-output drafts stop matching at the
        # first near-tie argmax flip between the Q-row and 1-row matmuls).
        self_out = speculative_generate(
            cfg, params, ids, max_length=args.max_length, window=w,
            draft_source=bad_src)
        self_src = jnp.asarray(np.asarray(self_out))
        for name, src in (("self_oracle", self_src), ("oracle", greedy_np),
                          ("adversarial", bad_src)):
            s_ms, s_min, s_max, out = timed(
                lambda w=w, src=src: speculative_generate(
                    cfg, params, ids, max_length=args.max_length, window=w,
                    draft_source=src, return_stats=True), args.reps)
            toks, stats = out
            tnp, gnp = np.asarray(toks), np.asarray(greedy_out)
            exact = bool(np.array_equal(tnp, gnp))
            # agreement up to greedy's first EOS per row
            agree, total = 0, 0
            for bi in range(gnp.shape[0]):
                e = int(np.argmax(gnp[bi] == cfg.eos_token_id))
                agree += int(np.sum(tnp[bi, :e + 1] == gnp[bi, :e + 1]))
                total += e + 1
            result["rows"].append({
                "variant": f"spec_w{w}_{name}",
                "ms": round(s_ms * 1e3, 2),
                "min_ms": round(s_min * 1e3, 2),
                "max_ms": round(s_max * 1e3, 2),
                "windows": int(np.asarray(stats["windows"])),
                "generated": int(np.asarray(stats["generated"])),
                "speedup_vs_greedy": round(g_ms / s_ms, 3),
                "token_exact_vs_greedy": exact,
                "agreement_vs_greedy": round(agree / max(total, 1), 4),
            })

    # per-window cost, chained differential (the end-to-end totals above
    # carry ~40ms of encode+dispatch that masks the loop at short decodes)
    step_ms = chained_window_cost(cfg, params, ids, 1) * 1e3
    result["chained_ms_per_step_q1"] = round(step_ms, 4)
    for w in [int(x) for x in args.windows.split(",")]:
        win_ms = chained_window_cost(cfg, params, ids, w) * 1e3
        result[f"chained_ms_per_window_q{w}"] = round(win_ms, 4)
        result[f"w{w}_window_cost_vs_step"] = round(win_ms / step_ms, 3)
        # speedup at acceptance a = (tokens/window) / cost_ratio; breakeven
        # tokens-per-window equals the cost ratio
        result[f"w{w}_breakeven_tokens_per_window"] = round(
            win_ms / step_ms, 3)
        result[f"w{w}_full_acceptance_speedup"] = round(
            w * step_ms / win_ms, 2)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
