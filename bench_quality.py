"""Quantization-quality harness: Δperplexity INT8 (weights / weights+KV) vs
full precision (north-star acceptance: Δppl ≤ 0.1, BASELINE.json).

Usage:
    python bench_quality.py                    # synthetic-weights smoke run
    python bench_quality.py ckpt.safetensors   # real checkpoint (FAT5 naming)

Evaluates teacher-forced perplexity on a fixed token stream with the same
model in full precision and in four weight-only quantized variants —
INT8 and FP8-E4M3, each with per-output-channel and group-wise (g64) scales
— and reports one JSON line per variant. Weights whose input dim is not
divisible by the group size fall back to per-channel scales; the line's
`g64_fallbacks` field counts them (0 = every layer really ran group-wise).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.quantize import count_group_fallbacks, quantize_params


def eval_ppl(config, params, batches):
    """Teacher-forced perplexity over (input_ids, labels) batches.

    Forward-only scoring is where the fused lm_head+CE kernel wins (11%
    measured fwd-only, tools/flce_probe.py r4) — unlike training, there is
    no backward logits-recompute to pay for — so enable it here on TPU.
    (t5.forward falls back to the unfused path automatically when the
    lm_head leaf is quantized or embeddings are tied.)"""
    if jax.default_backend() == "tpu":
        config = config.replace(use_fused_lm_head_ce=True)
    fwd = jax.jit(lambda p, i, l: t5.forward(config, p, input_ids=i,
                                             labels=l)["loss"])
    losses = [float(fwd(params, jnp.asarray(i), jnp.asarray(l)))
              for i, l in batches]
    return float(np.exp(np.mean(losses)))


def main():
    if len(sys.argv) > 1:
        from flasht5_tpu.convert import load_fat5_safetensors
        params = load_fat5_safetensors(sys.argv[1])
        config = FlashT5Config(
            vocab_size=params["shared"]["embedding"].shape[0],
            d_model=params["shared"]["embedding"].shape[1],
            num_layers=len(params["encoder"]["block"]),
            num_heads=params["encoder"]["block"][0]["self_attention_layer"]
            ["self_attention"]["pe_encoding"]["relative_attention_bias"].shape[1],
            attention_scale=1.0, dropout_rate=0.0)
    else:
        config = FlashT5Config(vocab_size=1024, d_model=128, d_kv=32,
                               num_heads=4, d_ff=256, num_layers=4,
                               dropout_rate=0.0, attention_scale=1.0,
                               pad_token_id=0)
        params = jax.jit(lambda r: t5.init_params(r, config))(jax.random.PRNGKey(0))
        # briefly train on a structured synthetic task (copy with vocab
        # shift) so the quantization delta is measured on non-random weights
        import optax

        from flasht5_tpu.optim import adamw_scale, no_decay_mask
        tx = adamw_scale(3e-3, mask=no_decay_mask)
        opt = jax.jit(tx.init)(params)
        trng = np.random.default_rng(7)

        @jax.jit
        def train_step(params, opt, ids, lbl):
            loss, g = jax.value_and_grad(
                lambda p: t5.forward(config, p, input_ids=ids,
                                     labels=lbl)["loss"])(params)
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, loss

        n_train = 60 if jax.default_backend() == "tpu" else 10
        for _ in range(n_train):
            ids = trng.integers(2, config.vocab_size // 2,
                                size=(8, 64)).astype(np.int32)
            lbl = ((ids[:, :32] + 3) % config.vocab_size).astype(np.int32)
            params, opt, loss = train_step(params, opt, jnp.asarray(ids),
                                           jnp.asarray(lbl))

    rng = np.random.default_rng(0)
    if len(sys.argv) > 1:
        batches = [
            (rng.integers(2, config.vocab_size, size=(4, 128)).astype(np.int32),
             rng.integers(2, config.vocab_size, size=(4, 64)).astype(np.int32))
            for _ in range(4)
        ]
    else:
        # eval on the same structured task the tiny model was trained on
        batches = []
        for _ in range(4):
            ids = rng.integers(2, config.vocab_size // 2,
                               size=(4, 64)).astype(np.int32)
            batches.append((ids, ((ids[:, :32] + 3) % config.vocab_size).astype(np.int32)))

    ppl_fp = eval_ppl(config, params, batches)
    variants = [
        ("int8_weight_only", dict(fmt="int8")),
        ("fp8_weight_only", dict(fmt="fp8")),
        ("int8_weight_only_g64", dict(fmt="int8", group_size=64)),
        ("fp8_weight_only_g64", dict(fmt="fp8", group_size=64)),
    ]
    for tag, kw in variants:
        fmt = kw.pop("fmt")
        fallbacks = (count_group_fallbacks(params, kw["group_size"])
                     if kw.get("group_size") else None)
        ppl_q = eval_ppl(config, quantize_params(params, fmt, **kw), batches)
        delta = ppl_q - ppl_fp
        # acceptance: north-star absolute criterion (<=0.1 ppl) when
        # evaluating a real low-ppl checkpoint; relative <=1% as the
        # scale-aware fallback for the synthetic harness
        ok = abs(delta) <= 0.1 or abs(delta) / ppl_fp <= 0.01
        print(json.dumps({
            "metric": f"delta_ppl_{tag}",
            "value": round(delta, 4),
            "unit": "ppl",
            "ppl_fp": round(ppl_fp, 4),
            "ppl_quant": round(ppl_q, 4),
            "rel_delta": round(delta / ppl_fp, 6),
            "vs_baseline": 1.0 if ok else 0.0,
            **({} if fallbacks is None else {"g64_fallbacks": fallbacks}),
        }), flush=True)


if __name__ == "__main__":
    main()
