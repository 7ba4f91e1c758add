"""Quantization-quality harness: Δperplexity INT8 (weights / weights+KV) vs
full precision (north-star acceptance: Δppl ≤ 0.1, BASELINE.json).

Usage:
    python bench_quality.py                    # synthetic-weights smoke run
    python bench_quality.py ckpt.safetensors   # real checkpoint (FAT5 naming)

Evaluates teacher-forced perplexity on a fixed token stream with the same
model in (a) full precision, (b) INT8 weight-only, and reports the deltas as
one JSON line per config.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.quantize import quantize_params


def eval_ppl(config, params, batches):
    """Teacher-forced perplexity over (input_ids, labels) batches."""
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

    rng = np.random.default_rng(0)
    batches = [
        (rng.integers(2, config.vocab_size, size=(4, 128)).astype(np.int32),
         rng.integers(2, config.vocab_size, size=(4, 64)).astype(np.int32))
        for _ in range(4)
    ]

    ppl_fp = eval_ppl(config, params, batches)
    ppl_int8 = eval_ppl(config, quantize_params(params), batches)
    print(json.dumps({
        "metric": "delta_ppl_int8_weight_only",
        "value": round(ppl_int8 - ppl_fp, 4),
        "unit": "ppl",
        "ppl_fp": round(ppl_fp, 4),
        "ppl_int8": round(ppl_int8, 4),
        "vs_baseline": 1.0 if abs(ppl_int8 - ppl_fp) <= 0.1 else 0.0,
    }))


if __name__ == "__main__":
    main()
