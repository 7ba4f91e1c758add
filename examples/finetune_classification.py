"""Sequence-classification finetuning example (FLAN-style downstream task).

Downstream parity with the reference's finetuning story (README.md:193-200:
load a pretrained FAT5/T5 checkpoint via AutoModelForSequenceClassification
and finetune): here the encoder trunk is loaded from a FAT5/HF checkpoint,
a classification head is attached, and a simple jitted finetune loop runs.

    python examples/finetune_classification.py ckpt.safetensors \
        --num-labels 2 [--hf]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def attach_head(rng, config, trunk_params, num_labels):
    """Init a classification head over an imported encoder trunk."""
    from flasht5_tpu.models import heads, t5

    full = heads.init_sequence_classification_params(rng, config, num_labels)
    full["shared"] = trunk_params["shared"]
    full["encoder"] = trunk_params["encoder"]
    return full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--num-labels", type=int, default=2)
    ap.add_argument("--hf", action="store_true",
                    help="checkpoint uses HF T5 naming")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    from flasht5_tpu.config import FlashT5Config
    from flasht5_tpu.models import heads
    from flasht5_tpu.optim import adamw_scale, no_decay_mask

    if args.checkpoint:
        from flasht5_tpu.convert import (
            load_fat5_safetensors,
            load_hf_t5_safetensors,
        )
        loader = load_hf_t5_safetensors if args.hf else load_fat5_safetensors
        trunk = loader(args.checkpoint)
        emb = trunk["shared"]["embedding"]
        config = FlashT5Config(
            vocab_size=emb.shape[0], d_model=emb.shape[1],
            num_layers=len(trunk["encoder"]["block"]),
            dropout_rate=0.0, attention_scale=1.0, pad_token_id=0)
    else:  # demo mode: random trunk on a toy task
        from flasht5_tpu.models import t5
        config = FlashT5Config(vocab_size=512, d_model=64, d_kv=16,
                               num_heads=4, d_ff=128, num_layers=2,
                               dropout_rate=0.0, attention_scale=1.0,
                               pad_token_id=0, dtype="float32")
        trunk = t5.init_encoder_params(jax.random.PRNGKey(0), config)

    params = attach_head(jax.random.PRNGKey(1), config, trunk,
                         args.num_labels)
    tx = adamw_scale(args.lr, weight_decay=0.01, mask=no_decay_mask)
    opt = tx.init(params)

    rng = np.random.default_rng(0)

    # small fixed dataset, multiple epochs (the demo task is per-token
    # memorization: label = first token in the upper half of the vocab)
    pool = []
    for _ in range(4):
        ids = rng.integers(2, config.vocab_size, size=(16, 24)).astype(np.int32)
        ids[:, -1] = config.eos_token_id
        y = (ids[:, 0] >= config.vocab_size // 2).astype(np.int32)
        pool.append((jnp.asarray(ids), jnp.asarray(y)))

    def toy_batch(i):
        return pool[i % len(pool)]

    @jax.jit
    def step(params, opt, ids, y):
        def loss_fn(p):
            out = heads.sequence_classification_forward(
                config, p, ids, labels=y,
                problem_type="single_label_classification",
                num_labels=args.num_labels)
            return out["loss"], out["logits"]

        (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return params, opt, loss, acc

    for i in range(args.steps):
        ids, y = toy_batch(i)
        params, opt, loss, acc = step(params, opt, ids, y)
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} acc {float(acc):.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
