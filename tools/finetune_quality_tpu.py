"""Finetune quality delta under weight quantization (BASELINE.md target 3,
second clause: "finetune accuracy within stated Δ").

No external checkpoints are reachable in this environment (zero egress), so
the pretrained trunk is produced locally: pretrain the smoke-proxy model on a
synthetic Markov language (same harness as tools/smoke_pretrain_tpu.py —
identical production kernels: pallas_rpe attention, fused LN/CE), then
finetune a sequence-classification head + trunk on a downstream task in the
same token space — classify which of two Markov languages generated the
sequence — and measure held-out accuracy with bf16 weights vs INT8/FP8
weight-only quantization (per-channel and group-wise g64).

The task is chosen so pretraining genuinely transfers: language A is the
pretraining corpus's transition table, so the trunk's bigram features are
directly discriminative.

    python tools/finetune_quality_tpu.py [--pretrain-steps 600]
        [--finetune-steps 200] [--out QUALITY_finetune_r03.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def lang_corpus(vocab, n_docs, rng, succ, length=(50, 70)):
    """Documents from an explicit bigram transition table `succ`."""
    docs = []
    for _ in range(n_docs):
        n = int(rng.integers(*length))
        tok = int(rng.integers(13, vocab - 100))
        out = [tok]
        for _ in range(n - 1):
            if rng.random() < 0.85:
                tok = int(succ[tok, rng.integers(0, 3)])
            else:
                tok = int(rng.integers(13, vocab - 100))
            out.append(tok)
        docs.append(np.asarray(out, np.int32))
    return docs


def make_cls_batches(vocab, rng, n, batch, seq_len, eos_id):
    """Balanced two-language classification batches.

    Language A uses the same transition table as the pretraining corpus
    (np.random.default_rng(0), matching tools/smoke_pretrain_tpu.py);
    language B draws a fresh table.
    """
    # both tables FIXED (not drawn from the continuing `rng`): language B
    # must be the same language across the train and eval calls, or eval
    # measures transfer to an unseen language instead of the learned task
    succ_a = np.random.default_rng(0).integers(13, vocab - 100,
                                               size=(vocab, 3))
    succ_b = np.random.default_rng(1).integers(13, vocab - 100,
                                               size=(vocab, 3))
    out = []
    for _ in range(n):
        ids = np.zeros((batch, seq_len), np.int32)
        labels = np.zeros((batch,), np.int32)
        for r in range(batch):
            lab = int(rng.integers(0, 2))
            doc = lang_corpus(vocab, 1, rng, succ_a if lab == 0 else succ_b)[0]
            doc = doc[: seq_len - 1]
            ids[r, : len(doc)] = doc
            ids[r, len(doc)] = eos_id
            labels[r] = lab
        out.append((ids, labels))
    return out


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain-steps", type=int, default=1200)
    ap.add_argument("--finetune-steps", type=int, default=600)
    ap.add_argument("--finetune-lr", type=float, default=1e-3)
    ap.add_argument("--out", default="QUALITY_finetune_r03.json")
    args = ap.parse_args()

    import optax

    from flasht5_tpu.config import FlashT5Config
    from flasht5_tpu.data import DataCollatorForUL2, Denoiser
    from flasht5_tpu.models import heads
    from flasht5_tpu.optim import adamw_scale, no_decay_mask
    from flasht5_tpu.quantize import quantize_params
    from flasht5_tpu.train import Trainer, TrainerConfig
    from smoke_pretrain_tpu import IdTokenizer, markov_corpus

    vocab = 2048
    on_tpu = jax.default_backend() == "tpu"
    config = FlashT5Config(
        vocab_size=vocab, d_model=256, d_kv=32, num_heads=8, d_ff=512,
        num_layers=4, dropout_rate=0.0, attention_scale=1.0, z_loss=1e-4,
        pad_token_id=0,
        attention_type="pallas_rpe" if on_tpu else "ref",
        use_fused_layernorm=on_tpu, use_fused_crossentropy=on_tpu)

    # ---- pretrain the trunk (same recipe as smoke_pretrain_tpu) ----------
    tok = IdTokenizer(vocab)
    coll = DataCollatorForUL2(
        tok, max_length=128, max_labels_length=64, batch_size=16,
        denoiser_list=[Denoiser(3.0, 0.15, 60, "[R]"),
                       Denoiser(8.0, 0.5, 60, "[X]"),
                       Denoiser(4.0, 0.0, 1, "[S]")],
        denoiser_proportions=[0.5, 0.25, 0.25], seed=0)
    rng = np.random.default_rng(0)
    docs = markov_corpus(vocab, 2000, rng)

    def pre_batches(n, seed):
        brng = np.random.default_rng(seed)
        for _ in range(n):
            idx = brng.integers(0, len(docs), size=24)
            yield coll([{"input_ids": docs[i].reshape(1, -1)} for i in idx])

    tcfg = TrainerConfig(learning_rate=3e-3, max_steps=args.pretrain_steps,
                         warmup_steps=20,
                         logging_steps=max(args.pretrain_steps // 4, 1),
                         output_dir="/tmp/ft_quality_ckpt")
    trainer = Trainer(config, tcfg)
    trainer.train(pre_batches(args.pretrain_steps, 1),
                  log_fn=lambda e: print(e, flush=True))

    # ---- attach a classification head, finetune trunk+head ---------------
    frng = np.random.default_rng(7)
    seq_len = 64
    train_b = make_cls_batches(vocab, frng, args.finetune_steps, 32, seq_len,
                               config.eos_token_id)
    eval_b = make_cls_batches(vocab, frng, 16, 32, seq_len,
                              config.eos_token_id)

    params = heads.init_sequence_classification_params(
        jax.random.PRNGKey(3), config, num_labels=2)
    params["shared"] = trainer.params["shared"]
    params["encoder"] = trainer.params["encoder"]

    tx = adamw_scale(args.finetune_lr, weight_decay=0.01, mask=no_decay_mask)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state, ids, labels):
        def loss_fn(p):
            out = heads.sequence_classification_forward(
                config, p, ids, labels=labels, num_labels=2)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i, (ids, labels) in enumerate(train_b):
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(ids), jnp.asarray(labels))
        if i % 50 == 0:
            print({"finetune_step": i, "loss": float(loss)}, flush=True)

    # ---- held-out accuracy: bf16 vs quantized variants -------------------
    @jax.jit
    def logits_fn(p, ids):
        return heads.sequence_classification_forward(config, p, ids)["logits"]

    def accuracy(p):
        hits = total = 0
        for ids, labels in eval_b:
            pred = np.asarray(jnp.argmax(logits_fn(p, jnp.asarray(ids)), -1))
            hits += int((pred == labels).sum())
            total += len(labels)
        return hits / total

    acc = {"bf16": accuracy(params)}
    for tag, kw in [("int8", {}), ("fp8", {}),
                    ("int8_g64", {"group_size": 64}),
                    ("fp8_g64", {"group_size": 64})]:
        fmt = "fp8" if tag.startswith("fp8") else "int8"
        acc[tag] = accuracy(quantize_params(params, fmt, **kw))

    payload = {
        "metric": "finetune_accuracy_quant_delta",
        "task": "two-language Markov classification (pretrained trunk)",
        "pretrain_steps": args.pretrain_steps,
        "finetune_steps": args.finetune_steps,
        "eval_examples": 16 * 32,
        "accuracy": {k: round(v, 4) for k, v in acc.items()},
        "delta_vs_bf16": {k: round(acc[k] - acc["bf16"], 4)
                          for k in acc if k != "bf16"},
        "note": ("no external checkpoints reachable (zero egress); trunk is "
                 "locally pretrained with the production kernel path. "
                 "Acceptance: |delta| <= 0.01 accuracy for weight-only "
                 "quantization."),
        "backend": jax.default_backend(),
    }
    print(json.dumps(payload), flush=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    assert acc["bf16"] > 0.8, "finetune failed to learn the task"


if __name__ == "__main__":
    main()
