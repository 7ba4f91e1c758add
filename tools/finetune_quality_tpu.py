"""Finetune quality delta under weight quantization (BASELINE.md target 3,
second clause: "finetune accuracy within stated Δ").

No external checkpoints are reachable in this environment (zero egress), so
the pretrained trunk is produced locally: pretrain the smoke-proxy model on a
synthetic Markov language (same harness as tools/smoke_pretrain_tpu.py —
identical production kernels: pallas_rpe attention, fused LN/CE), then
finetune a sequence-classification head + trunk on a downstream task in the
same token space — classify which of K overlapping Markov languages
generated the sequence — and measure held-out accuracy with bf16 weights vs INT8/FP8
weight-only quantization (per-channel and group-wise g64).

The task is chosen so pretraining genuinely transfers: language A is the
pretraining corpus's transition table, so the trunk's bigram features are
directly discriminative.

    python tools/finetune_quality_tpu.py [--pretrain-steps 600]
        [--finetune-steps 200] [--classes 4] [--diff-frac 0.12]
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


def make_langs(vocab, n_classes, diff_frac):
    """Class 0 is the pretraining language (np.random.default_rng(0),
    matching tools/smoke_pretrain_tpu.py). Classes 1..K-1 are copies of it
    with only `diff_frac` of transition rows resampled — the languages
    overlap in (1 - diff_frac) of their bigram structure, so a short
    document carries only a handful of discriminative transitions and
    held-out accuracy is evidence-limited instead of saturating at ~1.0
    (VERDICT r3 #8: the two-fresh-tables task measured every quant delta
    as exactly 0.000 at 0.9941 accuracy)."""
    succ_a = np.random.default_rng(0).integers(13, vocab - 100,
                                               size=(vocab, 3))
    langs = [succ_a]
    for c in range(1, n_classes):
        # tables FIXED per class (seeded by class id, not the continuing
        # rng): each language must be identical across train and eval
        crng = np.random.default_rng(100 + c)
        succ = succ_a.copy()
        rows = crng.random(vocab) < diff_frac
        succ[rows] = crng.integers(13, vocab - 100, size=(int(rows.sum()), 3))
        langs.append(succ)
    return langs


def make_cls_batches(vocab, rng, n, batch, seq_len, eos_id, langs,
                     doc_len=(32, 48)):
    """Balanced K-language classification batches over `langs` tables."""
    out = []
    for _ in range(n):
        ids = np.zeros((batch, seq_len), np.int32)
        labels = np.zeros((batch,), np.int32)
        for r in range(batch):
            lab = int(rng.integers(0, len(langs)))
            doc = lang_corpus(vocab, 1, rng, langs[lab], length=doc_len)[0]
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
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--diff-frac", type=float, default=0.3,
                    help="fraction of transition rows that differ between "
                         "class 0's language and each other class")
    ap.add_argument("--doc-len", type=int, nargs=2, default=(32, 48))
    ap.add_argument("--out", default="QUALITY_finetune_r04.json")
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
    seq_len = 40
    n_labels = args.classes
    langs = make_langs(vocab, n_labels, args.diff_frac)
    train_b = make_cls_batches(vocab, frng, args.finetune_steps, 32, seq_len,
                               config.eos_token_id, langs,
                               doc_len=tuple(args.doc_len))
    eval_b = make_cls_batches(vocab, frng, 16, 32, seq_len,
                              config.eos_token_id, langs,
                              doc_len=tuple(args.doc_len))

    params = heads.init_sequence_classification_params(
        jax.random.PRNGKey(3), config, num_labels=n_labels)
    params["shared"] = trainer.params["shared"]
    params["encoder"] = trainer.params["encoder"]

    tx = adamw_scale(args.finetune_lr, weight_decay=0.01, mask=no_decay_mask)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state, ids, labels):
        def loss_fn(p):
            out = heads.sequence_classification_forward(
                config, p, ids, labels=labels, num_labels=n_labels)
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
        return heads.sequence_classification_forward(
            config, p, ids, num_labels=n_labels)["logits"]

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
        "task": (f"{n_labels}-language Markov classification, "
                 f"diff_frac={args.diff_frac}, doc_len={tuple(args.doc_len)} "
                 "(pretrained trunk; overlapping languages)"),
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
    assert 0.5 < acc["bf16"] < 0.97, (
        "task must land in the evidence-limited band (VERDICT r3 #8): "
        f"bf16={acc['bf16']}")


if __name__ == "__main__":
    main()
