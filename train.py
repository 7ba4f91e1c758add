"""Pretraining driver: `python train.py <config.yaml>`.

CLI parity with the reference driver (train_flash_t5.py:32-33): one YAML with
model_args / training_args / collator_args sections drives tokenizer loading,
pretokenized-dataset loading, the UL2 collator (7-denoiser mixture,
reference :57-64), AdamWScale + warmup-cosine/WSD, and the trainer loop with
checkpoint resume. TPU-native internals: jitted sharded step over a device
mesh, Orbax checkpoints.
"""

from __future__ import annotations

import sys

import numpy as np

from flasht5_tpu.config import FlashT5Config, load_run_config
from flasht5_tpu.data import DataCollatorForUL2, Denoiser
from flasht5_tpu.train import Trainer, TrainerConfig

# The reference's 7-denoiser UL2 mixture (train_flash_t5.py:57-64)
UL2_DENOISERS = [
    Denoiser(mu=3.0, r=0.15, max_spans=100, prefix="[R]"),
    Denoiser(mu=8.0, r=0.15, max_spans=100, prefix="[R]"),
    Denoiser(mu=4.0, r=0.0, max_spans=1, prefix="[S]"),
    Denoiser(mu=3.0, r=0.5, max_spans=100, prefix="[X]"),
    Denoiser(mu=8.0, r=0.5, max_spans=100, prefix="[X]"),
    Denoiser(mu=64.0, r=0.15, max_spans=100, prefix="[X]"),
    Denoiser(mu=64.0, r=0.5, max_spans=100, prefix="[X]"),
]
UL2_PROPORTIONS = [0.165, 0.165, 0.34, 0.0825, 0.0825, 0.0825, 0.0825]


def batch_iterator(dataset, collator, batch_size, seed=0, epochs=10_000):
    rng = np.random.default_rng(seed)
    n = len(dataset)
    for _ in range(epochs):
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            examples = [{"input_ids": np.asarray(dataset[int(i)]["input_ids"])}
                        for i in idx]
            yield collator(examples)


def main(config_path: str):
    cfg = load_run_config(config_path)
    model_cfg = FlashT5Config.from_dict(cfg["model_args"])
    targs = cfg["training_args"]
    cargs = cfg["collator_args"]

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(targs["tokenizer_name"])
    model_cfg = model_cfg.replace(vocab_size=len(tokenizer),
                                  pad_token_id=tokenizer.pad_token_id)

    import datasets
    train_set = datasets.load_from_disk(targs["train_dataset_path"])
    eval_set = (datasets.load_from_disk(targs["eval_dataset_path"])
                if targs.get("eval_dataset_path") else None)

    batch_size = int(targs.get("per_device_train_batch_size", 8))
    collator = DataCollatorForUL2(
        tokenizer,
        max_length=int(cargs.get("max_length", model_cfg.max_sequence_length)),
        max_labels_length=int(cargs.get("max_labels_length", 256)),
        batch_size=batch_size,
        denoiser_list=UL2_DENOISERS,
        denoiser_proportions=UL2_PROPORTIONS,
        causal=bool(cargs.get("causal", False)),
        random_chunk=bool(cargs.get("random_chunk", True)),
        fixed_batch_size=bool(cargs.get("fixed_batch_size", True)),
        min_size_inputs=int(cargs.get("min_size_inputs", 10)),
        seed=int(targs.get("seed", 0)),
    )

    tcfg = TrainerConfig(
        learning_rate=float(targs.get("learning_rate", 1e-3)),
        adam_beta1=float(targs.get("adam_beta1", 0.9)),
        adam_beta2=float(targs.get("adam_beta2", 0.999)),
        adam_epsilon=float(targs.get("adam_epsilon", 1e-6)),
        weight_decay=float(targs.get("weight_decay", 0.0)),
        max_steps=int(targs.get("max_steps", 10000)),
        warmup_steps=int(targs.get("warmup_steps", 0)),
        warmup_ratio=float(targs.get("warmup_ratio", 0.0)),
        lr_scheduler=str(targs.get("lr_scheduler_type", "cosine")),
        gradient_clip_norm=targs.get("max_grad_norm"),
        logging_steps=int(targs.get("logging_steps", 50)),
        eval_steps=int(targs.get("eval_steps", 0)),
        save_steps=int(targs.get("save_steps", 0)),
        output_dir=str(targs.get("output_dir", "checkpoints")),
        seed=int(targs.get("seed", 0)),
        data_parallel=int(targs.get("data_parallel", 1)),
        tensor_parallel=int(targs.get("tensor_parallel", 1)),
        pipeline_parallel=int(targs.get("pipeline_parallel", 1)),
        pp_microbatches=int(targs.get("pp_microbatches", 4)),
        gradient_accumulation_steps=int(
            targs.get("gradient_accumulation_steps", 1)),
        kahan_sum=bool(targs.get("kahan_sum", False)),
        state_dtype=targs.get("state_dtype"),
    )

    # tracker integration (reference: ClearML/wandb/codecarbon in its
    # drivers); YAML: report_to: ["jsonl", "wandb", "clearml", "energy"]
    callbacks = []
    for tracker in targs.get("report_to", ["jsonl"]):
        try:
            from flasht5_tpu.train import callbacks as cb
            if tracker == "jsonl":
                callbacks.append(cb.JSONLCallback(
                    f"{tcfg.output_dir}/tracker_log.jsonl"))
            elif tracker == "wandb":
                callbacks.append(cb.WandbCallback(
                    project=str(targs.get("project", "flasht5_tpu"))))
            elif tracker == "clearml":
                callbacks.append(cb.ClearMLCallback(
                    project=str(targs.get("project", "flasht5_tpu")),
                    task_name=str(targs.get("run_name", "pretrain"))))
            elif tracker == "energy":
                callbacks.append(cb.EnergyCallback(
                    out_path=f"{tcfg.output_dir}/energy.json"))
        except ImportError as e:
            print(f"tracker {tracker!r} unavailable: {e}")

    trainer = Trainer(model_cfg, tcfg, callbacks=callbacks)
    resume = Trainer.latest_checkpoint(tcfg.output_dir)
    if resume:
        print(f"resuming from {resume}")
        trainer.restore_checkpoint(resume)

    train_iter = batch_iterator(train_set, collator, batch_size,
                                seed=tcfg.seed)
    eval_iter = None
    if eval_set is not None:
        def eval_iter_fn():
            return batch_iterator(eval_set, collator, batch_size,
                                  seed=tcfg.seed + 1, epochs=1)
        eval_iter = eval_iter_fn()

    result = trainer.train(train_iter, eval_iter,
                           log_fn=lambda e: print(e, flush=True))
    trainer.save_checkpoint(trainer.step_num)
    print("done:", result["final_step"], "steps")


if __name__ == "__main__":
    main(sys.argv[1])
