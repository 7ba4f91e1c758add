"""Pretraining/finetuning trainer.

TPU-native replacement for the reference's HF-Trainer-based drivers
(train_flash_t5.py, SURVEY.md §2.6): a jitted sharded train step over a
device mesh, Orbax checkpointing with resume (the reference delegates this to
HF Trainer, SURVEY.md §5 checkpoint/resume), masked-accuracy eval
(train_flash_t5.py:80-92), tokens/sec logging, warmup-cosine or WSD
schedules, AdamWScale with no-decay grouping (optimization.py:10-36).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.optim import adamw_scale, cosine_schedule, no_decay_mask, wsd_schedule
from flasht5_tpu.parallel.mesh import make_mesh
from flasht5_tpu.parallel.sharding import batch_sharding, param_shardings


@dataclasses.dataclass
class TrainerConfig:
    learning_rate: float = 1e-3
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-6
    weight_decay: float = 0.0
    max_steps: int = 1000
    gradient_accumulation_steps: int = 1
    warmup_steps: int = 0
    warmup_ratio: float = 0.0
    lr_scheduler: str = "cosine"          # "cosine" | "wsd" | "constant"
    gradient_clip_norm: Optional[float] = None
    logging_steps: int = 50
    eval_steps: int = 0                   # 0 = no eval
    save_steps: int = 0                   # 0 = no checkpoints
    output_dir: str = "checkpoints"
    seed: int = 0
    data_parallel: int = 1
    tensor_parallel: int = 1
    # GPipe pipeline parallelism over a ("pipe", "data") mesh (pp_step.py);
    # mutually exclusive with tensor_parallel > 1. num_layers must divide it.
    pipeline_parallel: int = 1
    pp_microbatches: int = 4
    kahan_sum: bool = False
    # optimizer state dtype (reference use_state_dtype, adamw_scaled.py:102):
    # "bfloat16" halves optimizer memory at some fidelity cost
    state_dtype: Optional[str] = None


def masked_accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    """Eval metric parity: argmax accuracy over label>0 positions
    (reference: train_flash_t5.py:80-92)."""
    preds = logits.argmax(-1)
    mask = labels > 0
    if mask.sum() == 0:
        return 0.0
    return float((preds[mask] == labels[mask]).mean())


class Trainer:
    def __init__(self, config: FlashT5Config, tcfg: TrainerConfig,
                 params: Optional[Any] = None, callbacks: Optional[list] = None):
        self.config = config
        self.tcfg = tcfg
        # tracker/energy integration point (reference: ClearML + codecarbon in
        # train_flash_t5.py:7-9,96, wandb in train_fat5_minipile.py:8,89);
        # see flasht5_tpu.train.callbacks
        self.callbacks = list(callbacks or [])
        self.pp = tcfg.pipeline_parallel > 1
        if self.pp:
            if tcfg.tensor_parallel > 1:
                raise ValueError("pipeline_parallel excludes tensor_parallel")
            from flasht5_tpu.parallel.pp_step import make_pp_mesh
            self.mesh = make_pp_mesh(tcfg.pipeline_parallel,
                                     tcfg.data_parallel)
        else:
            self.mesh = make_mesh(tcfg.data_parallel, tcfg.tensor_parallel)

        if tcfg.lr_scheduler == "cosine":
            self.schedule = cosine_schedule(tcfg.learning_rate, tcfg.max_steps,
                                            tcfg.warmup_steps, tcfg.warmup_ratio)
        elif tcfg.lr_scheduler == "wsd":
            self.schedule = wsd_schedule(tcfg.learning_rate, tcfg.max_steps,
                                         tcfg.warmup_steps, tcfg.warmup_ratio)
        else:
            self.schedule = tcfg.learning_rate

        pp_stats = None
        if self.pp:
            from flasht5_tpu.parallel.pp_step import pp_stat_batch_dims
            pp_stats = pp_stat_batch_dims
        tx = adamw_scale(self.schedule, b1=tcfg.adam_beta1, b2=tcfg.adam_beta2,
                         eps=tcfg.adam_epsilon, weight_decay=tcfg.weight_decay,
                         kahan_sum=tcfg.kahan_sum, mask=no_decay_mask,
                         state_dtype=(jnp.dtype(tcfg.state_dtype)
                                      if tcfg.state_dtype else None),
                         stat_batch_dims=pp_stats)
        if tcfg.gradient_clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(tcfg.gradient_clip_norm), tx)
        if tcfg.gradient_accumulation_steps > 1:
            # accumulate on-device across micro-batches (the reference gets
            # this from HF Trainer's gradient_accumulation_steps)
            tx = optax.MultiSteps(tx, tcfg.gradient_accumulation_steps)
        self.tx = tx

        if self.pp:
            from flasht5_tpu.parallel.pp_step import (
                make_pp_train_step, pp_param_pspecs, pp_train_state,
                to_pp_params)
            from jax.sharding import NamedSharding
            if params is None:
                self.params, self.opt_state = pp_train_state(
                    config, self.mesh, tx, jax.random.PRNGKey(tcfg.seed))
            else:
                pp_params = to_pp_params(params)
                abstract = jax.eval_shape(lambda: pp_params)
                shardings = jax.tree.map(
                    lambda s: NamedSharding(self.mesh, s),
                    pp_param_pspecs(abstract))
                self.params = jax.device_put(pp_params, shardings)
                self.opt_state = jax.jit(tx.init)(self.params)
            self.step_num = 0
            self._step_fn = make_pp_train_step(
                config, self.mesh, tx, n_microbatches=tcfg.pp_microbatches)
            self._eval_fn = jax.jit(self._make_eval())
            return

        abstract = jax.eval_shape(
            lambda r: t5.init_params(r, config), jax.random.PRNGKey(tcfg.seed))
        self.shardings = param_shardings(self.mesh, abstract)
        if params is None:
            self.params = jax.jit(
                lambda r: t5.init_params(r, config),
                out_shardings=self.shardings)(jax.random.PRNGKey(tcfg.seed))
        else:
            self.params = jax.device_put(params, self.shardings)
        self.opt_state = jax.jit(self.tx.init)(self.params)
        self.step_num = 0
        self._step_fn = jax.jit(self._make_step(), donate_argnums=(0, 1))
        self._eval_fn = jax.jit(self._make_eval())

    def _make_step(self):
        config, tx = self.config, self.tx

        def step(params, opt_state, batch, rng):
            def loss_fn(p):
                out = t5.forward(config, p,
                                 input_ids=batch["input_ids"],
                                 attention_mask=batch.get("attention_mask"),
                                 labels=batch["labels"],
                                 rng=rng, deterministic=False)
                return out["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss,
                                       "grad_norm": optax.global_norm(grads)}

        return step

    def _make_eval(self):
        config, pp = self.config, self.pp

        def eval_step(params, batch):
            if pp:
                from flasht5_tpu.parallel.pp_step import from_pp_params
                params = from_pp_params(params)
            out = t5.forward(config, params,
                             input_ids=batch["input_ids"],
                             attention_mask=batch.get("attention_mask"),
                             labels=batch["labels"])
            return out["loss"], out["logits"]

        return eval_step

    def _device_batch(self, batch):
        bs = batch_sharding(self.mesh)
        if self.pp:
            # pp_step's shard_map in_specs are fixed to these two keys
            batch = {k: batch[k] for k in ("input_ids", "labels")}
        return {k: jax.device_put(jnp.asarray(np.asarray(v)), bs)
                for k, v in batch.items()}

    # -- checkpointing (Orbax) -------------------------------------------

    def save_checkpoint(self, step: int):
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.tcfg.output_dir, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": self.params,
                          "opt_state": self.opt_state,
                          "step": jnp.asarray(step)}, force=True)
        ckptr.wait_until_finished()
        # persist the model config beside the weights (HF-style config.json)
        with open(os.path.join(self.tcfg.output_dir, "config.json"), "w") as f:
            f.write(self.config.to_json())
        return path

    def restore_checkpoint(self, path: str):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        target = {"params": self.params, "opt_state": self.opt_state,
                  "step": jnp.asarray(0)}
        restored = ckptr.restore(os.path.abspath(path), target)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step_num = int(restored["step"])
        return self.step_num

    @staticmethod
    def latest_checkpoint(output_dir: str) -> Optional[str]:
        """Detect prior checkpoints for resume (the reference's glob
        heuristic, examples/minipile/train_fat5_minipile.py:115-116)."""
        if not os.path.isdir(output_dir):
            return None
        steps = []
        for name in os.listdir(output_dir):
            if name.startswith("step_") and name[5:].isdigit():
                steps.append(int(name[5:]))
        if not steps:
            return None
        return os.path.join(output_dir, f"step_{max(steps)}")

    # -- loops ------------------------------------------------------------

    def _jsonl_logger(self):
        """Append metrics to <output_dir>/train_log.jsonl (the structured
        replacement for the reference's HF-Trainer/ClearML/wandb logging,
        SURVEY.md §5 metrics)."""
        import json
        os.makedirs(self.tcfg.output_dir, exist_ok=True)
        path = os.path.join(self.tcfg.output_dir, "train_log.jsonl")

        def log(entry):
            with open(path, "a") as f:
                f.write(json.dumps(entry) + "\n")

        return log

    def _dispatch(self, hook: str, *args) -> None:
        for cb in self.callbacks:
            getattr(cb, hook)(self, *args)

    def train(self, train_iter: Iterable[Dict], eval_iter=None,
              log_fn: Callable[[Dict], None] = None) -> Dict:
        rng = jax.random.PRNGKey(self.tcfg.seed + 1)
        logs = []
        tokens_seen = 0
        t_start = time.perf_counter()
        jsonl = self._jsonl_logger() if self.tcfg.save_steps else None
        self._dispatch("on_train_begin")
        try:
          with self.mesh:
            for batch in train_iter:
                if self.step_num >= self.tcfg.max_steps:
                    break
                db = self._device_batch(batch)
                rng, sub = jax.random.split(rng)
                self.params, self.opt_state, metrics = self._step_fn(
                    self.params, self.opt_state, db, sub)
                self.step_num += 1
                tokens_seen += int(np.prod(batch["input_ids"].shape)) + \
                    int(np.prod(batch["labels"].shape))

                if self.step_num % self.tcfg.logging_steps == 0 or \
                        self.step_num == self.tcfg.max_steps:
                    dt = time.perf_counter() - t_start
                    entry = {"step": self.step_num,
                             "loss": float(metrics["loss"]),
                             "grad_norm": float(metrics["grad_norm"]),
                             "tokens_per_sec": tokens_seen / max(dt, 1e-9)}
                    self._dispatch("on_log", entry)
                    logs.append(entry)
                    if log_fn:
                        log_fn(entry)
                    if jsonl:
                        jsonl(entry)

                if (self.tcfg.eval_steps and eval_iter is not None
                        and self.step_num % self.tcfg.eval_steps == 0):
                    ev = {"step": self.step_num, **self.evaluate(eval_iter)}
                    self._dispatch("on_eval", ev)
                    logs.append(ev)

                if self.tcfg.save_steps and \
                        self.step_num % self.tcfg.save_steps == 0:
                    self._dispatch("on_save",
                                   self.save_checkpoint(self.step_num))
        except KeyboardInterrupt:
            # crash/preemption safety: persist the latest state before
            # propagating (the failure-recovery story the reference lacks —
            # SURVEY.md §5 failure detection)
            if self.tcfg.save_steps:
                self.save_checkpoint(self.step_num)
            raise
        result = {"final_step": self.step_num, "logs": logs}
        self._dispatch("on_train_end", result)
        return result

    def evaluate(self, eval_iter: Iterable[Dict]) -> Dict:
        losses, accs = [], []
        with self.mesh:
            for batch in eval_iter:
                db = self._device_batch(batch)
                loss, logits = self._eval_fn(self.params, db)
                losses.append(float(loss))
                accs.append(masked_accuracy(np.asarray(logits),
                                            np.asarray(batch["labels"])))
        return {"eval_loss": float(np.mean(losses)),
                "eval_masked_accuracy": float(np.mean(accs)),
                "eval_perplexity": float(np.exp(np.mean(losses)))}
