"""Trainer loop: loss goes down, checkpoint save/restore resumes, eval
metrics produced (surface pinned by reference train_flash_t5.py)."""

import os

import jax
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.train import Trainer, TrainerConfig


def tiny_config():
    return FlashT5Config(vocab_size=128, d_model=32, d_kv=8, num_heads=4,
                         d_ff=64, num_layers=1, dropout_rate=0.0,
                         attention_scale=1.0, pad_token_id=0, dtype="float32")


def batches(n, b=4, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {
            "input_ids": rng.integers(2, 128, size=(b, 16)).astype(np.int32),
            "labels": rng.integers(2, 128, size=(b, 8)).astype(np.int32),
        }


def fixed_batch(b=4):
    rng = np.random.default_rng(1)
    batch = {
        "input_ids": rng.integers(2, 128, size=(b, 16)).astype(np.int32),
        "labels": rng.integers(2, 128, size=(b, 8)).astype(np.int32),
    }
    while True:
        yield batch


def test_train_reduces_loss():
    tr = Trainer(tiny_config(), TrainerConfig(max_steps=30, logging_steps=1,
                                              learning_rate=5e-3))
    result = tr.train(fixed_batch())
    losses = [l["loss"] for l in result["logs"] if "loss" in l]
    assert losses[-1] < losses[0]
    assert result["final_step"] == 30


def test_eval_metrics():
    tr = Trainer(tiny_config(), TrainerConfig(max_steps=2))
    metrics = tr.evaluate(batches(2))
    assert set(metrics) == {"eval_loss", "eval_masked_accuracy",
                            "eval_perplexity"}
    assert 0.0 <= metrics["eval_masked_accuracy"] <= 1.0
    assert np.isfinite(metrics["eval_perplexity"])


def test_checkpoint_save_restore(tmp_path):
    cfg = TrainerConfig(max_steps=5, logging_steps=1,
                        output_dir=str(tmp_path / "ckpt"))
    tr = Trainer(tiny_config(), cfg)
    tr.train(batches(5))
    path = tr.save_checkpoint(tr.step_num)
    assert os.path.isdir(path)

    tr2 = Trainer(tiny_config(), cfg)
    step = tr2.restore_checkpoint(path)
    assert step == 5
    a = jax.tree_util.tree_leaves(tr.params)
    b = jax.tree_util.tree_leaves(tr2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    assert Trainer.latest_checkpoint(cfg.output_dir).endswith("step_5")
    assert Trainer.latest_checkpoint(str(tmp_path / "none")) is None


def test_data_parallel_trainer():
    tr = Trainer(tiny_config(), TrainerConfig(max_steps=3, data_parallel=4,
                                              logging_steps=1))
    result = tr.train(batches(3, b=8))
    assert result["final_step"] == 3
    assert np.isfinite(result["logs"][-1]["loss"])


def test_gradient_accumulation():
    """accum=2 over two half-batches must land where accum=1 over the full
    batch lands (same effective update)."""
    import jax.numpy as jnp

    # constant LR: the cosine schedule depends on max_steps, which differs
    # between the two runs by construction
    cfg_a = TrainerConfig(max_steps=2, gradient_accumulation_steps=2,
                          logging_steps=1, learning_rate=1e-2,
                          lr_scheduler="constant")
    cfg_b = TrainerConfig(max_steps=1, logging_steps=1, learning_rate=1e-2,
                          lr_scheduler="constant")
    rng = np.random.default_rng(3)
    full = {"input_ids": rng.integers(2, 128, size=(8, 16)).astype(np.int32),
            "labels": rng.integers(2, 128, size=(8, 8)).astype(np.int32)}
    halves = [{k: v[:4] for k, v in full.items()},
              {k: v[4:] for k, v in full.items()}]

    tr_a = Trainer(tiny_config(), cfg_a)
    tr_a.train(iter(halves))
    tr_b = Trainer(tiny_config(), cfg_b)
    tr_b.train(iter([full]))
    wa = np.asarray(tr_a.params["encoder"]["block"][0]["self_attention_layer"]
                    ["self_attention"]["Wq"])
    wb = np.asarray(tr_b.params["encoder"]["block"][0]["self_attention_layer"]
                    ["self_attention"]["Wq"])
    # averaged half-batch grads match full-batch grads to ~3e-8; the residual
    # param difference is Adam-eps-level (Adam updates are scale-invariant,
    # so grad sum-vs-mean conventions differ only through eps)
    np.testing.assert_allclose(wa, wb, atol=1e-3, rtol=1e-2)
    w0 = np.asarray(t5.init_params(jax.random.PRNGKey(0), tiny_config())
                    ["encoder"]["block"][0]["self_attention_layer"]
                    ["self_attention"]["Wq"])
    # exactly one effective update happened (params moved comparably)
    assert np.abs(wa - w0).max() > 1e-4
    assert np.abs(wa - w0).max() < 10 * np.abs(wb - w0).max()


def test_checkpoint_saves_config(tmp_path):
    import json
    import os

    cfg = TrainerConfig(max_steps=1, output_dir=str(tmp_path / "c"))
    tr = Trainer(tiny_config(), cfg)
    tr.train(batches(1))
    tr.save_checkpoint(1)
    with open(os.path.join(cfg.output_dir, "config.json")) as f:
        loaded = json.load(f)
    restored = FlashT5Config.from_dict(loaded)
    assert restored.d_model == tiny_config().d_model
    assert restored.num_heads == tiny_config().num_heads


def test_trainer_callbacks(tmp_path):
    from flasht5_tpu.train.callbacks import (EnergyCallback, JSONLCallback,
                                             TrainerCallback)

    events = []

    class Recorder(TrainerCallback):
        def on_train_begin(self, trainer):
            events.append("begin")

        def on_log(self, trainer, entry):
            events.append(("log", entry["step"]))

        def on_train_end(self, trainer, result):
            events.append("end")

    jsonl_path = os.path.join(str(tmp_path), "log.jsonl")
    energy_path = os.path.join(str(tmp_path), "energy.json")
    tcfg = TrainerConfig(max_steps=3, logging_steps=1,
                         learning_rate=1e-3, output_dir=str(tmp_path))
    tr = Trainer(tiny_config(), tcfg,
                 callbacks=[Recorder(), JSONLCallback(jsonl_path),
                            EnergyCallback(out_path=energy_path)])
    result = tr.train(batches(3))
    assert events[0] == "begin" and events[-1] == "end"
    assert ("log", 1) in events and ("log", 3) in events
    assert os.path.exists(jsonl_path) and os.path.exists(energy_path)
    assert result["energy"]["energy_kwh"] >= 0
    # EnergyCallback folds running totals into each log entry
    assert all("energy_kwh" in e for e in result["logs"])


def test_pipeline_parallel_trainer(tmp_path):
    """Full encoder-decoder training THROUGH the Trainer over a
    ("pipe","data") mesh (round-1 gap: pipeline was a stacked-block harness
    only)."""
    cfg = tiny_config().replace(num_layers=2, num_decoder_layers=2)
    tcfg = TrainerConfig(max_steps=3, logging_steps=1, learning_rate=1e-3,
                         pipeline_parallel=2, data_parallel=2,
                         pp_microbatches=2, eval_steps=2,
                         output_dir=str(tmp_path))
    tr = Trainer(cfg, tcfg)
    result = tr.train(batches(3), eval_iter=[next(iter(batches(1, seed=9)))])
    losses = [e["loss"] for e in result["logs"] if "loss" in e]
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)
    assert any("eval_loss" in e for e in result["logs"])
    # checkpoint round-trip with pp-structured params
    path = tr.save_checkpoint(3)
    tr2 = Trainer(cfg, tcfg)
    assert tr2.restore_checkpoint(path) == 3
