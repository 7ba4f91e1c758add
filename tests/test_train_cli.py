"""End-to-end driver integration: tokenizer training -> pretokenization ->
`train.py`-style YAML run -> checkpoint resume, all on tiny synthetic data
(the reference's L7 pipeline, SURVEY.md §3.1, exercised in-process)."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")

    # --- tiny corpus ---
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, size=rng.integers(30, 80)))
             for _ in range(64)]

    # --- tokenizer (BPE + sentinels, minipile recipe shape) ---
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(byte_fallback=True))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    specials = ["<pad>", "</s>", "<unk>", "[R]", "[S]", "[X]"] + \
        [f"<extra_id_{i}>" for i in range(64)]
    tok.train_from_iterator(texts, trainers.BpeTrainer(
        vocab_size=512, special_tokens=specials))
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", pad_token="<pad>",
        eos_token="</s>",
        additional_special_tokens=[f"<extra_id_{i}>" for i in range(64)]
        + ["[R]", "[S]", "[X]"])
    tok_dir = str(root / "tokenizer")
    fast.save_pretrained(tok_dir)

    # --- pretokenized dataset ---
    import datasets
    ds = datasets.Dataset.from_dict({"text": texts})

    def tokenize(examples):
        out = fast(examples["text"], add_special_tokens=True)
        out["length"] = [len(x) for x in out["input_ids"]]
        return out

    tokenized = ds.map(tokenize, batched=True, remove_columns=["text"])
    data_dir = str(root / "data")
    tokenized.save_to_disk(data_dir)

    # --- run config ---
    cfg = {
        "model_args": {
            "d_model": 32, "d_kv": 8, "d_ff": 64, "num_heads": 4,
            "num_layers": 1, "dropout_rate": 0.0, "attention_scale": 1.0,
            "position_encoding_type": "t5", "attention_type": "ref",
            "use_glu_mlp": True, "z_loss": 1e-4, "dtype": "float32",
            "max_sequence_length": 64,
        },
        "training_args": {
            "tokenizer_name": tok_dir,
            "train_dataset_path": data_dir,
            "learning_rate": 1e-3, "max_steps": 4, "logging_steps": 1,
            "save_steps": 2, "per_device_train_batch_size": 4,
            "output_dir": str(root / "ckpt"),
        },
        "collator_args": {"max_length": 64, "max_labels_length": 32,
                          "min_size_inputs": 5},
    }
    cfg_path = str(root / "run.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return {"cfg_path": cfg_path, "root": root}


def test_train_cli_end_to_end(workspace):
    import train as train_mod
    train_mod.main(workspace["cfg_path"])
    ckpt_dir = str(workspace["root"] / "ckpt")
    assert os.path.isdir(ckpt_dir)
    names = os.listdir(ckpt_dir)
    assert any(n.startswith("step_") for n in names)
    assert "train_log.jsonl" in names


def test_train_cli_resumes(workspace):
    """Second invocation must pick up the latest checkpoint and continue."""
    import io
    from contextlib import redirect_stdout

    import train as train_mod
    buf = io.StringIO()
    with redirect_stdout(buf):
        train_mod.main(workspace["cfg_path"])
    assert "resuming from" in buf.getvalue()
