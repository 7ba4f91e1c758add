"""Train a 32,768-token BPE tokenizer for minipile pretraining.

Parity with the reference tokenizer recipe (examples/minipile/
train_tokenizer.py:17-35): BPE vocab 32768, byte-level fallback with a
Llama-style pre-tokenizer regex, 7 core specials + 256 `<extra_id_*>`
sentinels, exported as a T5TokenizerFast-compatible fast tokenizer.
"""

import argparse


def main(dataset_path: str, out_dir: str, vocab_size: int = 32768):
    import datasets
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    ds = datasets.load_from_disk(dataset_path)

    tokenizer = Tokenizer(models.BPE(byte_fallback=True))
    tokenizer.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(
            pattern=r""" ?[^(\s|[.,!?…。，、।۔،])]+""",
            behavior="isolated", invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])

    special_tokens = ["<pad>", "</s>", "<unk>", "[R]", "[S]", "[X]", "<sep>"]
    special_tokens += [f"<extra_id_{i}>" for i in range(256)]

    trainer = trainers.BpeTrainer(vocab_size=vocab_size,
                                  special_tokens=special_tokens)

    def batches(batch_size=1000):
        for start in range(0, len(ds), batch_size):
            yield ds[start:start + batch_size]["text"]

    tokenizer.train_from_iterator(batches(), trainer=trainer, length=len(ds))

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tokenizer,
        unk_token="<unk>", pad_token="<pad>", eos_token="</s>",
        sep_token="<sep>",
        additional_special_tokens=[f"<extra_id_{i}>" for i in range(256)]
        + ["[R]", "[S]", "[X]"],
    )
    fast.save_pretrained(out_dir)
    print(f"saved tokenizer ({fast.vocab_size} tokens) to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_path")
    ap.add_argument("out_dir")
    ap.add_argument("--vocab-size", type=int, default=32768)
    args = ap.parse_args()
    main(args.dataset_path, args.out_dir, args.vocab_size)
