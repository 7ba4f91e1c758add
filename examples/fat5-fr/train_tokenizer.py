"""Train the French FAT5 tokenizer: 32,768-token BPE with a digit-isolating
pre-tokenizer.

Parity with the reference fr recipe (examples/fat5-fr/train_tokenizer.py:24-40):
BPE vocab 32768 (multiple of 64 for MXU-friendly lm_head/vocab tiling), 7 core
specials + 256 `<extra_id_*>` sentinels, a punct-style regex (arXiv:2402.01035)
modified so every digit is its own pre-token (`\\p{N}{1}`), max merged token
length 20, exported as a T5TokenizerFast.

Corpora: the reference streams CulturaX-fr + the-stack-dedup; this driver
takes any pretokenized-or-raw `datasets.load_from_disk` dirs (no egress in
this environment), concatenated.
"""

import argparse

# punct (arXiv:2402.01035v2) with individual digits — matches the reference
# fr recipe (examples/fat5-fr/train_tokenizer.py:31-32).
DIGIT_ISOLATING_PATTERN = (
    r" ?\p{L}+|\p{N}{1}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")


def build_tokenizer():
    from tokenizers import Regex, Tokenizer, models, pre_tokenizers
    tokenizer = Tokenizer(models.BPE(unk_token="<unk>"))
    tokenizer.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(pattern=Regex(DIGIT_ISOLATING_PATTERN),
                             behavior="isolated"),
    ])
    return tokenizer


def main(dataset_paths, out_dir: str, vocab_size: int = 32768,
         text_column: str = "text"):
    import datasets
    from tokenizers import trainers
    from transformers import PreTrainedTokenizerFast

    if vocab_size % 64 != 0:
        print("Performance warning: vocab size should be a multiple of 64 "
              "(MXU lane tiling)!")

    parts = [datasets.load_from_disk(p) for p in dataset_paths]
    ds = parts[0] if len(parts) == 1 else datasets.concatenate_datasets(parts)

    special_tokens = ["<cls>", "<s>", "</s>", "<mask>", "<pad>", "<sep>",
                      "<unk>"]
    special_tokens += [f"<extra_id_{i}>" for i in range(256)]

    tokenizer = build_tokenizer()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=special_tokens,
        max_token_length=20, show_progress=True)

    def batches(batch_size=1000):
        for batch in ds.iter(batch_size=batch_size):
            yield batch[text_column]

    tokenizer.train_from_iterator(batches(), trainer=trainer, length=len(ds))

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tokenizer,
        unk_token="<unk>", pad_token="<pad>", eos_token="</s>",
        sep_token="<sep>", cls_token="<cls>", mask_token="<mask>",
        additional_special_tokens=[f"<extra_id_{i}>" for i in range(256)],
        clean_up_tokenization_spaces=False,
    )
    fast.save_pretrained(out_dir)
    print(f"saved fr tokenizer ({fast.vocab_size} tokens) to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_paths", nargs="+",
                    help="one or more datasets.save_to_disk dirs")
    ap.add_argument("--out-dir", default="tokenizer-flasht5-french")
    ap.add_argument("--vocab-size", type=int, default=32768)
    ap.add_argument("--text-column", default="text")
    args = ap.parse_args()
    main(args.dataset_paths, args.out_dir, args.vocab_size, args.text_column)
