"""Generic corpus pretokenization for French FAT5 pretraining.

Parity with the reference's per-corpus scripts (examples/fat5-fr/
pretokenization/*.py — CulturaX, wikipedia, news, justice, the-stack all
follow the same map-tokenize-save shape); one parametrized script replaces
the five copies.

Usage:
    python pretokenize_corpus.py tokenizer_dir out_dir \
        --dataset uonlp/CulturaX --config fr --text-column text
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tokenizer_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--split", default="train")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--num-proc", type=int, default=16)
    args = ap.parse_args()

    import datasets
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_dir)
    ds = datasets.load_dataset(args.dataset, args.config, split=args.split)

    def tokenize(examples):
        out = tokenizer(examples[args.text_column], add_special_tokens=True)
        out["length"] = [len(x) for x in out["input_ids"]]
        return out

    tokenized = ds.map(tokenize, batched=True, num_proc=args.num_proc,
                       remove_columns=ds.column_names)
    tokenized.save_to_disk(args.out_dir)
    print(f"saved {len(tokenized)} examples to {args.out_dir}")


if __name__ == "__main__":
    main()
