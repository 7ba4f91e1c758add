"""Pretokenize minipile to disk (parity with reference
examples/minipile/pretokenize_minipile.py): map tokenize-with-length over the
corpus and save_to_disk for the training driver."""

import argparse


def main(tokenizer_dir: str, out_dir: str, split: str = "train",
         num_proc: int = 8):
    import datasets
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tokenizer_dir)
    ds = datasets.load_dataset("JeanKaddour/minipile", split=split)

    def tokenize(examples):
        out = tokenizer(examples["text"], add_special_tokens=True)
        out["length"] = [len(x) for x in out["input_ids"]]
        return out

    tokenized = ds.map(tokenize, batched=True, num_proc=num_proc,
                       remove_columns=ds.column_names)
    tokenized.save_to_disk(out_dir)
    print(f"saved {len(tokenized)} examples to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("tokenizer_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--split", default="train")
    ap.add_argument("--num-proc", type=int, default=8)
    args = ap.parse_args()
    main(args.tokenizer_dir, args.out_dir, args.split, args.num_proc)
