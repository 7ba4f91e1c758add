"""Per-corpus pretokenization for the French FAT5 pretraining mix.

Reproduces the corpus-specific handling of the reference's five scripts
(examples/fat5-fr/pretokenization/pretokenize_dataset_{culturax,wiki,news,
justice,thestack}.py) behind one registry:

- culturax: `uonlp/CulturaX` fr; last 50k examples held out as valid
  (reference: `train[:-50000]` / `train[-50000:]`)
- wiki:     `wikimedia/wikipedia` 20231101.fr, train only
- news:     `eckendoerffer/news_fr`, train/validation/test splits
- justice:  `eckendoerffer/justice_fr`, text in the `output` column,
  filtered to len > 10 chars (reference filter)
- thestack: `bigcode/the-stack-dedup` from disk, `raw_content` column,
  first 25M examples (reference `.take(25000000)`)

Each corpus is tokenized without padding/truncation and saved with a
per-example `length` column — the UL2 collator's packing input.

    python pretokenize_fr_corpora.py <tokenizer_dir> <corpus> [--out output]
"""

import argparse

CORPORA = {
    "culturax": dict(dataset="uonlp/CulturaX", config="fr",
                     text_column="text",
                     splits={"train": "train[:-50000]",
                             "valid": "train[-50000:]"}),
    "wiki": dict(dataset="wikimedia/wikipedia", config="20231101.fr",
                 text_column="text", splits={"train": "train"}),
    "news": dict(dataset="eckendoerffer/news_fr", config=None,
                 text_column="text",
                 splits={"train": "train", "valid": "validation",
                         "test": "test"}),
    "justice": dict(dataset="eckendoerffer/justice_fr", config=None,
                    text_column="output", splits={"train": "train"},
                    min_chars=10),
    "thestack": dict(dataset="bigcode/the-stack-dedup", config=None,
                     text_column="raw_content", splits={"train": "train"},
                     from_disk=True, take=25_000_000),
}


def pretokenize(tokenizer_dir: str, corpus: str, out_root: str,
                num_proc: int = 16):
    import datasets
    from transformers import AutoTokenizer

    spec = CORPORA[corpus]
    tokenizer = AutoTokenizer.from_pretrained(tokenizer_dir)
    col = spec["text_column"]

    def tokenize(examples):
        out = tokenizer(examples[col], add_special_tokens=True)
        out["length"] = [len(x) for x in out["input_ids"]]
        return out

    for name, split in spec["splits"].items():
        if spec.get("from_disk"):
            ds = datasets.load_from_disk(spec["dataset"])
            ds = ds.select_columns([col])
            if spec.get("take"):
                ds = ds.take(spec["take"])
        else:
            ds = datasets.load_dataset(spec["dataset"], spec["config"],
                                       split=split)
        if spec.get("min_chars"):
            ds = ds.filter(lambda x: len(x[col]) > spec["min_chars"])
        tokenized = ds.map(tokenize, batched=True, num_proc=num_proc,
                           remove_columns=ds.column_names)
        out_dir = f"{out_root}/{corpus}_tokenized/{name}"
        tokenized.save_to_disk(out_dir)
        print(f"{corpus}/{name}: saved {len(tokenized)} examples to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("tokenizer_dir")
    ap.add_argument("corpus", choices=sorted(CORPORA))
    ap.add_argument("--out", default="output")
    ap.add_argument("--num-proc", type=int, default=16)
    args = ap.parse_args()
    pretokenize(args.tokenizer_dir, args.corpus, args.out, args.num_proc)
