"""French FAT5 pretraining driver over multiple pretokenized corpora.

Parity with the reference driver (examples/fat5-fr/train_fat5.py): concat
several tokenized corpora, fixed_batch_size collator with min_size_inputs=5,
then the standard trainer. Usage:

    python train_fat5_fr.py configs/fr/fat5-fr-small.yaml corpus1 corpus2 ...
"""

import sys

sys.path.insert(0, ".")


def main(config_path, corpus_paths):
    import datasets

    import train as train_mod

    cfg = train_mod.load_run_config(config_path)  # noqa — reuse driver plumbing
    # concatenate corpora then fall through to the generic driver logic
    sets = [datasets.load_from_disk(p) for p in corpus_paths]
    merged = datasets.concatenate_datasets(sets) if len(sets) > 1 else sets[0]
    tmp = "/tmp/fat5_fr_merged"
    merged.save_to_disk(tmp)
    cfg["training_args"]["train_dataset_path"] = tmp
    cfg["collator_args"].setdefault("fixed_batch_size", True)
    cfg["collator_args"].setdefault("min_size_inputs", 5)

    import yaml
    merged_cfg = "/tmp/fat5_fr_config.yaml"
    with open(merged_cfg, "w") as f:
        yaml.safe_dump(cfg, f)
    train_mod.main(merged_cfg)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
