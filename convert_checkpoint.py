"""Checkpoint conversion CLI.

Parity with the reference's standalone converter (convert_huggingface_t5.py):
    python convert_checkpoint.py hf_model.safetensors out.safetensors
renames HF T5 keys to the FAT5 canonical naming. Additionally supports
exporting a flasht5_tpu Orbax checkpoint back to FAT5 safetensors:
    python convert_checkpoint.py --from-orbax ckpt_dir out.safetensors
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--from-orbax", action="store_true",
                    help="src is an Orbax checkpoint dir (trainer output)")
    args = ap.parse_args()

    from safetensors.numpy import save_file

    if args.from_orbax:
        import orbax.checkpoint as ocp

        from flasht5_tpu.convert import params_to_fat5_state_dict
        restored = ocp.StandardCheckpointer().restore(args.src)
        params = restored["params"] if "params" in restored else restored
        state = params_to_fat5_state_dict(params)
    else:
        from safetensors.numpy import load_file

        from flasht5_tpu.convert.hf_import import hf_key_to_fat5
        raw = load_file(args.src)
        state = {}
        for key, value in raw.items():
            if key.endswith("embed_tokens.weight"):
                continue
            state[hf_key_to_fat5(key)] = np.asarray(value)
    save_file(state, args.dst)
    print(f"wrote {len(state)} tensors to {args.dst}")


if __name__ == "__main__":
    main()
