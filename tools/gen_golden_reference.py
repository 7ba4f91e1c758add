"""Generate golden parity fixtures from the ACTUAL PyTorch reference.

Runs /root/reference's FlashT5ForConditionalGeneration (attention_type="ref",
torch CPU, fp32) on fixed inputs for each positional-encoding family and the
behavioral quirk knobs (attention_scale default vs 1.0, use_masking,
use_full_bias_size, z_loss, label_smoothing, GLU/ReLU MLP), and dumps

  - the model state_dict (fp32 numpy),
  - the inputs,
  - logits / loss / encoder_hidden_states,
  - greedy generate() token streams for selected cases

into tests/golden/ref_<case>.npz, consumed by tests/test_golden_reference.py.

The reference's RoPE path calls flash_attn CUDA rotary kernels
(positional_encoding.py:6); those are shimmed here with a pure-torch
implementation of the documented flash_attn rotary semantics (first
rotary_dim features rotated, non-interleaved = split halves, interleaved =
even/odd pairs) so the reference module's own cos/sin/xPos cache construction
(positional_encoding.py:244-280) still defines the golden numbers.

Usage: python tools/gen_golden_reference.py [--out tests/golden]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

torch.manual_seed(0)

from src.model.configuration_flash_t5 import FlashT5Config as RefConfig  # noqa: E402
from src.model.modeling_flash_t5 import FlashT5ForConditionalGeneration  # noqa: E402
import src.utils.positional_encoding as ref_pe  # noqa: E402


def _apply_rotary_torch(x, cos, sin, interleaved=False):
    """flash_attn rotary semantics in pure torch.

    x: (B, S, H, D); cos/sin: (S_cache, R/2). Rotates the first R features of
    D; the rest pass through. Matches flash_attn.layers.rotary semantics the
    reference imports (positional_encoding.py:6).
    """
    s = x.shape[1]
    cos = cos[:s].to(x.dtype)[None, :, None, :]
    sin = sin[:s].to(x.dtype)[None, :, None, :]
    half = cos.shape[-1]
    r = 2 * half
    rot, rest = x[..., :r], x[..., r:]
    if interleaved:
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = torch.stack([o1, o2], dim=-1).reshape(rot.shape)
    else:
        x1, x2 = rot[..., :half], rot[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = torch.cat([o1, o2], dim=-1)
    return torch.cat([out, rest], dim=-1) if rest.shape[-1] else out


def _shim_rotary():
    def emb_func(x, cos, sin, interleaved=False, inplace=False,
                 seqlen_offsets=0):
        assert seqlen_offsets == 0
        return _apply_rotary_torch(x, cos, sin, interleaved)

    ref_pe.apply_rotary_emb_func = emb_func
    # qkv_/kv_ variants are unused by FlashT5Attention (it always passes
    # q, k, v separately -> the third branch of RotaryPositionalEncoding
    # .forward, positional_encoding.py:315-337)


BASE = dict(
    vocab_size=101,
    d_model=64,
    d_kv=16,
    d_ff=128,
    num_layers=2,
    num_decoder_layers=2,
    num_heads=4,
    relative_attention_num_buckets=8,
    relative_attention_max_distance=20,
    dropout_rate=0.0,
    attention_dropout_rate=0.0,
    max_sequence_length=64,
    decoder_start_token_id=0,
    eos_token_id=1,
    pad_token_id=0,
    tie_word_embeddings=False,
    attention_type="ref",
    use_triton_layernorm=False,
    use_triton_crossentropy=False,
    use_glu_mlp=True,
    use_gelu_act=True,
    z_loss=0.0,
    label_smoothing=0.0,
)

CASES = [
    # (name, overrides, run_generate)
    ("t5_base", dict(z_loss=1e-4), True),
    ("t5_scale1_noglu_relu",
     dict(attention_scale=1.0, use_glu_mlp=False, use_gelu_act=False), False),
    ("t5_smoothing", dict(label_smoothing=0.1), False),
    ("t5_masking", dict(use_masking=True, use_full_bias_size=True), False),
    ("t5_fullbias", dict(use_full_bias_size=True), False),
    ("alibi_sym", dict(position_encoding_type="ALiBi"), False),
    ("alibi_asym_heads6",
     dict(position_encoding_type="ALiBi", alibi_mode="asymetric",
          num_heads=6), False),
    ("rope", dict(position_encoding_type="RoPE"), True),
    ("rope_frac_interleaved_xpos",
     dict(position_encoding_type="RoPE", rotary_emb_fraction=0.5,
          rotary_interleaved=True, rotary_scale_base=32.0), False),
    ("fire", dict(position_encoding_type="FIRE"), False),
]


def make_inputs(rng: np.random.Generator, vocab: int):
    B, M, L = 2, 24, 16
    input_ids = rng.integers(2, vocab, size=(B, M)).astype(np.int64)
    attention_mask = np.ones((B, M), dtype=np.int64)
    attention_mask[1, -6:] = 0
    labels = rng.integers(2, vocab, size=(B, L)).astype(np.int64)
    labels[1, -5:] = -100
    return input_ids, attention_mask, labels


def run_case(name, overrides, gen, out_dir):
    cfg = dict(BASE)
    cfg.update(overrides)
    torch.manual_seed(1234)
    model = FlashT5ForConditionalGeneration(RefConfig(**cfg))
    model.eval()

    rng = np.random.default_rng(42)
    input_ids, attention_mask, labels = make_inputs(rng, cfg["vocab_size"])
    t_ids = torch.from_numpy(input_ids)
    t_mask = torch.from_numpy(attention_mask).bool()
    t_labels = torch.from_numpy(labels)

    with torch.no_grad():
        out = model.forward(input_ids=t_ids, attention_mask=t_mask,
                            labels=t_labels)
    arrays = {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "labels": labels,
        "logits": out.logits.float().numpy(),
        "loss": np.asarray(out.loss.item(), np.float64),
        "encoder_hidden_states":
            out.encoder_hidden_states.float().numpy(),
    }
    if gen:
        with torch.no_grad():
            tokens = model.generate(input_ids=t_ids, attention_mask=t_mask,
                                    max_length=12)
        arrays["generated"] = tokens.numpy()
        arrays["generate_max_length"] = np.asarray(12, np.int64)

    for key, val in model.state_dict().items():
        arrays[f"sd::{key}"] = val.float().numpy()

    # config as a JSON string array (np.save handles str via object=False
    # workaround: store as fixed bytes)
    arrays["config_json"] = np.frombuffer(
        json.dumps(cfg).encode(), dtype=np.uint8)

    path = os.path.join(out_dir, f"ref_{name}.npz")
    np.savez_compressed(path, **arrays)
    n_bytes = os.path.getsize(path)
    print(f"{name}: loss={out.loss.item():.6f} "
          f"logits[0,0,:3]={out.logits[0, 0, :3].tolist()} "
          f"-> {path} ({n_bytes/1024:.0f} KiB)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    _shim_rotary()
    for name, overrides, gen in CASES:
        run_case(name, overrides, gen, args.out)


if __name__ == "__main__":
    main()
