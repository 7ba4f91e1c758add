"""Weight import/export against HF T5 and FAT5 checkpoints.

The reference defines the canonical FAT5 naming via regex renames of HF T5
keys (convert_huggingface_t5.py:12-28); this module implements the same
mapping into flasht5_tpu's parameter pytree (models/t5.py docstring), enabling
continued pretraining / serving of (m)T5, FLAN-T5 and FAT5 checkpoints
(reference README.md:193-196).

Layout conventions: torch Linear weights are (out, in) and applied as
x @ W^T; flasht5_tpu stores (in, out) and applies x @ W — so every linear is
transposed on import. Embedding tables are (vocab, d) on both sides.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from flasht5_tpu.config import FlashT5Config

Params = Dict[str, Any]


# FAT5 canonical key -> (pytree path template, transpose?)
# Paths use {stack}/{i} placeholders; block index is captured separately.
_FAT5_PATTERNS = [
    # attention
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.self_attention\.(Wq|Wk|Wv|o)\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "self_attention", m.group(3)), True),
    (re.compile(r"^decoder\.block\.(\d+)\.cross_attention_layer\.cross_attention\.(Wq|Wk|Wv|o)\.weight$"),
     lambda m: ("decoder", int(m.group(1)), "cross_attention_layer", "cross_attention", m.group(2)), True),
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.self_attention\.pe_encoding\.relative_attention_bias\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "self_attention", "pe_encoding", "relative_attention_bias"), False),
    # FIRE pe params (reference: positional_encoding.py:358-372 —
    # mlp.0 = Linear(1, width), mlp.2 = Linear(width, n_heads), plus the
    # scalars c / init_L / L_multiplier)
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.self_attention\.pe_encoding\.mlp\.0\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "self_attention", "pe_encoding", "mlp", "w1"), True),
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.self_attention\.pe_encoding\.mlp\.0\.bias$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "self_attention", "pe_encoding", "mlp", "b1"), False),
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.self_attention\.pe_encoding\.mlp\.2\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "self_attention", "pe_encoding", "mlp", "w2"), True),
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.self_attention\.pe_encoding\.mlp\.2\.bias$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "self_attention", "pe_encoding", "mlp", "b2"), False),
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.self_attention\.pe_encoding\.(c|init_L|L_multiplier)$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "self_attention", "pe_encoding", m.group(3)), False),
    # layer norms
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.self_attention_layer\.layer_norm\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "self_attention_layer", "layer_norm", "weight"), False),
    (re.compile(r"^decoder\.block\.(\d+)\.cross_attention_layer\.layer_norm\.weight$"),
     lambda m: ("decoder", int(m.group(1)), "cross_attention_layer", "layer_norm", "weight"), False),
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.ff_layer\.layer_norm\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "ff_layer", "layer_norm", "weight"), False),
    # mlp
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.ff_layer\.act\.(wi_0|wi_1|wi)\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "ff_layer", "act", m.group(3)), True),
    (re.compile(r"^(encoder|decoder)\.block\.(\d+)\.ff_layer\.wo\.weight$"),
     lambda m: (m.group(1), int(m.group(2)), "ff_layer", "wo"), True),
    # stack-level
    (re.compile(r"^(encoder|decoder)\.final_layer_norm\.weight$"),
     lambda m: (m.group(1), "final_layer_norm", "weight"), False),
    (re.compile(r"^shared\.weight$"), lambda m: ("shared", "embedding"), False),
    (re.compile(r"^lm_head\.weight$"), lambda m: ("lm_head",), True),
]

# HF T5 key -> FAT5 key (the reference's rename table,
# convert_huggingface_t5.py:12-28, inverted into HF->FAT5 direction)
_HF_RENAMES = [
    (r"\.SelfAttention\.q\.", ".self_attention_layer.self_attention.Wq."),
    (r"\.SelfAttention\.k\.", ".self_attention_layer.self_attention.Wk."),
    (r"\.SelfAttention\.v\.", ".self_attention_layer.self_attention.Wv."),
    (r"\.SelfAttention\.o\.", ".self_attention_layer.self_attention.o."),
    (r"\.SelfAttention\.relative_attention_bias\.",
     ".self_attention_layer.self_attention.pe_encoding.relative_attention_bias."),
    (r"\.EncDecAttention\.q\.", ".cross_attention_layer.cross_attention.Wq."),
    (r"\.EncDecAttention\.k\.", ".cross_attention_layer.cross_attention.Wk."),
    (r"\.EncDecAttention\.v\.", ".cross_attention_layer.cross_attention.Wv."),
    (r"\.EncDecAttention\.o\.", ".cross_attention_layer.cross_attention.o."),
    (r"\.layer\.0\.layer_norm\.", ".self_attention_layer.layer_norm."),
    # decoder layer.1 = cross-attn, layer.2 = mlp; encoder layer.1 = mlp
    (r"(decoder\.block\.\d+)\.layer\.1\.layer_norm\.",
     r"\1.cross_attention_layer.layer_norm."),
    (r"(decoder\.block\.\d+)\.layer\.2\.layer_norm\.", r"\1.ff_layer.layer_norm."),
    (r"(encoder\.block\.\d+)\.layer\.1\.layer_norm\.", r"\1.ff_layer.layer_norm."),
    (r"\.DenseReluDense\.wi_0\.", ".ff_layer.act.wi_0."),
    (r"\.DenseReluDense\.wi_1\.", ".ff_layer.act.wi_1."),
    (r"\.DenseReluDense\.wi\.", ".ff_layer.act.wi."),
    (r"\.DenseReluDense\.wo\.", ".ff_layer.wo."),
    (r"\.layer\.0\.", "."), (r"\.layer\.1\.", "."), (r"\.layer\.2\.", "."),
]


def hf_key_to_fat5(key: str) -> str:
    for pat, rep in _HF_RENAMES:
        key = re.sub(pat, rep, key)
    return key


def _insert(tree: Params, path, value):
    """Insert value at path, creating dicts and block-lists as needed."""
    node = tree
    for idx, p in enumerate(path[:-1]):
        nxt = path[idx + 1]
        if isinstance(p, int):
            while len(node) <= p:
                node.append({})
            node = node[p]
        else:
            if p in ("encoder", "decoder") and isinstance(nxt, int):
                stack = node.setdefault(p, {})
                node = stack.setdefault("block", [])
            elif isinstance(nxt, int):
                node = node.setdefault(p, [])
            else:
                node = node.setdefault(p, {})
    last = path[-1]
    if isinstance(last, int):
        while len(node) <= last:
            node.append({})
        node[last] = value
    else:
        node[last] = value


def state_dict_to_params(state: Dict[str, np.ndarray],
                         dtype=jnp.float32) -> Params:
    """FAT5-named flat state dict -> flasht5_tpu pytree."""
    params: Params = {}
    unmatched = []
    for key, value in state.items():
        hit = False
        for pat, path_fn, transpose in _FAT5_PATTERNS:
            m = pat.match(key)
            if m:
                arr = np.asarray(value)
                if transpose:
                    arr = arr.T
                _insert(params, path_fn(m), jnp.asarray(arr, dtype))
                hit = True
                break
        if not hit:
            unmatched.append(key)
    if unmatched:
        raise ValueError(f"unrecognized checkpoint keys: {unmatched[:10]}")
    return params


def load_fat5_safetensors(path: str, dtype=jnp.float32) -> Params:
    """Load a FAT5-named safetensors checkpoint (the reference converter's
    output format, convert_huggingface_t5.py:31)."""
    from safetensors.numpy import load_file
    return state_dict_to_params(load_file(path), dtype)


def load_hf_t5_safetensors(path: str, dtype=jnp.float32) -> Params:
    """Load an HF T5/mT5/FLAN-T5 safetensors checkpoint directly."""
    from safetensors.numpy import load_file
    state = load_file(path)
    renamed = {}
    for k, v in state.items():
        if k.endswith("encoder.embed_tokens.weight") or k.endswith("decoder.embed_tokens.weight"):
            continue  # duplicate views of shared.weight
        renamed[hf_key_to_fat5(k)] = v
    if "shared.weight" not in renamed:
        for k, v in state.items():
            if k.endswith("embed_tokens.weight"):
                renamed["shared.weight"] = v
                break
    return state_dict_to_params(renamed, dtype)


def params_to_fat5_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Export a flasht5_tpu pytree to the FAT5 flat naming (torch layout:
    linears transposed back to (out, in)), for interchange with the
    reference implementation."""
    out: Dict[str, np.ndarray] = {}

    def attn(prefix, p, kind):
        for name in ("Wq", "Wk", "Wv", "o"):
            out[f"{prefix}.{kind}.{name}.weight"] = np.asarray(p[name]).T
        pe = p.get("pe_encoding")
        if pe is not None and "relative_attention_bias" in pe:
            out[f"{prefix}.{kind}.pe_encoding.relative_attention_bias.weight"] = (
                np.asarray(pe["relative_attention_bias"]))
        elif pe is not None and "mlp" in pe:  # FIRE
            base = f"{prefix}.{kind}.pe_encoding"
            out[f"{base}.mlp.0.weight"] = np.asarray(pe["mlp"]["w1"]).T
            out[f"{base}.mlp.0.bias"] = np.asarray(pe["mlp"]["b1"])
            out[f"{base}.mlp.2.weight"] = np.asarray(pe["mlp"]["w2"]).T
            out[f"{base}.mlp.2.bias"] = np.asarray(pe["mlp"]["b2"])
            for name in ("c", "init_L", "L_multiplier"):
                out[f"{base}.{name}"] = np.asarray(pe[name])

    for stack in ("encoder", "decoder"):
        if stack not in params:
            continue
        sp = params[stack]
        for i, blk in enumerate(sp["block"]):
            base = f"{stack}.block.{i}"
            attn(f"{base}.self_attention_layer", blk["self_attention_layer"]["self_attention"], "self_attention")
            out[f"{base}.self_attention_layer.layer_norm.weight"] = (
                np.asarray(blk["self_attention_layer"]["layer_norm"]["weight"]))
            if "cross_attention_layer" in blk:
                attn(f"{base}.cross_attention_layer", blk["cross_attention_layer"]["cross_attention"], "cross_attention")
                out[f"{base}.cross_attention_layer.layer_norm.weight"] = (
                    np.asarray(blk["cross_attention_layer"]["layer_norm"]["weight"]))
            ff = blk["ff_layer"]
            for name, arr in ff["act"].items():
                out[f"{base}.ff_layer.act.{name}.weight"] = np.asarray(arr).T
            out[f"{base}.ff_layer.wo.weight"] = np.asarray(ff["wo"]).T
            out[f"{base}.ff_layer.layer_norm.weight"] = np.asarray(ff["layer_norm"]["weight"])
        out[f"{stack}.final_layer_norm.weight"] = np.asarray(sp["final_layer_norm"]["weight"])
    out["shared.weight"] = np.asarray(params["shared"]["embedding"])
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return out


def validate_params(params: Params, config: FlashT5Config) -> None:
    """Shape-check an imported tree against a config; raises on mismatch."""
    d, v = config.d_model, config.vocab_size
    inner = config.inner_dim
    emb = params["shared"]["embedding"]
    if emb.shape != (v, d):
        raise ValueError(f"shared.embedding {emb.shape} != {(v, d)}")
    for stack, n in (("encoder", config.num_layers),
                     ("decoder", config.num_decoder_layers)):
        blocks = params[stack]["block"]
        if len(blocks) != n:
            raise ValueError(f"{stack} has {len(blocks)} blocks, config says {n}")
        wq = blocks[0]["self_attention_layer"]["self_attention"]["Wq"]
        if wq.shape != (d, inner):
            raise ValueError(f"{stack} Wq {wq.shape} != {(d, inner)}")
