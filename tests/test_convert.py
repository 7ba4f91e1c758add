"""Checkpoint interchange tests: FAT5 round-trip + HF key mapping
(mapping pinned by reference convert_huggingface_t5.py:12-28)."""

import jax
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.convert.hf_import import (
    hf_key_to_fat5,
    params_to_fat5_state_dict,
    state_dict_to_params,
    validate_params,
)
from flasht5_tpu.models import t5


def test_hf_key_mapping():
    cases = {
        "encoder.block.0.layer.0.SelfAttention.q.weight":
            "encoder.block.0.self_attention_layer.self_attention.Wq.weight",
        "encoder.block.3.layer.0.SelfAttention.o.weight":
            "encoder.block.3.self_attention_layer.self_attention.o.weight",
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
            "encoder.block.0.self_attention_layer.self_attention.pe_encoding.relative_attention_bias.weight",
        "decoder.block.2.layer.1.EncDecAttention.k.weight":
            "decoder.block.2.cross_attention_layer.cross_attention.Wk.weight",
        "encoder.block.1.layer.1.DenseReluDense.wi_0.weight":
            "encoder.block.1.ff_layer.act.wi_0.weight",
        "decoder.block.5.layer.2.DenseReluDense.wo.weight":
            "decoder.block.5.ff_layer.wo.weight",
        "encoder.block.1.layer.0.layer_norm.weight":
            "encoder.block.1.self_attention_layer.layer_norm.weight",
        "decoder.block.1.layer.1.layer_norm.weight":
            "decoder.block.1.cross_attention_layer.layer_norm.weight",
        "decoder.block.1.layer.2.layer_norm.weight":
            "decoder.block.1.ff_layer.layer_norm.weight",
        "encoder.block.1.layer.1.layer_norm.weight":
            "encoder.block.1.ff_layer.layer_norm.weight",
        "encoder.final_layer_norm.weight": "encoder.final_layer_norm.weight",
        "shared.weight": "shared.weight",
        "lm_head.weight": "lm_head.weight",
    }
    for hf, fat5 in cases.items():
        assert hf_key_to_fat5(hf) == fat5, hf


def test_fat5_roundtrip():
    config = FlashT5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4,
                           d_ff=64, num_layers=2, use_glu_mlp=True)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    state = params_to_fat5_state_dict(params)
    back = state_dict_to_params(state)
    validate_params(back, config)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
    for kp, va in flat_a:
        key = jax.tree_util.keystr(kp)
        assert key in flat_b, key
        np.testing.assert_allclose(np.asarray(va), np.asarray(flat_b[key]),
                                   err_msg=key)


def test_forward_after_roundtrip():
    config = FlashT5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4,
                           d_ff=64, num_layers=2, dropout_rate=0.0,
                           attention_scale=1.0)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    back = state_dict_to_params(params_to_fat5_state_dict(params))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
    lbl = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 64)
    a = t5.forward(config, params, input_ids=ids, labels=lbl)
    b = t5.forward(config, back, input_ids=ids, labels=lbl)
    np.testing.assert_allclose(np.asarray(a["logits"]), np.asarray(b["logits"]),
                               atol=1e-6)
