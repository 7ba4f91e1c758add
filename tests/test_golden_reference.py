"""Golden end-to-end parity against the ACTUAL PyTorch reference.

tests/golden/ref_*.npz are produced by tools/gen_golden_reference.py, which
runs /root/reference's FlashT5ForConditionalGeneration (attention_type="ref",
torch 2.13 CPU, fp32) on fixed inputs and dumps state_dict + logits + loss +
generate() streams. Here the identical weights are imported through
convert/hf_import.state_dict_to_params and the same inputs replayed through
flasht5_tpu — so every quirk (1/sqrt(n_heads) scale at modeling_flash_t5.py
:183, CE reduction at :68 vs :74, use_masking broadcast at :266-270, RoPE
v-rotation at positional_encoding.py:330, xPos cache centering at :271-273)
is pinned against the reference implementation itself, not a re-derivation.
"""

import glob
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.convert.hf_import import state_dict_to_params
from flasht5_tpu.models import t5

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASE_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "ref_*.npz")))
CASE_IDS = [os.path.basename(p)[4:-4] for p in CASE_FILES]

assert CASE_FILES, "golden fixtures missing — run tools/gen_golden_reference.py"


def _load(path):
    z = np.load(path)
    cfg = json.loads(bytes(z["config_json"]).decode())
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")
          # encoder/decoder.embed_tokens are duplicate views of shared.weight
          and not k.endswith("embed_tokens.weight")}
    return cfg, sd, z


def _my_config(cfg: dict, **over) -> FlashT5Config:
    d = dict(cfg)
    d.update(dtype="float32", param_dtype="float32")
    d.update(over)
    return FlashT5Config.from_dict(d)


def _run_forward(config, sd, z):
    params = state_dict_to_params(sd, dtype=jnp.float32)
    return t5.forward(
        config, params,
        input_ids=jnp.asarray(z["input_ids"]),
        attention_mask=jnp.asarray(z["attention_mask"]),
        labels=jnp.asarray(z["labels"]),
        deterministic=True)


@pytest.mark.parametrize("path", CASE_FILES, ids=CASE_IDS)
def test_forward_logits_and_loss_match_reference(path):
    cfg, sd, z = _load(path)
    out = _run_forward(_my_config(cfg), sd, z)
    np.testing.assert_allclose(np.asarray(out["encoder_hidden_states"]),
                               z["encoder_hidden_states"],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["logits"]), z["logits"],
                               atol=1e-4, rtol=1e-4)
    assert abs(float(out["loss"]) - float(z["loss"])) < 2e-5


@pytest.mark.parametrize("path", CASE_FILES, ids=CASE_IDS)
def test_pallas_attention_matches_reference(path):
    """Same goldens through the Pallas flash-attention path (interpret mode
    on CPU): pins the production kernel path, not just the jnp oracle."""
    cfg, sd, z = _load(path)
    out = _run_forward(_my_config(cfg, attention_type="pallas"), sd, z)
    np.testing.assert_allclose(np.asarray(out["logits"]), z["logits"],
                               atol=5e-4, rtol=5e-4)
    assert abs(float(out["loss"]) - float(z["loss"])) < 1e-4


RPE_CASES = [p for p in CASE_FILES
             if json.loads(bytes(np.load(p)["config_json"]).decode())
             .get("position_encoding_type", "t5") == "t5"]


@pytest.mark.parametrize("path", RPE_CASES,
                         ids=[os.path.basename(p)[4:-4] for p in RPE_CASES])
def test_pallas_rpe_matches_reference(path):
    """The linear-memory in-kernel-bias path (reference capability: fa2_rpe,
    README.md:60) against the reference's materialized-bias numbers.
    use_masking (which the reference's fa2_rpe cannot do at all) is handled
    by the masked-query-row uniform-attention select in models/t5.py."""
    cfg, sd, z = _load(path)
    # use_full_bias_size is meaningless here (the bias is never materialized)
    # but config validation keeps the reference's use_masking coupling
    config = _my_config(cfg, attention_type="pallas_rpe",
                        use_full_bias_size=bool(cfg.get("use_masking", False)))
    out = _run_forward(config, sd, z)
    np.testing.assert_allclose(np.asarray(out["logits"]), z["logits"],
                               atol=5e-4, rtol=5e-4)
    assert abs(float(out["loss"]) - float(z["loss"])) < 1e-4


GEN_CASES = [p for p in CASE_FILES if "generated" in np.load(p).files]


@pytest.mark.parametrize("path", GEN_CASES,
                         ids=[os.path.basename(p)[4:-4] for p in GEN_CASES])
def test_greedy_generate_token_stream_matches_reference(path):
    cfg, sd, z = _load(path)
    config = _my_config(cfg)
    params = state_dict_to_params(sd, dtype=jnp.float32)
    mine = np.asarray(t5.greedy_generate(
        config, params,
        jnp.asarray(z["input_ids"]),
        jnp.asarray(z["attention_mask"]),
        max_length=int(z["generate_max_length"])))
    ref = z["generated"]
    width = max(mine.shape[1], ref.shape[1])

    def pad(a):
        return np.pad(a, ((0, 0), (0, width - a.shape[1])))

    np.testing.assert_array_equal(pad(mine), pad(ref))
