"""Task-head tests (surface pinned by reference custom_heads_flash_t5.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import heads


def tiny_config():
    return FlashT5Config(vocab_size=128, d_model=32, d_kv=8, num_heads=4,
                         d_ff=64, num_layers=1, dropout_rate=0.0,
                         attention_scale=1.0, eos_token_id=1)


def test_token_classification():
    config = tiny_config()
    params = heads.init_token_classification_params(jax.random.PRNGKey(0), config, 5)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 10), 0, 5)
    out = heads.token_classification_forward(config, params, ids, labels=labels)
    assert out["logits"].shape == (2, 10, 5)
    assert np.isfinite(float(out["loss"]))


@pytest.mark.parametrize("problem", ["regression", "single_label_classification",
                                     "multi_label_classification"])
def test_sequence_classification(problem):
    config = tiny_config()
    nl = 1 if problem == "regression" else 3
    params = heads.init_sequence_classification_params(jax.random.PRNGKey(0), config, nl)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 2, 128)
    ids = ids.at[:, -1].set(1)  # eos
    if problem == "regression":
        labels = jax.random.normal(jax.random.PRNGKey(2), (2, 1))
    elif problem == "single_label_classification":
        labels = jax.random.randint(jax.random.PRNGKey(2), (2,), 0, nl)
    else:
        labels = (jax.random.uniform(jax.random.PRNGKey(2), (2, nl)) > 0.5).astype(jnp.float32)
    out = heads.sequence_classification_forward(
        config, params, ids, labels=labels, problem_type=problem, num_labels=nl)
    assert out["logits"].shape == (2, nl)
    assert np.isfinite(float(out["loss"]))


def test_sequence_classification_pools_last_eos():
    config = tiny_config()
    params = heads.init_sequence_classification_params(jax.random.PRNGKey(0), config, 2)
    base = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 2, 128)
    with_eos_mid = base.at[0, 4].set(1).at[0, 7].set(1)
    out1 = heads.sequence_classification_forward(config, params, with_eos_mid)
    # changing a token AFTER the pooled (last) eos shouldn't matter for
    # pooling index selection, but tokens before do flow through attention;
    # just verify determinism + shape here
    out2 = heads.sequence_classification_forward(config, params, with_eos_mid)
    np.testing.assert_allclose(np.asarray(out1["logits"]), np.asarray(out2["logits"]))


def test_question_answering():
    config = tiny_config()
    params = heads.init_question_answering_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(1), (3, 16), 0, 128)
    start = jnp.array([0, 5, 200])   # 200 out of range -> ignored
    end = jnp.array([3, 9, 300])
    out = heads.question_answering_forward(config, params, ids,
                                           start_positions=start,
                                           end_positions=end)
    assert out["start_logits"].shape == (3, 16)
    assert out["end_logits"].shape == (3, 16)
    assert np.isfinite(float(out["loss"]))
