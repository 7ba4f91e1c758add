"""KV-cached decode parity vs the no-cache forward/generate paths.

The reference defines only the math the cache must reproduce (no KV cache
exists there — SURVEY.md §3.2); these tests pin step-level logits parity and
full-generation parity for each PE family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import decode_step, generate, init_decode_state
from flasht5_tpu.models import t5


def tiny_config(**kw):
    base = dict(vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
                num_layers=2, dropout_rate=0.0, attention_scale=1.0,
                dtype="float32", pad_token_id=0, max_sequence_length=64)
    base.update(kw)
    return FlashT5Config(**base)


@pytest.mark.parametrize("pe", ["t5", "ALiBi", "RoPE", "FIRE"])
def test_stepwise_logits_match_full_forward(pe):
    config = tiny_config(position_encoding_type=pe)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    b, n_enc, n_dec = 2, 12, 6
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, n_enc), 0, 256)
    dec_in = jax.random.randint(jax.random.PRNGKey(2), (b, n_dec), 0, 256)

    full = t5.forward(config, params, input_ids=ids,
                      decoder_input_ids=dec_in)["logits"]

    enc = t5.encode(config, params, ids)
    state = init_decode_state(config, params, enc, n_dec)
    step_logits = []
    for i in range(n_dec):
        logits, state = decode_step(config, params, state, dec_in[:, i])
        step_logits.append(logits)
    stepped = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-4, rtol=1e-3, err_msg=pe)


@pytest.mark.parametrize("pe", ["t5", "RoPE"])
def test_generate_matches_nocache_greedy(pe):
    config = tiny_config(position_encoding_type=pe)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 10), 2, 256)
    naive = t5.greedy_generate(config, params, ids, max_length=8)
    cached = generate(config, params, ids, max_length=8)
    np.testing.assert_array_equal(np.asarray(naive), np.asarray(cached))


def test_generate_contract():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(4), (3, 8), 2, 256)
    out = np.asarray(generate(config, params, ids, max_length=6))
    assert out.shape == (3, 7)
    assert (out[:, 0] == 0).all()
    for row in out:
        eos_pos = np.where(row == 1)[0]
        assert len(eos_pos) >= 1
        assert (row[eos_pos[0] + 1:] == 0).all()


def test_sampling_modes_run():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 2, 256)
    for kw in ({"temperature": 1.0},
               {"temperature": 0.8, "top_k": 10},
               {"temperature": 1.0, "top_p": 0.9}):
        out = generate(config, params, ids, max_length=5,
                       rng=jax.random.PRNGKey(0), **kw)
        assert out.shape == (2, 6)

    # greedy is deterministic regardless of rng
    g1 = generate(config, params, ids, max_length=5, rng=jax.random.PRNGKey(0))
    g2 = generate(config, params, ids, max_length=5, rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_generate_is_jittable():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 2, 256)
    jitted = jax.jit(lambda p, i: generate(config, p, i, max_length=5))
    out = jitted(params, ids)
    ref = generate(config, params, ids, max_length=5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
