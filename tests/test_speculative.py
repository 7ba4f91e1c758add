"""Speculative decoding: token-exact equality with greedy at any acceptance
rate, window-step parity, and multi-token progress under good drafts.

(The reference has no speculative path — greedy only,
modeling_flash_t5.py:648-690; exactness vs our pinned greedy `generate` is
the spec.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import (decode_step, decode_window_step, generate,
                                   init_decode_state, speculative_generate)
from flasht5_tpu.models import t5


def tiny_config(**kw):
    base = dict(vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                num_layers=2, dropout_rate=0.0, attention_scale=1.0,
                dtype="float32", pad_token_id=0, max_sequence_length=64)
    base.update(kw)
    return FlashT5Config(**base)


@pytest.mark.parametrize("pe", ["t5", "ALiBi", "RoPE", "FIRE"])
def test_window_step_matches_single_steps(pe):
    """Q-token verify window == Q sequential single-token steps."""
    config = tiny_config(position_encoding_type=pe)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    b, n_enc, q = 2, 10, 5
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, n_enc), 2, 64)
    toks = jax.random.randint(jax.random.PRNGKey(2), (b, q), 2, 64)
    enc = t5.encode(config, params, ids)

    state = init_decode_state(config, params, enc, q)
    win_logits, win_state = decode_window_step(config, params, state, toks)

    state2 = init_decode_state(config, params, enc, q)
    singles = []
    for i in range(q):
        lg, state2 = decode_step(config, params, state2, toks[:, i])
        singles.append(lg)
    singles = jnp.stack(singles, axis=1)

    np.testing.assert_allclose(np.asarray(win_logits), np.asarray(singles),
                               atol=2e-4, rtol=1e-3, err_msg=pe)
    assert int(win_state.t) == int(state2.t) == q
    for lw, ls in zip(win_state.layers, state2.layers):
        np.testing.assert_allclose(np.asarray(lw.self_k),
                                   np.asarray(ls.self_k), atol=1e-5)


@pytest.mark.parametrize("pe", ["t5", "RoPE"])
@pytest.mark.parametrize("window", [2, 4, 7])
def test_speculative_exact_vs_greedy(pe, window):
    config = tiny_config(position_encoding_type=pe)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(3), (3, 12), 2, 64)
    greedy = generate(config, params, ids, max_length=10)
    spec = speculative_generate(config, params, ids, max_length=10,
                                window=window)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(spec))


def test_speculative_exact_with_adversarial_drafts():
    """Garbage drafts must not change the output, only the speed."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(1), config)
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 10), 2, 64)
    greedy = generate(config, params, ids, max_length=8)
    # a draft source full of one repeated token: lookup always matches and
    # always proposes wrong continuations
    bad_src = jnp.full((2, 16), 7, jnp.int32)
    spec = speculative_generate(config, params, ids, max_length=8,
                                window=5, draft_source=bad_src)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(spec))


def test_speculative_oracle_drafts_make_progress():
    """With the greedy output itself as the draft source, acceptance is ~1
    and the number of model passes collapses well below the token count."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(2), config)
    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 10), 2, 64)
    max_length, window = 16, 5

    greedy = generate(config, params, ids, max_length=max_length)
    spec, stats = speculative_generate(
        config, params, ids, max_length=max_length, window=window,
        draft_source=greedy, return_stats=True)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(spec))
    windows = int(stats["windows"])
    generated = int(stats["generated"])
    assert generated >= 1
    # oracle drafts: after the first (draft-less bigram) window, every
    # window should emit multiple tokens
    assert windows < generated, (windows, generated)


def test_speculative_output_contract():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(4), config)
    ids = jax.random.randint(jax.random.PRNGKey(9), (2, 8), 2, 64)
    out = np.asarray(speculative_generate(config, params, ids, max_length=6,
                                          window=3))
    assert out.shape == (2, 7)
    assert np.all(out[:, 0] == 0)
    for row in out:
        eos_pos = np.argmax(row == config.eos_token_id)
        assert row[eos_pos] == config.eos_token_id
        assert np.all(row[eos_pos + 1:] == 0)
