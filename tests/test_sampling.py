"""Sampling decode: filters, determinism, generate/engine contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.sampling import (apply_top_k, apply_top_p,
                                            sample_token)
from flasht5_tpu.models import t5


def test_top_k_masks_all_but_k():
    logits = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0]])
    out = apply_top_k(logits, 2)
    assert (np.asarray(out[0, 2:]) < -1e20).all()
    np.testing.assert_array_equal(np.asarray(out[0, :2]),
                                  np.asarray(logits[0, :2]))


def test_top_p_keeps_minimal_nucleus():
    # probs ~ [0.6, 0.3, 0.06, ...]; p=0.8 keeps exactly the top-2
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.06, 0.03, 0.01]]))
    out = apply_top_p(logits, 0.8)
    assert np.isfinite(np.asarray(out[0, :2])).all()
    assert (np.asarray(out[0, 2:]) < -1e20).all()
    # p=1 is a no-op
    np.testing.assert_array_equal(np.asarray(apply_top_p(logits, 1.0)),
                                  np.asarray(logits))


def test_sample_token_greedy_and_spread():
    logits = jnp.asarray([[0.0, 10.0, 0.0, 0.0]])
    assert int(sample_token(jax.random.PRNGKey(0), logits,
                            temperature=0.0)[0]) == 1
    # near-uniform logits at high temperature hit several tokens
    flat = jnp.zeros((1, 8))
    draws = {int(sample_token(jax.random.PRNGKey(i), flat, temperature=1.0)[0])
             for i in range(40)}
    assert len(draws) > 3
    # top_k=1 is greedy regardless of temperature
    assert int(sample_token(jax.random.PRNGKey(3), logits, temperature=5.0,
                            top_k=1)[0]) == 1


def _tiny():
    return FlashT5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4,
                         d_ff=64, num_layers=1, dropout_rate=0.0,
                         attention_scale=1.0, pad_token_id=0, dtype="float32")


def test_sample_generate_contract():
    config = _tiny()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 2, 64)
    out = t5.sample_generate(config, params, ids, max_length=8,
                             rng=jax.random.PRNGKey(2), temperature=1.0,
                             top_k=8)
    o = np.asarray(out)
    assert (o[:, 0] == 0).all()
    for row in o:
        eos = np.where(row == config.eos_token_id)[0]
        assert len(eos) >= 1
        assert (row[eos[0] + 1:] == 0).all()
    # temperature 0 == greedy_generate exactly
    s0 = t5.sample_generate(config, params, ids, max_length=8,
                            rng=jax.random.PRNGKey(2), temperature=0.0)
    g = t5.greedy_generate(config, params, ids, max_length=8)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(g))


def test_engine_sampling_mode():
    from flasht5_tpu.inference.engine import (EngineConfig, InferenceEngine,
                                              Request)

    config = _tiny()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    reqs = [Request(uid=i, input_ids=rng.integers(2, 64, size=(12,))
                    .astype(np.int32), max_new_tokens=6) for i in range(3)]
    ecfg = EngineConfig(max_slots=2, max_decode_len=8, max_encode_len=16,
                        encode_buckets=(16,), temperature=1.0, top_k=16,
                        sample_seed=7)
    out = InferenceEngine(config, params, ecfg).run(reqs)
    for r in out:
        assert r.result is not None and r.result[-1] == config.eos_token_id
    # same seed -> reproducible
    out2 = InferenceEngine(config, params, ecfg).run(
        [Request(uid=r.uid, input_ids=r.input_ids, max_new_tokens=6)
         for r in reqs])
    for a, b in zip(out, out2):
        np.testing.assert_array_equal(a.result, b.result)
