"""Speculative decoding inside the slot engine: per-request token streams
must be identical to the standard greedy engine at ANY acceptance rate, and
oracle drafts must collapse the window count below the token count.

(No reference counterpart — the reference has no serving layer; the spec
is token-parity with our own pinned engine/generate greedy paths.)
"""

import copy

import jax
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.engine import (EngineConfig, InferenceEngine,
                                          Request)
from flasht5_tpu.models import t5


def tiny_config():
    return FlashT5Config(vocab_size=256, d_model=64, d_kv=16, num_heads=4,
                         d_ff=128, num_layers=2, dropout_rate=0.0,
                         attention_scale=1.0, dtype="float32", pad_token_id=0)


def make_reqs(rng, lengths, max_new=10):
    return [Request(uid=i,
                    input_ids=rng.integers(2, 256, size=(L,)).astype(np.int32),
                    max_new_tokens=max_new)
            for i, L in enumerate(lengths)]


def run_engine(config, params, reqs, **ecfg_kw):
    base = dict(max_slots=3, max_decode_len=16, max_encode_len=16,
                encode_buckets=(16,))
    base.update(ecfg_kw)
    engine = InferenceEngine(config, params, EngineConfig(**base))
    done = engine.run(copy.deepcopy(reqs))
    return engine, {r.uid: r.result for r in done}


@pytest.mark.parametrize("kv_dtype", ["native", "int8"])
@pytest.mark.parametrize("spec_window", [2, 4])
def test_spec_engine_matches_standard(kv_dtype, spec_window):
    """Random inputs (near-zero acceptance): streams must still be exact."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(1)
    reqs = make_reqs(rng, [5, 9, 14, 7, 11, 6])

    _, std = run_engine(config, params, reqs, kv_dtype=kv_dtype)
    _, spc = run_engine(config, params, reqs, kv_dtype=kv_dtype,
                        spec_window=spec_window)
    for uid in std:
        np.testing.assert_array_equal(std[uid], spc[uid], err_msg=str(uid))


def test_spec_engine_oracle_drafts_collapse_windows():
    """draft_source = the request's own greedy output (bigram-seeded with
    the decoder start token): every window should accept fully, so the
    engine's model passes drop well below the emitted token count."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(2), config)
    rng = np.random.default_rng(3)
    reqs = make_reqs(rng, [6, 8, 10], max_new=12)

    _, std = run_engine(config, params, reqs, max_decode_len=20)
    oracle_reqs = copy.deepcopy(reqs)
    for r in oracle_reqs:
        # [start, g0, g1, ...] makes the (0, g0) bigram findable at pos 1
        r.draft_source = np.concatenate(
            [[0], std[r.uid]]).astype(np.int32)
    engine, spc = run_engine(config, params, oracle_reqs, max_decode_len=20,
                             spec_window=4, steps_per_sync=4)
    for uid in std:
        np.testing.assert_array_equal(std[uid], spc[uid], err_msg=str(uid))
    assert engine.spec_stats["tokens"] > 0
    # full acceptance: ~tokens/Q windows (+1 draft-less first window per
    # request); anything close to one window per token means drafts miss
    assert engine.spec_stats["windows"] < engine.spec_stats["tokens"], \
        engine.spec_stats


def test_spec_engine_budget_and_churn():
    """More requests than slots, tiny budgets, adversarial drafts: budget
    caps, EOS truncation, and slot reuse must all match the standard path."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(4), config)
    rng = np.random.default_rng(5)
    reqs = make_reqs(rng, [5, 7, 9, 6, 8, 10, 11, 12], max_new=3)
    for r in reqs[::2]:
        r.draft_source = np.full((12,), 7, np.int32)  # always-wrong drafts

    _, std = run_engine(config, params, reqs, max_slots=2)
    _, spc = run_engine(config, params, reqs, max_slots=2, spec_window=3)
    for uid in std:
        np.testing.assert_array_equal(std[uid], spc[uid], err_msg=str(uid))
        assert len(spc[uid]) <= 4  # 3 new tokens + forced EOS


def test_spec_engine_rejects_sampling():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    with pytest.raises(AssertionError):
        InferenceEngine(config, params,
                        EngineConfig(max_slots=2, max_decode_len=8,
                                     max_encode_len=16, encode_buckets=(16,),
                                     spec_window=4, temperature=0.7))
