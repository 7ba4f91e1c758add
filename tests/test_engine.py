"""Continuous-batching engine: results must match single-sequence KV-cached
greedy generation for every request, across mixed lengths and queue > slots."""

import jax
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import generate
from flasht5_tpu.inference.engine import EngineConfig, InferenceEngine, Request
from flasht5_tpu.models import t5


def tiny_config():
    return FlashT5Config(vocab_size=256, d_model=64, d_kv=16, num_heads=4,
                         d_ff=128, num_layers=2, dropout_rate=0.0,
                         attention_scale=1.0, dtype="float32", pad_token_id=0)


def test_engine_matches_generate():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    lengths = [5, 9, 14, 7, 11, 6]
    reqs = [Request(uid=i, input_ids=rng.integers(2, 256, size=(L,)).astype(np.int32),
                    max_new_tokens=10)
            for i, L in enumerate(lengths)]

    engine = InferenceEngine(config, params,
                             EngineConfig(max_slots=3, max_decode_len=12,
                                          max_encode_len=16,
                                          encode_buckets=(16,)))
    done = engine.run(reqs)

    for req in done:
        assert req.result is not None
        assert req.result[-1] == config.eos_token_id
        # single-sequence reference with the same encoder padding (bucket 16)
        padded = np.zeros((1, 16), np.int32)
        padded[0, :len(req.input_ids)] = req.input_ids
        ref = np.asarray(generate(config, params, jax.numpy.asarray(padded),
                                  max_length=10))[0]
        ref_toks = ref[1:]  # strip start token
        ref_toks = ref_toks[:np.argmax(ref_toks == config.eos_token_id) + 1]
        n = min(len(ref_toks), len(req.result))
        np.testing.assert_array_equal(req.result[:n], ref_toks[:n])


def test_engine_respects_budget():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    reqs = [Request(uid=0, input_ids=np.arange(2, 10, dtype=np.int32),
                    max_new_tokens=3)]
    engine = InferenceEngine(config, params,
                             EngineConfig(max_slots=2, max_decode_len=16,
                                          max_encode_len=16,
                                          encode_buckets=(16,)))
    done = engine.run(reqs)
    assert len(done[0].result) <= 4  # 3 new tokens + forced EOS


def test_engine_int8_kv_cache():
    """INT8 KV caches: engine must still produce EOS-terminated results and
    track the fp-cache engine closely (greedy tokens identical on an
    easy-margin model; here just require well-formed output + close logits
    via a one-step probe)."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(2)
    reqs_fp = [Request(uid=i, input_ids=rng.integers(2, 256, size=(8,)).astype(np.int32),
                       max_new_tokens=6) for i in range(3)]
    reqs_q = [Request(uid=r.uid, input_ids=r.input_ids.copy(),
                      max_new_tokens=6) for r in reqs_fp]

    ecfg = dict(max_slots=3, max_decode_len=8, max_encode_len=16,
                encode_buckets=(16,))
    done_fp = InferenceEngine(config, params, EngineConfig(**ecfg)).run(reqs_fp)
    done_q = InferenceEngine(config, params,
                             EngineConfig(kv_dtype="int8", **ecfg)).run(reqs_q)
    for a, b in zip(done_fp, done_q):
        assert b.result is not None
        assert b.result[-1] == config.eos_token_id
        # int8 KV rounding can flip ties late in the sequence; require the
        # first tokens (largest margins) to agree
        n = min(3, len(a.result), len(b.result))
        np.testing.assert_array_equal(a.result[:n], b.result[:n])


def test_engine_int8_kv_drift_bound_32_steps():
    """Long-horizon KV-quantization drift: teacher-forced (both engines fed
    the fp engine's tokens) logit error over 32 decode steps must stay small
    — pins INT8-KV quality beyond the first-tokens agreement above."""
    config = tiny_config().replace(relative_attention_max_distance=64)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(9)
    req = lambda: Request(uid=0,
                          input_ids=rng.integers(2, 256, size=(12,)).astype(np.int32),
                          max_new_tokens=40)
    ids = req()
    ecfg = dict(max_slots=1, max_decode_len=40, max_encode_len=16,
                encode_buckets=(16,))
    eng_fp = InferenceEngine(config, params, EngineConfig(**ecfg))
    eng_q = InferenceEngine(config, params,
                            EngineConfig(kv_dtype="int8", **ecfg))
    eng_fp.admit_request(ids, 0)
    eng_q.admit_request(Request(uid=0, input_ids=ids.input_ids.copy(),
                                max_new_tokens=40), 0)

    token = np.zeros((1,), np.int32)  # decoder start token
    mses, rel = [], []
    for _ in range(32):
        nxt_fp, logits_fp = eng_fp.probe_step(token_override=token)
        _, logits_q = eng_q.probe_step(token_override=token)
        mses.append(float(np.mean((logits_fp - logits_q) ** 2)))
        rel.append(float(np.max(np.abs(logits_fp - logits_q))
                         / (np.max(np.abs(logits_fp)) + 1e-9)))
        token = nxt_fp.astype(np.int32)  # teacher-force the fp trajectory
    # drift must stay bounded across the horizon, not just at step 1
    assert max(mses) < 0.05, mses
    assert max(rel) < 0.25, rel
    # and must not grow without bound: late-window error comparable to early
    assert np.mean(mses[16:]) < 4 * max(np.mean(mses[:8]), 1e-4), mses


def test_engine_midstream_arrivals():
    """Admission under load: requests arriving while the engine is decoding
    must be admitted mid-stream, produce the same tokens as an all-upfront
    run, and carry consistent timing stamps."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(3)
    seqs = [rng.integers(2, 256, size=(L,)).astype(np.int32)
            for L in (6, 9, 12, 7)]
    mk = lambda arrivals: [
        Request(uid=i, input_ids=s.copy(), max_new_tokens=8,
                arrival_s=arrivals[i])
        for i, s in enumerate(seqs)]
    ecfg = EngineConfig(max_slots=2, max_decode_len=10, max_encode_len=16,
                        encode_buckets=(16,), steps_per_sync=2)
    engine = InferenceEngine(config, params, ecfg)
    upfront = engine.run(mk([0.0] * 4))
    staggered = engine.run(mk([0.0, 0.0, 0.15, 0.3]))
    for a, b in zip(upfront, staggered):
        np.testing.assert_array_equal(a.result, b.result)
    for r in staggered:
        assert r.admitted_at is not None and r.admitted_at >= r.arrival_s
        assert r.first_token_at is not None
        assert r.first_token_at >= r.admitted_at
        assert r.finished_at >= r.first_token_at


def test_engine_decode_kernel_parity():
    """The fused Pallas decode kernel path must produce the same tokens as
    the jnp einsum path (bf16 cache and int8 cache)."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(5)
    mk = lambda: [Request(uid=i, input_ids=rng_i, max_new_tokens=6)
                  for i, rng_i in enumerate(
                      [np.random.default_rng(i).integers(2, 256, size=(8,)).astype(np.int32)
                       for i in range(3)])]
    ecfg = dict(max_slots=3, max_decode_len=8, max_encode_len=16,
                encode_buckets=(16,))
    for kv in ("native", "int8"):
        base = InferenceEngine(config, params,
                               EngineConfig(kv_dtype=kv, **ecfg)).run(mk())
        fused = InferenceEngine(config, params,
                                EngineConfig(kv_dtype=kv, use_decode_kernel=True,
                                             **ecfg)).run(mk())
        for a, b in zip(base, fused):
            np.testing.assert_array_equal(a.result, b.result,
                                          err_msg=f"kv={kv}")
