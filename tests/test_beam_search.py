"""Beam search parity: KV-cached lax.while_loop vs an independent numpy
reference that re-runs the full no-cache decoder each step.

The numpy reference below is a literal, loop-based transcription of the
documented algorithm (HF BeamSearchScorer semantics — see
flasht5_tpu/inference/beam_search.py module docstring). The production path
is a vectorized single-`while_loop` program with flattened beams and a
gathered KV cache, so token-exact agreement pins both the algorithm and the
cache/reorder machinery at once. (The reference repo ships greedy only,
modeling_flash_t5.py:648-690; beam search is north-star serving surface.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import beam_generate, generate
from flasht5_tpu.models import t5


def tiny_config(**kw):
    base = dict(vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                num_layers=2, dropout_rate=0.0, attention_scale=1.0,
                dtype="float32", pad_token_id=0, max_sequence_length=64)
    base.update(kw)
    return FlashT5Config(**base)


def _log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def beam_reference(config, params, input_ids, num_beams, max_length,
                   length_penalty=1.0, early_stopping=True,
                   attention_mask=None):
    """Slow numpy beam search over the no-cache forward."""
    b = input_ids.shape[0]
    k = num_beams
    eos = config.eos_token_id
    l1 = max_length + 1
    outs, out_scores = [], []
    for bi in range(b):
        ids = input_ids[bi:bi + 1]
        amask = (None if attention_mask is None
                 else jnp.asarray(attention_mask[bi:bi + 1]))
        beams = [([0], 0.0)]                      # (tokens, sum_logprob)
        hyps = []                                  # (tokens_with_eos_pos, pen)
        done = False
        t = 0
        while t < max_length and not done:
            # score every beam with a full decoder re-run
            cand = []
            for (toks, sc) in beams:
                dec = np.asarray(toks, np.int32)[None, :]
                logits = np.asarray(t5.forward(
                    config, params, input_ids=jnp.asarray(ids),
                    attention_mask=amask,
                    decoder_input_ids=jnp.asarray(dec))["logits"])
                lp = _log_softmax(logits[0, -1].astype(np.float64))
                for tok in range(lp.shape[0]):
                    cand.append((sc + lp[tok], toks, tok))
            cand.sort(key=lambda c: -c[0])
            cand = cand[:2 * k]
            new_beams = []
            for rank, (sc, toks, tok) in enumerate(cand):
                if tok == eos:
                    if rank < k:
                        plen = len(toks)  # start + t generated, EOS excluded
                        hyps.append((toks + [eos],
                                     sc / (plen ** length_penalty)))
                else:
                    new_beams.append((toks + [tok], sc))
                if len(new_beams) == k:
                    break
            beams = new_beams
            t += 1
            if len(hyps) >= k:
                if early_stopping:
                    done = True
                else:
                    worst = min(h[1] for h in sorted(
                        hyps, key=lambda h: -h[1])[:k])
                    # t was already incremented: production's (t+1) == this t
                    best_possible = max(sc for _, sc in beams) / (
                        t ** length_penalty)
                    done = worst >= best_possible
        if not done:  # finalize: bank the open beams
            for toks, sc in beams:
                plen = min(len(toks), max_length)
                hyps.append((toks[:plen] + [eos],
                             sc / (len(toks) ** length_penalty)))
        hyps.sort(key=lambda h: -h[1])
        best_toks, best_sc = hyps[0]
        row = np.zeros((l1,), np.int32)
        row[:len(best_toks)] = best_toks
        outs.append(row)
        out_scores.append(best_sc)
    return np.stack(outs), np.asarray(out_scores)


@pytest.mark.parametrize("pe", ["t5", "RoPE"])
@pytest.mark.parametrize("num_beams,length_penalty,early_stopping", [
    (1, 1.0, True),
    (3, 1.0, True),
    (4, 0.6, True),
    (3, 1.0, False),
])
def test_beam_matches_numpy_reference(pe, num_beams, length_penalty,
                                      early_stopping):
    config = tiny_config(position_encoding_type=pe)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 8), 2, 64)

    got, got_sc = beam_generate(
        config, params, ids, num_beams=num_beams, max_length=6,
        length_penalty=length_penalty, early_stopping=early_stopping)
    want, want_sc = beam_reference(
        config, params, np.asarray(ids), num_beams, 6, length_penalty,
        early_stopping)

    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_allclose(np.asarray(got_sc), want_sc, rtol=1e-4,
                               atol=1e-4)


def test_beam1_matches_greedy():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(1), config)
    ids = jax.random.randint(jax.random.PRNGKey(9), (3, 10), 2, 64)
    greedy = generate(config, params, ids, max_length=8)
    beam, _ = beam_generate(config, params, ids, num_beams=1, max_length=8)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam))


def test_beam_score_not_worse_than_greedy():
    """The returned (length-penalized, lp=1) log-prob must dominate greedy's."""
    config = tiny_config(vocab_size=48)
    params = t5.init_params(jax.random.PRNGKey(2), config)
    ids = jax.random.randint(jax.random.PRNGKey(11), (4, 6), 2, 48)

    def seq_logprob(tokens):
        tokens = np.asarray(tokens)
        scores = []
        for bi in range(tokens.shape[0]):
            toks = tokens[bi]
            eos_pos = int(np.argmax(toks == config.eos_token_id))
            dec = toks[:eos_pos][None, :]
            logits = np.asarray(t5.forward(
                config, params, input_ids=jnp.asarray(ids[bi:bi + 1]),
                decoder_input_ids=jnp.asarray(dec))["logits"])
            lp = _log_softmax(logits[0].astype(np.float64))
            tgt = list(toks[1:eos_pos]) + [config.eos_token_id]
            scores.append(sum(lp[i, t] for i, t in enumerate(tgt))
                          / max(eos_pos, 1))
        return np.asarray(scores)

    greedy = generate(config, params, ids, max_length=6)
    beam, beam_sc = beam_generate(config, params, ids, num_beams=4,
                                  max_length=6)
    g, bq = seq_logprob(greedy), seq_logprob(beam)
    assert np.all(bq >= g - 1e-6), (bq, g)


@pytest.mark.parametrize("use_masking", [False, True])
def test_beam_with_attention_mask_matches_reference(use_masking):
    """Masked-batch parity. Note the reference's use_masking quirk masks
    *query rows* (modeling:266-270), so masked encoder content still leaks
    into valid positions by design — the invariant to pin is cached-beam vs
    no-cache-forward agreement under a mask, not mask invariance."""
    config = tiny_config(use_masking=use_masking,
                         use_full_bias_size=use_masking)
    params = t5.init_params(jax.random.PRNGKey(3), config)
    ids = jax.random.randint(jax.random.PRNGKey(13), (2, 8), 2, 64)
    mask = jnp.ones((2, 8), jnp.int32).at[:, 5:].set(0)
    padded = ids * mask
    got, got_sc = beam_generate(config, params, padded, mask, num_beams=3,
                                max_length=5)
    want, want_sc = beam_reference(config, params, np.asarray(padded), 3, 5,
                                   attention_mask=np.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_allclose(np.asarray(got_sc), want_sc, rtol=1e-4,
                               atol=1e-4)


def test_beam_output_contract():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(4), config)
    ids = jax.random.randint(jax.random.PRNGKey(15), (2, 6), 2, 64)
    out, sc = beam_generate(config, params, ids, num_beams=2, max_length=5)
    out = np.asarray(out)
    assert out.shape == (2, 6)
    assert np.all(out[:, 0] == 0)
    for row in out:
        eos_pos = np.argmax(row == config.eos_token_id)
        assert row[eos_pos] == config.eos_token_id
        assert np.all(row[eos_pos + 1:] == 0)
    assert np.all(np.isfinite(np.asarray(sc)))
