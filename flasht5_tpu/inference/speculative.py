"""Draft-free speculative decoding: prompt-lookup drafts + windowed verify.

New surface beyond the reference (greedy-only, modeling_flash_t5.py:648-690).
Single-token KV-cached decode is HBM-bandwidth-bound on TPU — every step
streams the full weight set for one MXU row of work. This module recovers
that idle compute: a cheap n-gram "prompt lookup" proposes the next
``window-1`` tokens by copying from the encoder input (T5's headline tasks —
summarization, translation — copy long spans verbatim), and ONE
`decode_window_step` scores all of them against the same weight stream. The
model's own argmax then accepts the longest matching prefix plus one bonus
token, so the output is **token-exact equal to greedy decoding** at any
acceptance rate; drafts only change how many tokens each weight pass yields.
(Exactness is per the model's argmax chain: the Q-row verify matmul and the
1-row greedy matmul can reduce in different orders, so at bf16 a genuinely
near-tied argmax may flip — quantified per run as `agreement` in
docs/spec_decode.json; f32 rows there and the CPU parity tests are exact.)

Design notes (TPU-first):
- the whole loop is one `lax.while_loop`; drafting is vectorized bigram
  matching over the source (no host round-trips, no dynamic shapes);
- the verify window rides the cache machinery of `decode_window_step`
  (causal-in-window masks, per-position RPE/RoPE) — cache rows past the
  accepted prefix are simply re-written by the next window, so "rollback"
  is a scalar update of `state.t`;
- batched rows advance together at the batch-min acceptance (keeps the
  cache pointer scalar and the program SPMD-friendly; exactness is
  preserved because every emitted token is conditioned only on accepted
  prefixes). Per-request acceptance rates belong to the serving engines.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.kv_cache import (decode_window_step,
                                            init_decode_state)
from flasht5_tpu.models import t5


def _lookup_draft(src_pad: jnp.ndarray, prev_src: jnp.ndarray,
                  a: jnp.ndarray, b_tok: jnp.ndarray, n_draft: int,
                  s_len: int) -> jnp.ndarray:
    """Propose ``n_draft`` tokens: find the LAST position j in the source
    where (src[j-1], src[j]) == (a, b) and copy src[j+1 : j+1+n_draft].

    src_pad: (B, S + n_draft) zero-padded source; prev_src: (B, S) source
    shifted right with -1 at position 0. Rows with no match draft zeros.
    """
    src = src_pad[:, :s_len]
    match = (src == b_tok[:, None]) & (prev_src == a[:, None])   # (B, S)
    j_arange = jnp.arange(s_len, dtype=jnp.int32)[None, :]
    j_star = jnp.max(jnp.where(match, j_arange, -1), axis=-1)    # (B,)
    found = j_star >= 0
    idx = j_star[:, None] + 1 + jnp.arange(n_draft, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, src_pad.shape[1] - 1)
    draft = jnp.take_along_axis(src_pad, idx, axis=1)
    return jnp.where(found[:, None], draft, 0)


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_length", "window", "return_stats"))
def speculative_generate(
    config: FlashT5Config,
    params: Dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    *,
    max_length: int = 32,
    window: int = 8,
    draft_source: Optional[jnp.ndarray] = None,
    return_stats: bool = False,
):
    """Greedy generation via speculative verify windows.

    Token-exact equal to ``generate(..., temperature=0)`` (pinned by
    tests/test_speculative.py); faster whenever the output copies spans of
    ``draft_source`` (default: the encoder input). ``window`` is the verify
    width: 1 current token + ``window-1`` drafted tokens per model pass.

    Returns tokens (B, max_length+1); with ``return_stats=True`` also a dict
    with ``windows`` (model passes) and ``generated`` (tokens decoded before
    the stop condition) for acceptance-rate telemetry.
    """
    if window < 2:
        raise ValueError("window must be >= 2 (1 input + >=1 draft)")
    b = input_ids.shape[0]
    eos = config.eos_token_id
    l1 = max_length + 1
    n_draft = window - 1

    src = (input_ids if draft_source is None else draft_source).astype(
        jnp.int32)
    s_len = src.shape[1]
    src_pad = jnp.pad(src, ((0, 0), (0, n_draft)))
    prev_src = jnp.pad(src[:, :-1], ((0, 0), (1, 0)), constant_values=-1)

    enc = t5.encode(config, params, input_ids, attention_mask)
    # window slack: the last verify window may overhang max_length
    state = init_decode_state(config, params, enc, max_length + window,
                              encoder_mask=attention_mask)
    tokens0 = jnp.zeros((b, l1), jnp.int32)
    pos = jnp.arange(l1, dtype=jnp.int32)[None, :]

    def cond(carry):
        tokens, state, done, windows = carry
        return (state.t < max_length) & ~jnp.all(done)

    def body(carry):
        tokens, state, done, windows = carry
        t = state.t
        b_tok = jax.lax.dynamic_index_in_dim(tokens, t, axis=1,
                                             keepdims=False)
        a = jnp.where(
            t >= 1,
            jax.lax.dynamic_index_in_dim(tokens, jnp.maximum(t - 1, 0),
                                         axis=1, keepdims=False),
            -2)  # -2 never matches prev_src -> no draft on the first window
        draft = _lookup_draft(src_pad, prev_src, a, b_tok, n_draft, s_len)
        w_in = jnp.concatenate([b_tok[:, None], draft], axis=1)   # (B, Q)

        logits, new_state = decode_window_step(config, params, state, w_in)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)         # (B, Q)

        ok = jnp.cumprod((draft == g[:, :-1]).astype(jnp.int32), axis=1)
        n_acc = jnp.sum(ok, axis=1)                               # (B,)
        advance = jnp.where(done, window, n_acc + 1)
        m_adv = jnp.minimum(jnp.min(advance), max_length - t)
        m_adv = jnp.maximum(m_adv, 1)

        rel = pos - (t + 1)
        wmask = (rel >= 0) & (rel < m_adv) & ~done[:, None]
        vals = jnp.take_along_axis(
            g, jnp.clip(jnp.broadcast_to(rel, (b, l1)), 0, window - 1),
            axis=1)
        tokens = jnp.where(wmask, vals, tokens)

        new_state = new_state._replace(t=t + m_adv)               # rollback
        gen = (pos >= 1) & (pos <= t + m_adv)
        done = jnp.any((tokens == eos) & gen, axis=-1)
        return tokens, new_state, done, windows + 1

    tokens, state, done, windows = jax.lax.while_loop(
        cond, body, (tokens0, state, jnp.zeros((b,), jnp.bool_),
                     jnp.zeros((), jnp.int32)))

    # force-EOS at the boundary + zero-pad after first EOS (reference
    # contract, modeling_flash_t5.py:683-688 — same as generate())
    tokens = tokens.at[:, -1].set(jnp.where(state.t == max_length, eos,
                                            tokens[:, -1]))
    is_eos = tokens == eos
    first = jnp.argmax(is_eos, axis=-1)
    first = jnp.where(jnp.any(is_eos, axis=-1), first, l1 - 1)
    tokens = jnp.where(pos <= first[:, None], tokens, 0)
    tokens = jnp.where(pos == first[:, None], eos, tokens)
    if return_stats:
        return tokens, {"windows": windows, "generated": state.t}
    return tokens
