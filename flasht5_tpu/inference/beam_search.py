"""KV-cached beam search decoding.

New surface beyond the reference (modeling_flash_t5.py:648-690 ships greedy
only; HF users fall back to transformers' slow no-cache beam search). The
algorithm follows the HF BeamSearchScorer semantics so users migrating T5
summarization / translation workloads get the behavior they expect:

- per step, take the top ``2*num_beams`` candidates of
  ``log_softmax(logits) + beam_score`` over the flattened (beam, vocab) axis;
- a candidate whose token is EOS and whose rank is < ``num_beams`` becomes a
  finished hypothesis with score ``sum_logprobs / prefix_len**length_penalty``
  (``prefix_len`` counts the decoder-start token plus generated tokens,
  excluding the EOS itself — the HF convention);
- the best ``num_beams`` non-EOS candidates (guaranteed to exist among 2K,
  since EOS contributes at most one candidate per beam) continue as the next
  beams;
- with ``early_stopping=True`` a batch row is done once ``num_beams``
  hypotheses are banked; with ``early_stopping=False`` it additionally
  requires the worst banked hypothesis to beat the best still-open beam's
  optimistic score (HF's heuristic);
- at ``max_length``, still-open rows bank their current beams.

TPU-native design: beams are flattened into the batch axis (``B*K`` rides the
MXU through the same single-token `decode_step` the greedy path uses), the
whole loop is one `lax.while_loop` (no host round-trips), candidate selection
is `lax.top_k` on the (B, K*V) score matrix, and the self-attention KV cache
is reorganized per step with a static-shape gather over the beam axis.
Cross-attention caches and the encoder mask are identical across the K beams
of a row, so they are laid out beam-major once at init and never reordered.

Output contract matches `inference.generate` / the reference generate: shape
``(B, max_length+1)``, position 0 is the decoder start token 0, EOS is
forced at the sequence boundary, and everything after the first EOS is
zero-padded.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.kv_cache import (DecodeState, decode_step,
                                            init_decode_state)
from flasht5_tpu.models import t5

_NEG = jnp.float32(-1e9)


class _BeamCarry(NamedTuple):
    tokens: jnp.ndarray       # (B, K, L1) int32 beam buffers
    beam_scores: jnp.ndarray  # (B, K) f32 running sum of log-probs
    hyp_tokens: jnp.ndarray   # (B, K, L1) banked hypotheses
    hyp_scores: jnp.ndarray   # (B, K) length-penalized scores, -inf when empty
    hyp_lens: jnp.ndarray     # (B, K) EOS position within the buffer
    hyp_count: jnp.ndarray    # (B,) int32
    done: jnp.ndarray         # (B,) bool
    state: DecodeState        # batch axis is B*K


def _repeat_beams(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, ...) -> (B*K, ...) with beams contiguous per row (b-major)."""
    return jnp.repeat(x, k, axis=0)


def _bank_hypotheses(carry_fields, add, scores_pen, src_tokens, eos_pos, eos):
    """Vectorized insert of one candidate per batch row into the K-slot bank.

    ``add``: (B,) bool — whether this row banks the candidate.
    ``scores_pen``: (B,) length-penalized score. ``src_tokens``: (B, L1) the
    prefix buffer to store. ``eos_pos``: scalar or (B,) EOS write position.
    Keeps the best K by replacing the current worst when full.
    """
    hyp_tokens, hyp_scores, hyp_lens, hyp_count = carry_fields
    b, k, l1 = hyp_tokens.shape
    full = hyp_count >= k
    worst = jnp.argmin(hyp_scores, axis=-1)                      # (B,)
    slot = jnp.where(full, worst, jnp.minimum(hyp_count, k - 1))
    better = jnp.where(
        full, scores_pen > jnp.take_along_axis(
            hyp_scores, worst[:, None], axis=1)[:, 0], True)
    do = add & better                                            # (B,)

    pos = jnp.arange(l1)[None, :]
    eos_pos = jnp.broadcast_to(jnp.asarray(eos_pos), (b,))
    row = jnp.where(pos < eos_pos[:, None], src_tokens, 0)
    row = jnp.where(pos == eos_pos[:, None], eos, row)

    onehot = jax.nn.one_hot(slot, k, dtype=jnp.bool_)            # (B, K)
    write = onehot & do[:, None]
    hyp_tokens = jnp.where(write[:, :, None], row[:, None, :], hyp_tokens)
    hyp_scores = jnp.where(write, scores_pen[:, None], hyp_scores)
    hyp_lens = jnp.where(write, eos_pos[:, None], hyp_lens)
    hyp_count = hyp_count + (do & ~full).astype(jnp.int32)
    return hyp_tokens, hyp_scores, hyp_lens, hyp_count


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("num_beams", "max_length", "length_penalty",
                          "early_stopping"))
def beam_generate(
    config: FlashT5Config,
    params: Dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    *,
    num_beams: int = 4,
    max_length: int = 32,
    length_penalty: float = 1.0,
    early_stopping: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KV-cached beam search. Returns (tokens (B, max_length+1), scores (B,)).

    ``scores`` are the length-penalized log-prob of the returned sequence
    (the HF ``sequences_scores`` convention).
    """
    b = input_ids.shape[0]
    k = int(num_beams)
    eos = config.eos_token_id
    l1 = max_length + 1

    enc = t5.encode(config, params, input_ids, attention_mask)
    state = init_decode_state(config, params, enc, max_length,
                              encoder_mask=attention_mask)
    # Lift the cache to B*K lanes. Cross K/V are projected once at batch B
    # (avoids K x the projection matmuls) and repeated; self caches are empty
    # so the repeat is just an allocation-shape change.
    state = DecodeState(
        layers=jax.tree_util.tree_map(lambda x: _repeat_beams(x, k),
                                      state.layers),
        encoder_mask=(None if state.encoder_mask is None
                      else _repeat_beams(state.encoder_mask, k)),
        t=state.t,
    )

    carry = _BeamCarry(
        tokens=jnp.zeros((b, k, l1), jnp.int32),
        beam_scores=jnp.concatenate(
            [jnp.zeros((b, 1), jnp.float32),
             jnp.full((b, k - 1), _NEG)], axis=1) if k > 1
        else jnp.zeros((b, 1), jnp.float32),
        hyp_tokens=jnp.zeros((b, k, l1), jnp.int32),
        hyp_scores=jnp.full((b, k), -jnp.inf, jnp.float32),
        hyp_lens=jnp.zeros((b, k), jnp.int32),
        hyp_count=jnp.zeros((b,), jnp.int32),
        done=jnp.zeros((b,), jnp.bool_),
        state=state,
    )

    def cond(c: _BeamCarry):
        return (c.state.t < max_length) & ~jnp.all(c.done)

    def body(c: _BeamCarry):
        t = c.state.t
        cur = jax.lax.dynamic_index_in_dim(c.tokens, t, axis=2,
                                           keepdims=False).reshape(b * k)
        logits, new_state = decode_step(config, params, c.state, cur)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        total = logp.reshape(b, k, v) + c.beam_scores[:, :, None]

        cand_scores, cand_idx = jax.lax.top_k(total.reshape(b, k * v), 2 * k)
        cand_src = cand_idx // v                                  # (B, 2K)
        cand_tok = (cand_idx % v).astype(jnp.int32)
        is_eos = cand_tok == eos
        rank = jnp.arange(2 * k)[None, :]

        # ---- bank EOS candidates with rank < K (HF rank rule) ----
        plen = t + 1  # decoder-start + t generated tokens, EOS excluded
        pen = cand_scores / jnp.float32(plen) ** length_penalty
        hyp_fields = (c.hyp_tokens, c.hyp_scores, c.hyp_lens, c.hyp_count)

        def bank_one(j, fields):
            src_j = cand_src[:, j]                                # (B,)
            prefix = jnp.take_along_axis(
                c.tokens, src_j[:, None, None], axis=1)[:, 0]     # (B, L1)
            return _bank_hypotheses(
                fields, is_eos[:, j] & ~c.done, pen[:, j], prefix,
                plen, eos)

        hyp_fields = jax.lax.fori_loop(0, k, bank_one, hyp_fields)
        hyp_tokens, hyp_scores, hyp_lens, hyp_count = hyp_fields

        # ---- continue with the best K non-EOS candidates ----
        keep_rank = jnp.cumsum((~is_eos).astype(jnp.int32), axis=-1) - 1
        pick = (~is_eos) & (keep_rank < k)
        order = jnp.where(pick, rank, 2 * k + rank)
        sel = jnp.argsort(order, axis=-1)[:, :k]                  # (B, K)
        new_scores = jnp.take_along_axis(cand_scores, sel, axis=1)
        new_src = jnp.take_along_axis(cand_src, sel, axis=1)
        new_tok = jnp.take_along_axis(cand_tok, sel, axis=1)

        # frozen rows: identity reorder, unchanged scores/tokens
        ident = jnp.broadcast_to(jnp.arange(k)[None, :], (b, k))
        new_src = jnp.where(c.done[:, None], ident, new_src)
        new_scores = jnp.where(c.done[:, None], c.beam_scores, new_scores)

        tokens = jnp.take_along_axis(c.tokens, new_src[:, :, None], axis=1)
        nxt = jnp.where(c.done[:, None], c.tokens[:, :, t + 1], new_tok)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, nxt, t + 1, axis=2)

        def reorder(x):
            xb = x.reshape(b, k, *x.shape[1:])
            idx = new_src.reshape(b, k, *([1] * (x.ndim - 1)))
            return jnp.take_along_axis(xb, idx, axis=1).reshape(x.shape)

        new_layers = tuple(
            lc._replace(self_k=reorder(lc.self_k), self_v=reorder(lc.self_v))
            for lc in new_state.layers)
        new_state = new_state._replace(layers=new_layers)

        # ---- done rule ----
        have_k = hyp_count >= k
        if early_stopping:
            done = c.done | have_k
        else:
            # HF heuristic: no open beam can still beat the worst banked one.
            best_possible = (jnp.max(new_scores, axis=-1)
                             / jnp.float32(t + 1) ** length_penalty)
            worst_kept = jnp.min(
                jnp.where(jnp.isfinite(hyp_scores), hyp_scores, jnp.inf),
                axis=-1)
            done = c.done | (have_k & (worst_kept >= best_possible))

        return _BeamCarry(tokens, new_scores, hyp_tokens, hyp_scores,
                          hyp_lens, hyp_count, done, new_state)

    carry = jax.lax.while_loop(cond, body, carry)

    # ---- finalize still-open rows: bank their current beams ----
    t_end = carry.state.t
    plen = jnp.minimum(t_end + 1, max_length)  # EOS forced at the boundary
    pen_fin = (carry.beam_scores
               / jnp.float32(t_end + 1) ** length_penalty)
    hyp_fields = (carry.hyp_tokens, carry.hyp_scores, carry.hyp_lens,
                  carry.hyp_count)

    def fin_one(j, fields):
        return _bank_hypotheses(
            fields, ~carry.done, pen_fin[:, j], carry.tokens[:, j],
            plen, eos)

    hyp_tokens, hyp_scores, hyp_lens, _ = jax.lax.fori_loop(
        0, num_beams, fin_one, hyp_fields)

    best = jnp.argmax(hyp_scores, axis=-1)                        # (B,)
    out = jnp.take_along_axis(hyp_tokens, best[:, None, None], axis=1)[:, 0]
    out_scores = jnp.take_along_axis(hyp_scores, best[:, None], axis=1)[:, 0]
    # zero-pad after the first EOS (reference contract, modeling:683-688)
    first = jnp.take_along_axis(hyp_lens, best[:, None], axis=1)
    pos = jnp.arange(l1)[None, :]
    out = jnp.where(pos < first, out, 0)
    out = jnp.where(pos == first, eos, out)
    return out, out_scores
