"""Decoder KV caches for incremental decoding.

Design (no reference equivalent — the reference decodes O(L^2) with no cache,
modeling_flash_t5.py:669-676; the math reproduced here is its decoder stack):

- self-attention cache: per layer (B, H, max_len, d_kv) K/V ring written at
  position t each step (static shapes; `lax.dynamic_update_slice`)
- cross-attention cache: per layer K/V computed ONCE from the encoder output
- single-token decode step: q is (B, 1, H, d_kv); the T5 relative bias for
  row t against all cache positions is a cheap (1, H, 1, max_len) gather;
  RoPE rotates with position offset t
- everything is jittable and batch-static, so the whole decode loop lives in
  one `lax.while_loop` on-device.

TPU notes: at M=1 the attention is HBM-bandwidth-bound (read K/V); XLA fuses
the masked softmax; the cache layout keeps (len, d_kv) contiguous in the
minor dims so reads stream at full bandwidth. INT8 cache quantization hooks
live in ops/quant.py (scales per head).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from flasht5_tpu import positional
from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5


class LayerCache(NamedTuple):
    self_k: jnp.ndarray    # (B, H, max_len, d_kv)
    self_v: jnp.ndarray
    cross_k: jnp.ndarray   # (B, H, n_enc, d_kv)
    cross_v: jnp.ndarray


class DecodeState(NamedTuple):
    layers: Any                      # tuple of LayerCache
    encoder_mask: Optional[jnp.ndarray]
    t: jnp.ndarray                   # current step (scalar int32)


def _proj_heads(x, w, num_heads, d_kv):
    b, n = x.shape[:2]
    y = t5._matmul(x, w)  # quant-aware dispatch
    return jnp.transpose(y.reshape(b, n, num_heads, d_kv), (0, 2, 1, 3))


def init_decode_state(config: FlashT5Config, params: Dict,
                      encoder_hidden_states: jnp.ndarray,
                      max_decode_len: int,
                      encoder_mask: Optional[jnp.ndarray] = None) -> DecodeState:
    """Allocate self caches and precompute cross K/V from the encoder output."""
    b = encoder_hidden_states.shape[0]
    dkv = config.d_kv
    dt = encoder_hidden_states.dtype
    n_enc = encoder_hidden_states.shape[1]
    layers = []
    for blk in params["decoder"]["block"]:
        ca = blk["cross_attention_layer"]["cross_attention"]
        # local head count from the (possibly tensor-sharded) projection
        h = ca["Wk"].shape[1] // dkv
        ck = _proj_heads(encoder_hidden_states, ca["Wk"], h, dkv)
        cv = _proj_heads(encoder_hidden_states, ca["Wv"], h, dkv)
        if config.position_encoding_type == "RoPE":
            # RoPE applies in every layer including cross-attention
            # (reference quirk: modeling_flash_t5.py:214, 258)
            rotary_dim = int(dkv * config.rotary_emb_fraction)
            tlen = n_enc
            if config.rotary_scale_base is not None:
                # xPos center = table_len//2; reference builds the cache at
                # max_sequence_length (positional_encoding.py:271-273, 285)
                tlen = max(config.max_sequence_length, n_enc)
            cos, sin, cos_k, sin_k = positional.rope_cos_sin(
                tlen, rotary_dim, base=config.rotary_base,
                scale_base=config.rotary_scale_base, dtype=jnp.float32)
            ckk = (cos if cos_k is None else cos_k)[:n_enc]
            skk = (sin if sin_k is None else sin_k)[:n_enc]
            ck = jnp.transpose(positional.apply_rotary(
                jnp.transpose(ck, (0, 2, 1, 3)), ckk, skk,
                interleaved=config.rotary_interleaved), (0, 2, 1, 3))
            if config.rope_rotate_v:
                # reference quirk: v rotated too (positional_encoding.py:330)
                cv = jnp.transpose(positional.apply_rotary(
                    jnp.transpose(cv, (0, 2, 1, 3)), ckk, skk,
                    interleaved=config.rotary_interleaved), (0, 2, 1, 3))
        layers.append(LayerCache(
            self_k=jnp.zeros((b, h, max_decode_len, dkv), dt),
            self_v=jnp.zeros((b, h, max_decode_len, dkv), dt),
            cross_k=ck,
            cross_v=cv,
        ))
    return DecodeState(tuple(layers), encoder_mask, jnp.zeros((), jnp.int32))


def _single_query_attention(q, k, v, bias, scale, length_mask,
                            qk_mask=None):
    """q: (B,H,Q,D); k,v: (B,H,N,D); bias: (1|B,H,Q,N) or None;
    length_mask: (N,) or (B,N) bool of valid key positions;
    qk_mask: (Q,N) bool per-query key validity (decode windows)."""
    s = jnp.einsum("bhqd,bhnd->bhqn", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if length_mask is not None:
        lm = length_mask if length_mask.ndim == 2 else length_mask[None]
        s = jnp.where(lm[:, None, None, :], s, -1e30)
    if qk_mask is not None:
        s = jnp.where(qk_mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqn,bhnd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def decode_step(config: FlashT5Config, params: Dict, state: DecodeState,
                token: jnp.ndarray):
    """One incremental decode step.

    token: (B,) int32 current decoder input. Returns (logits (B, V),
    new_state). Math parity with the reference decoder stack at query
    position t (modeling_flash_t5.py:410-464) — pinned by
    tests/test_inference.py against the no-cache forward.
    """
    logits, new_state = decode_window_step(config, params, state,
                                           token[:, None])
    return logits[:, 0], new_state


def decode_window_step(config: FlashT5Config, params: Dict,
                       state: DecodeState, tokens: jnp.ndarray):
    """Incremental decode over a window of Q tokens at positions t..t+Q-1.

    tokens: (B, Q) int32 decoder inputs (Q static). Returns
    (logits (B, Q, V), new_state with t advanced by Q). Queries attend the
    committed cache plus the window's own earlier tokens (causal within the
    window). Q=1 is exactly `decode_step`; Q>1 is the verify step for
    speculative decoding — the same weight stream feeds Q queries, so on TPU
    the marginal cost of the extra MXU rows is small while single-token
    decode is HBM-bandwidth-bound.
    """
    b, q_len = tokens.shape
    dkv = config.d_kv
    t = state.t
    max_len = state.layers[0].self_k.shape[2]
    emb = params["shared"]["embedding"]
    x = jnp.take(emb, tokens, axis=0).astype(jnp.dtype(config.dtype))

    pos_k = jnp.arange(max_len, dtype=jnp.int32)
    q_pos = t + jnp.arange(q_len, dtype=jnp.int32)
    valid = pos_k[None, :] <= q_pos[:, None]      # (Q, N)

    new_layers = []
    self_bias = None
    for li, blk in enumerate(params["decoder"]["block"]):
        cache = state.layers[li]

        # ---- self attention ----
        sa = blk["self_attention_layer"]["self_attention"]
        h = sa["Wq"].shape[1] // dkv  # local heads under tensor sharding
        normed = t5._layer_norm(config,
                                blk["self_attention_layer"]["layer_norm"]["weight"], x)
        q = _proj_heads(normed, sa["Wq"], h, dkv)
        k_new = _proj_heads(normed, sa["Wk"], h, dkv)
        v_new = _proj_heads(normed, sa["Wv"], h, dkv)

        if config.position_encoding_type == "RoPE":
            rotary_dim = int(dkv * config.rotary_emb_fraction)
            tlen = max_len
            if config.rotary_scale_base is not None:
                tlen = max(config.max_sequence_length, max_len)
            cos, sin, cos_k, sin_k = positional.rope_cos_sin(
                tlen, rotary_dim, base=config.rotary_base,
                scale_base=config.rotary_scale_base, dtype=jnp.float32)
            cos_t = jax.lax.dynamic_slice_in_dim(cos, t, q_len, 0)
            sin_t = jax.lax.dynamic_slice_in_dim(sin, t, q_len, 0)
            qb = jnp.transpose(q, (0, 2, 1, 3))     # (B,Q,H,D)
            q = jnp.transpose(positional.apply_rotary(
                qb, cos_t, sin_t, interleaved=config.rotary_interleaved),
                (0, 2, 1, 3))
            ck = cos if cos_k is None else cos_k
            sk = sin if sin_k is None else sin_k
            ck_t = jax.lax.dynamic_slice_in_dim(ck, t, q_len, 0)
            sk_t = jax.lax.dynamic_slice_in_dim(sk, t, q_len, 0)
            kb = jnp.transpose(k_new, (0, 2, 1, 3))
            k_new = jnp.transpose(positional.apply_rotary(
                kb, ck_t, sk_t,
                interleaved=config.rotary_interleaved), (0, 2, 1, 3))
            if config.rope_rotate_v:
                vb = jnp.transpose(v_new, (0, 2, 1, 3))
                v_new = jnp.transpose(positional.apply_rotary(
                    vb, ck_t, sk_t,
                    interleaved=config.rotary_interleaved), (0, 2, 1, 3))

        self_k = jax.lax.dynamic_update_slice(cache.self_k, k_new, (0, 0, t, 0))
        self_v = jax.lax.dynamic_update_slice(cache.self_v, v_new, (0, 0, t, 0))

        if li == 0 and config.position_encoding_type in ("t5", "ALiBi", "FIRE"):
            pe = params["decoder"]["block"][0]["self_attention_layer"][
                "self_attention"].get("pe_encoding")
            if config.position_encoding_type == "t5":
                self_bias = positional.t5_relative_bias(
                    pe, q_len, max_len, bidirectional=False,
                    num_buckets=config.relative_attention_num_buckets,
                    max_distance=config.relative_attention_max_distance,
                    dtype=jnp.float32,
                    q_positions=q_pos, k_positions=pos_k)
            elif config.position_encoding_type == "ALiBi":
                self_bias = positional.alibi_bias(
                    h, q_len, max_len, mode=config.alibi_mode,
                    dtype=jnp.float32,
                    q_positions=q_pos, k_positions=pos_k)
            else:  # FIRE bias rows t..t+Q-1 against all cache positions
                full = positional.fire_bias(pe, max_len, dtype=jnp.float32)
                self_bias = jax.lax.dynamic_slice_in_dim(full, t, q_len,
                                                         axis=2)

        attn = _single_query_attention(q, self_k, self_v, self_bias,
                                       config.softmax_scale, None,
                                       qk_mask=valid)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, q_len, h * dkv)
        o_proj = t5._matmul(attn, sa["o"])
        if config.tp_axis is not None:
            o_proj = jax.lax.psum(o_proj, config.tp_axis)
        x = x + o_proj

        # ---- cross attention ----
        ca = blk["cross_attention_layer"]["cross_attention"]
        normed = t5._layer_norm(
            config, blk["cross_attention_layer"]["layer_norm"]["weight"], x)
        qc = _proj_heads(normed, ca["Wq"], h, dkv)
        if config.position_encoding_type == "RoPE":
            rotary_dim = int(dkv * config.rotary_emb_fraction)
            tlen = max_len
            if config.rotary_scale_base is not None:
                tlen = max(config.max_sequence_length, max_len)
            cos, sin, _, _ = positional.rope_cos_sin(
                tlen, rotary_dim, base=config.rotary_base,
                scale_base=config.rotary_scale_base, dtype=jnp.float32)
            qc = jnp.transpose(positional.apply_rotary(
                jnp.transpose(qc, (0, 2, 1, 3)),
                jax.lax.dynamic_slice_in_dim(cos, t, q_len, 0),
                jax.lax.dynamic_slice_in_dim(sin, t, q_len, 0),
                interleaved=config.rotary_interleaved), (0, 2, 1, 3))
        # parity with training path: encoder padding mask applies only via
        # use_masking (modeling_flash_t5.py:266-270), which needs a bias;
        # cross-attn has none, so no mask — reproduced exactly here.
        attn = _single_query_attention(qc, cache.cross_k, cache.cross_v, None,
                                       config.softmax_scale, None)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, q_len, h * dkv)
        o_proj = t5._matmul(attn, ca["o"])
        if config.tp_axis is not None:
            o_proj = jax.lax.psum(o_proj, config.tp_axis)
        x = x + o_proj

        # ---- mlp ----
        x = t5._ff(config, blk["ff_layer"], x, rng=None, deterministic=True)

        new_layers.append(cache._replace(self_k=self_k, self_v=self_v))

    x = t5._layer_norm(config,
                       params["decoder"]["final_layer_norm"]["weight"], x)
    if config.tie_word_embeddings:
        logits = jnp.dot(x, emb.T.astype(x.dtype))
    else:
        logits = t5._matmul(x, params["lm_head"])
    return logits, DecodeState(tuple(new_layers), state.encoder_mask,
                               t + q_len)
