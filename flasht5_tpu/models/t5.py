"""T5 v1.1 encoder-decoder, pure-functional JAX.

Re-implements the reference model layer (src/model/modeling_flash_t5.py):
pre-norm residual blocks, (gated-)GELU/ReLU MLP, four positional-encoding
families with layer-0-owned bias shared across blocks
(reference: modeling_flash_t5.py:404,452-455), decoder with causal self-attn
plus cross-attn (no positional bias, reference :324), untied lm_head,
CE + z-loss, greedy generate with start-token 0 / EOS 1 / pad-after-EOS
semantics (reference :648-690).

Parameter pytree key names follow the reference checkpoint naming
(convert_huggingface_t5.py:12-28), so the HF importer and parity checks map
one-to-one:

    shared.embedding
    {encoder,decoder}.block.<i>.self_attention_layer.self_attention.{Wq,Wk,Wv,o}
    {encoder,decoder}.block.<i>.self_attention_layer.layer_norm.weight
    decoder.block.<i>.cross_attention_layer.cross_attention.{Wq,Wk,Wv,o}
    {encoder,decoder}.block.<i>.ff_layer.act.{wi | wi_0,wi_1}
    {encoder,decoder}.block.<i>.ff_layer.{wo, layer_norm.weight}
    {encoder,decoder}.block.0...self_attention.pe_encoding.relative_attention_bias
    {encoder,decoder}.final_layer_norm.weight
    lm_head

Linear kernels are stored (in_features, out_features) so application is
`x @ W`; the HF importer transposes torch's (out, in) layout.

TPU-first notes: everything is shaped statically; blocks run under an
optional `jax.checkpoint` (remat); attention dispatches to Pallas kernels
(ops/flash_attention.py, ops/flash_attention_rpe.py); all matmuls are
bf16 on the MXU with fp32 accumulation; sharding rules for every parameter
live in parallel/sharding.py.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flasht5_tpu import positional
from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.ops.attn_ref import attn_ref
from flasht5_tpu.ops.cross_entropy import cross_entropy_loss, cross_entropy_loss_ref
from flasht5_tpu.ops.flash_attention import flash_attention
from flasht5_tpu.ops.rmsnorm import rms_norm, rms_norm_ref

Params = Dict[str, Any]


def _dtype(config):
    return jnp.dtype(config.dtype)


def _pdtype(config):
    return jnp.dtype(config.param_dtype)


# ===========================================================================
# Initialization (T5 scheme, reference: modeling_flash_t5.py:479-504)
# ===========================================================================

def _normal(rng, shape, std, dtype):
    return (jax.random.normal(rng, shape, jnp.float32) * std).astype(dtype)


def _init_attention(rng, config: FlashT5Config, *, has_pe: bool,
                    bidirectional: bool) -> Params:
    f = config.initializer_factor
    d, dkv, h = config.d_model, config.d_kv, config.num_heads
    inner = h * dkv
    ks = jax.random.split(rng, 6)
    p = {
        "Wq": _normal(ks[0], (d, inner), f * (d * dkv) ** -0.5, _pdtype(config)),
        "Wk": _normal(ks[1], (d, inner), f * d ** -0.5, _pdtype(config)),
        "Wv": _normal(ks[2], (d, inner), f * d ** -0.5, _pdtype(config)),
        "o": _normal(ks[3], (inner, d), f * inner ** -0.5, _pdtype(config)),
    }
    if has_pe:
        pe = {}
        if config.position_encoding_type == "t5":
            pe = positional.init_relative_bias_params(
                ks[4], config.relative_attention_num_buckets, h,
                initializer_factor=f, d_model=d, dtype=_pdtype(config))
        elif config.position_encoding_type == "FIRE":
            pe = positional.init_fire_params(
                ks[5], h, config.fire_mlp_width, init_c=0.1,
                init_L=float(config.relative_attention_max_distance),
                dtype=_pdtype(config))
        # ALiBi / RoPE carry no learnable parameters
        if pe:
            p["pe_encoding"] = pe
    return p


def _init_ff(rng, config: FlashT5Config) -> Params:
    f = config.initializer_factor
    d, dff = config.d_model, config.d_ff
    ks = jax.random.split(rng, 3)
    if config.use_glu_mlp:
        act = {
            "wi_0": _normal(ks[0], (d, dff), f * d ** -0.5, _pdtype(config)),
            "wi_1": _normal(ks[1], (d, dff), f * d ** -0.5, _pdtype(config)),
        }
    else:
        act = {"wi": _normal(ks[0], (d, dff), f * d ** -0.5, _pdtype(config))}
    return {
        "act": act,
        "wo": _normal(ks[2], (dff, d), f * dff ** -0.5, _pdtype(config)),
        "layer_norm": {"weight": jnp.full((d,), f, _pdtype(config))},
    }


def _init_block(rng, config: FlashT5Config, *, is_decoder: bool,
                has_pe: bool) -> Params:
    ks = jax.random.split(rng, 3)
    block = {
        "self_attention_layer": {
            "self_attention": _init_attention(
                ks[0], config, has_pe=has_pe, bidirectional=not is_decoder),
            "layer_norm": {"weight": jnp.full((config.d_model,),
                                              config.initializer_factor,
                                              _pdtype(config))},
        },
        "ff_layer": _init_ff(ks[1], config),
    }
    if is_decoder:
        block["cross_attention_layer"] = {
            "cross_attention": _init_attention(
                ks[2], config, has_pe=False, bidirectional=True),
            "layer_norm": {"weight": jnp.full((config.d_model,),
                                              config.initializer_factor,
                                              _pdtype(config))},
        }
    return block


def _init_stack(rng, config: FlashT5Config, *, is_decoder: bool) -> Params:
    n = config.num_decoder_layers if is_decoder else config.num_layers
    ks = jax.random.split(rng, n)
    return {
        "block": [
            _init_block(ks[i], config, is_decoder=is_decoder, has_pe=(i == 0))
            for i in range(n)
        ],
        "final_layer_norm": {"weight": jnp.full((config.d_model,),
                                                config.initializer_factor,
                                                _pdtype(config))},
    }


def init_params(rng, config: FlashT5Config) -> Params:
    """Initialize the full conditional-generation parameter tree."""
    ks = jax.random.split(rng, 4)
    f = config.initializer_factor
    params = {
        "shared": {"embedding": _normal(ks[0], (config.vocab_size, config.d_model),
                                        f * 1.0, _pdtype(config))},
        "encoder": _init_stack(ks[1], config, is_decoder=False),
        "decoder": _init_stack(ks[2], config, is_decoder=True),
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = _normal(ks[3], (config.d_model, config.vocab_size),
                                    f * config.d_model ** -0.5, _pdtype(config))
    return params


def init_encoder_params(rng, config: FlashT5Config) -> Params:
    """Encoder-only tree (FlashT5EncoderModel, reference: modeling:739-774)."""
    ks = jax.random.split(rng, 2)
    return {
        "shared": {"embedding": _normal(ks[0], (config.vocab_size, config.d_model),
                                        config.initializer_factor, _pdtype(config))},
        "encoder": _init_stack(ks[1], config, is_decoder=False),
    }


# ===========================================================================
# Building blocks
# ===========================================================================

def _layer_norm(config: FlashT5Config, w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    if config.use_fused_layernorm:
        return rms_norm(x, w.astype(x.dtype), config.layer_norm_epsilon)
    return rms_norm_ref(x, w.astype(x.dtype), config.layer_norm_epsilon)


def _dropout(rng, rate, x, deterministic):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _matmul(x, w):
    from flasht5_tpu.ops.quant import QuantizedTensor, quant_matmul
    if isinstance(w, QuantizedTensor):
        return quant_matmul(x, w)
    return jnp.dot(x, w.astype(x.dtype))


def _merged_proj(*ws):
    """FLASHT5_MERGED_PROJ=1 (trace-time): fuse same-LHS projections (QKV,
    the two GLU wi's) into one matmul by concatenating the weights along the
    output dim — fewer, fatter MXU dispatches in fwd AND in the dW/dx
    backward contractions. Only for plain (non-quantized) weights; the
    concat itself is one small weight-sized copy per step."""
    from flasht5_tpu.ops.quant import QuantizedTensor
    if _os.environ.get("FLASHT5_MERGED_PROJ", "0") != "1":
        return False
    return not any(isinstance(w, QuantizedTensor) for w in ws)


def _row_parallel_matmul(config: FlashT5Config, x, w):
    """Row-parallel (k-sharded) matmul + cross-shard reduction.

    Default: local matmul then blocking psum. With use_collective_matmul the
    reduction runs as a ring matmul_reducescatter (each ICI hop overlapped
    with the next chunk's matmul) followed by a tiled all_gather — the
    collective-matmul path of the north star. x: (B, M, k_local) or
    (M, k_local); w: (k_local, N) (or QuantizedTensor: the overlapped compute
    is then the dequant-matmul).
    """
    axis = config.tp_axis
    if config.use_collective_matmul:
        t = jax.lax.axis_size(axis)
        lead, k_local = x.shape[:-1], x.shape[-1]
        m = functools.reduce(lambda a, b: a * b, lead, 1)
        if t > 1 and m % t == 0:
            from flasht5_tpu.parallel.collective_matmul import (
                matmul_reducescatter)
            shard = matmul_reducescatter(x.reshape(m, k_local), w, axis)
            full = jax.lax.all_gather(shard, axis, axis=0, tiled=True)
            return full.reshape(*lead, w.shape[1])
    return jax.lax.psum(_matmul(x, w), axis)


def _ff(config: FlashT5Config, params: Params, x, *, rng, deterministic):
    """Pre-norm MLP with residual (reference: modeling_flash_t5.py:147-164)."""
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    h = _layer_norm(config, params["layer_norm"]["weight"], x)
    act_fn = (functools.partial(jax.nn.gelu, approximate=True)
              if config.use_gelu_act else jax.nn.relu)
    if config.use_glu_mlp:
        w0, w1 = params["act"]["wi_0"], params["act"]["wi_1"]
        if _merged_proj(w0, w1):
            ab = _matmul(h, jnp.concatenate([w0, w1], axis=1))
            a, b = jnp.split(ab, [w0.shape[1]], axis=-1)
            a = act_fn(a)
        else:
            a = act_fn(_matmul(h, w0))
            b = _matmul(h, w1)
        h = a * b
    else:
        h = act_fn(_matmul(h, params["act"]["wi"]))
    h = _dropout(r1, config.dropout_rate, h, deterministic)
    if config.tp_axis is not None:
        # row-parallel wo: partial sums across d_ff shards
        h = _row_parallel_matmul(config, h, params["wo"])
    else:
        h = _matmul(h, params["wo"])
    return x + _dropout(r2, config.dropout_rate, h, deterministic)


def _position_bias(config: FlashT5Config, pe_params: Optional[Params],
                   q_len: int, k_len: int, *, bidirectional: bool, dtype,
                   rng=None) -> Optional[jnp.ndarray]:
    """Build the (1, H, M, N) additive bias for bias-style PEs."""
    pet = config.position_encoding_type
    q_pos = k_pos = None
    if config.use_randomized_position_encoding and rng is not None:
        rq, rk = jax.random.split(rng)
        q_pos = positional._randomized_positions(rq, q_len, config.max_sequence_length)
        k_pos = positional._randomized_positions(rk, k_len, config.max_sequence_length)
    if pet == "t5":
        return positional.t5_relative_bias(
            pe_params, q_len, k_len, bidirectional=bidirectional,
            num_buckets=config.relative_attention_num_buckets,
            max_distance=config.relative_attention_max_distance,
            dtype=dtype, q_positions=q_pos, k_positions=k_pos)
    if pet == "ALiBi":
        bias = positional.alibi_bias(
            config.num_heads, q_len, k_len, mode=config.alibi_mode,
            dtype=dtype, q_positions=q_pos, k_positions=k_pos)
        if config.tp_axis is not None:
            # slice this shard's heads out of the global-slope bias
            shard = jax.lax.axis_index(config.tp_axis)
            per = config.num_heads // jax.lax.axis_size(config.tp_axis)
            bias = jax.lax.dynamic_slice_in_dim(bias, shard * per, per, axis=1)
        return bias
    if pet == "FIRE":
        return positional.fire_bias(pe_params, q_len, dtype=dtype)
    return None


def _attention(
    config: FlashT5Config,
    params: Params,
    hidden_states: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    key_value_states: Optional[jnp.ndarray] = None,
    position_bias: Optional[jnp.ndarray] = None,
    has_pe: bool,
    is_causal: bool,
    bidirectional: bool,
    rng=None,
    deterministic: bool = True,
    rpe_table: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Multi-head attention (reference: modeling_flash_t5.py:232-294).

    Returns (output, position_bias) so the stack can thread the layer-0 bias
    to later blocks.
    """
    b, m = hidden_states.shape[:2]
    kv_src = hidden_states if key_value_states is None else key_value_states
    n = kv_src.shape[1]
    dkv = config.d_kv
    # head count from the (possibly tensor-sharded) projection, not the
    # config: under shard_map TP each shard owns num_heads/t heads
    h = params["Wq"].shape[1] // dkv

    wq, wk, wv = params["Wq"], params["Wk"], params["Wv"]
    if _merged_proj(wq, wk, wv):
        if key_value_states is None:
            qkv = _matmul(hidden_states, jnp.concatenate([wq, wk, wv], 1))
            q, k, v = jnp.split(
                qkv, [wq.shape[1], wq.shape[1] + wk.shape[1]], axis=-1)
        else:
            q = _matmul(hidden_states, wq)
            kv = _matmul(kv_src, jnp.concatenate([wk, wv], 1))
            k, v = jnp.split(kv, [wk.shape[1]], axis=-1)
        q = q.reshape(b, m, h, dkv)
        k = k.reshape(b, n, h, dkv)
        v = v.reshape(b, n, h, dkv)
    else:
        q = _matmul(hidden_states, wq).reshape(b, m, h, dkv)
        k = _matmul(kv_src, wk).reshape(b, n, h, dkv)
        v = _matmul(kv_src, wv).reshape(b, n, h, dkv)

    pe_params = params.get("pe_encoding")
    if config.position_encoding_type == "RoPE":
        # RoPE applies in every layer (reference quirk: the rotary encoder is
        # constructed regardless of has_positional_encoding, modeling:214).
        rotary_dim = int(dkv * config.rotary_emb_fraction)
        randomize = (config.use_randomized_position_encoding
                     and not deterministic and rng is not None)
        if randomize:
            table_len = config.max_sequence_length
        elif config.rotary_scale_base is not None:
            # xPos scale is centered at table_len//2 and the reference builds
            # its cache at max_sequence_length (positional_encoding.py:285,
            # 271-273), so the table length is part of the math.
            table_len = max(config.max_sequence_length, m, n)
        else:
            table_len = max(m, n)
        cos, sin, cos_k, sin_k = positional.rope_cos_sin(
            table_len, rotary_dim, base=config.rotary_base,
            scale_base=config.rotary_scale_base, dtype=jnp.float32)
        if randomize:
            # one shared sorted random position vector for q and k so that
            # self-attention (m == n) keeps exact relative distances; the
            # reference threads this flag into RoPE but never consumes it
            # (modeling:218-220) — see positional.gather_rope_tables.
            rng, pos_rng = jax.random.split(rng)
            pos = positional._randomized_positions(
                pos_rng, max(m, n), config.max_sequence_length)
            cos, sin, cos_k, sin_k = positional.gather_rope_tables(
                (cos, sin, cos_k, sin_k), pos)
        q = positional.apply_rotary(q, cos[:m], sin[:m],
                                    interleaved=config.rotary_interleaved)
        ck = cos if cos_k is None else cos_k
        sk = sin if sin_k is None else sin_k
        k = positional.apply_rotary(k, ck[:n], sk[:n],
                                    interleaved=config.rotary_interleaved)
        if config.rope_rotate_v:
            # reference quirk: v is rotated too (positional_encoding.py:330)
            v = positional.apply_rotary(v, ck[:n], sk[:n],
                                        interleaved=config.rotary_interleaved)
    elif (position_bias is None and has_pe
          and config.position_encoding_type in ("t5", "ALiBi", "FIRE")
          and config.attention_type != "pallas_rpe"):
        position_bias = _position_bias(
            config, pe_params, m, n, bidirectional=bidirectional,
            dtype=jnp.float32, rng=rng)

    if position_bias is not None and config.use_full_bias_size:
        position_bias = jnp.broadcast_to(position_bias, (b, h, m, n))

    if position_bias is not None and mask is not None and config.use_masking:
        # fold the mask into the bias, reproducing the reference's broadcast
        # exactly (modeling:266-270): a 2-D (B, N) mask becomes (B, 1, N, 1),
        # which for self-attention (M == N) masks *query rows*, not key
        # columns — a reference quirk pinned by the golden parity tests.
        mm = mask[:, None]                       # (B, 1, N) or (B, 1, M, N)
        if mm.ndim == 3:
            mm = mm[:, :, :, None]               # (B, 1, N, 1)
        position_bias = jnp.where(mm.astype(bool), position_bias,
                                  jnp.finfo(position_bias.dtype).min)

    # (B, L, H, D) -> (B, H, L, D)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    scale = config.softmax_scale

    if config.attention_type == "pallas_rpe":
        from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe
        # every layer shares block-0's bucket table (T5 semantics: the
        # layer-0 bias applies in all layers, reference modeling:452-455);
        # the stack threads it here as `rpe_table`
        table = rpe_table
        if table is None and has_pe and pe_params is not None:
            table = pe_params["relative_attention_bias"]
        # Small-query escape hatch (A/B knob, default OFF): route short-M
        # attention to the XLA reference path with the bias materialized from
        # the bucket table (jnp.take's scatter-add transpose provides dW).
        # Measured SLOWER on v5e at M=256 (113.8k vs 119.5k tok/s full-step
        # A/B): XLA saves the (B,H,M,N) probabilities for backward, and that
        # HBM round-trip costs more than the Pallas launches it removes.
        want_masking = (config.use_masking and mask is not None
                        and mask.ndim == 2 and key_value_states is None)
        masked_in_bias = False
        if m <= int(_os.environ.get("FLASHT5_SMALL_ATTN_M", "0")):
            small_bias = None
            if table is not None:
                small_bias = positional.t5_relative_bias(
                    {"relative_attention_bias": table}, m, n,
                    bidirectional=bidirectional,
                    num_buckets=config.relative_attention_num_buckets,
                    max_distance=config.relative_attention_max_distance,
                    dtype=jnp.float32)
            if want_masking and small_bias is not None:
                # with the bias materialized, use_masking can take the
                # reference's exact form — the (B, 1, N, 1) query-row fold
                # (modeling:266-270) — which makes this branch
                # gradient-exact too, unlike the kernel branch's post-hoc
                # select below (tests/test_model_forward.py pins both).
                mm = mask[:, None, :, None].astype(bool)      # (B, 1, N, 1)
                small_bias = jnp.where(mm, small_bias,
                                       jnp.finfo(small_bias.dtype).min)
                masked_in_bias = True
            out = attn_ref(qt, kt, vt, small_bias, sm_scale=scale,
                           causal=is_causal)
        else:
            out = flash_attention_rpe(
                qt, kt, vt, table,
                causal=is_causal, sm_scale=scale, bidirectional=bidirectional,
                num_buckets=config.relative_attention_num_buckets,
                max_distance=config.relative_attention_max_distance)
        if want_masking and not masked_in_bias:
            # use_masking parity for the in-kernel-bias path. The reference
            # folds a (B, N) padding mask into the bias as (B, 1, N, 1)
            # (modeling:266-270), masking QUERY ROWS: every logit in a masked
            # row absorbs to finfo.min, so softmax over the row is exactly
            # uniform (1/N per key; 1/(row+1) under the causal -inf). The
            # reference's own fa2_rpe backend cannot mask at all; here the
            # semantics are reproduced outside the kernel by selecting the
            # (causal-running-)mean of V for masked rows. Parity is
            # FORWARD-EXACT (golden-pinned); per layer the gradients are
            # exact through V, o and the bucket table (masked rows' dout is
            # zeroed by the select, so the kernel backward contributes
            # exactly the reference's zero dW there, and the uniform-mean dV
            # equals the reference's), but the masked rows' q/k score-path
            # gradient is zeroed where the reference propagates the (tiny,
            # padding-row) uniform-softmax one — and in multi-layer stacks
            # that difference spreads to lower layers through dk/dx. So:
            # training with use_masking=True on this branch is forward-
            # equivalent but NOT gradient-identical to the reference
            # (tests/test_model_forward.py::test_masked_pallas_rpe_grads
            # pins exactly which leaves match on a 1-layer model).
            # The small-M branch above IS reference-exact for gradients.
            # Cross-attention is exempt, as in the reference (bias is None
            # there, so the fold never happens).
            if is_causal:
                denom = jnp.arange(1, n + 1, dtype=jnp.float32)
                uni = (jnp.cumsum(vt.astype(jnp.float32), axis=2)
                       / denom[None, None, :, None]).astype(out.dtype)
            else:
                uni = jnp.broadcast_to(
                    jnp.mean(vt.astype(jnp.float32), axis=2,
                             keepdims=True).astype(out.dtype), out.shape)
            out = jnp.where(mask.astype(bool)[:, None, :, None], out, uni)
    elif config.attention_type == "pallas":
        out = flash_attention(qt, kt, vt, position_bias, causal=is_causal,
                              sm_scale=scale)
    else:
        drop_rng = None
        if not deterministic and config.attention_dropout_rate > 0.0 and rng is not None:
            rng, drop_rng = jax.random.split(rng)
        out = attn_ref(qt, kt, vt, position_bias, sm_scale=scale,
                       causal=is_causal,
                       dropout_p=0.0 if deterministic else config.attention_dropout_rate,
                       dropout_rng=drop_rng)

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, m, h * dkv)
    if config.tp_axis is not None:
        # row-parallel o-projection: partial sums across head shards
        out = _row_parallel_matmul(config, out, params["o"])
    else:
        out = _matmul(out, params["o"])
    return out, position_bias


def _block_apply(
    config: FlashT5Config,
    block_params: Params,
    hidden_states: jnp.ndarray,
    *,
    is_decoder: bool,
    has_pe: bool,
    attention_mask=None,
    position_bias=None,
    encoder_hidden_states=None,
    encoder_attention_mask=None,
    encoder_decoder_position_bias=None,
    rng=None,
    deterministic=True,
    rpe_table=None,
):
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4

    # self attention (pre-norm + residual, reference: modeling:304-318)
    sa = block_params["self_attention_layer"]
    normed = _layer_norm(config, sa["layer_norm"]["weight"], hidden_states)
    attn_out, position_bias = _attention(
        config, sa["self_attention"], normed,
        mask=attention_mask, position_bias=position_bias,
        has_pe=has_pe, is_causal=is_decoder, bidirectional=not is_decoder,
        rng=rngs[0], deterministic=deterministic, rpe_table=rpe_table)
    hidden_states = hidden_states + _dropout(rngs[1], config.dropout_rate,
                                             attn_out, deterministic)

    if is_decoder and encoder_hidden_states is not None:
        ca = block_params["cross_attention_layer"]
        normed = _layer_norm(config, ca["layer_norm"]["weight"], hidden_states)
        attn_out, encoder_decoder_position_bias = _attention(
            config, ca["cross_attention"], normed,
            mask=encoder_attention_mask,
            key_value_states=encoder_hidden_states,
            position_bias=encoder_decoder_position_bias,
            has_pe=False, is_causal=False, bidirectional=True,
            rng=rngs[2], deterministic=deterministic)
        hidden_states = hidden_states + _dropout(rngs[3], config.dropout_rate,
                                                 attn_out, deterministic)

    hidden_states = _ff(config, block_params["ff_layer"], hidden_states,
                        rng=rngs[3] if not is_decoder else rngs[2],
                        deterministic=deterministic)
    return hidden_states, position_bias, encoder_decoder_position_bias


def stack_apply(
    config: FlashT5Config,
    stack_params: Params,
    embedding: jnp.ndarray,
    input_ids: jnp.ndarray,
    *,
    is_decoder: bool,
    attention_mask=None,
    encoder_hidden_states=None,
    encoder_attention_mask=None,
    rng=None,
    deterministic=True,
) -> jnp.ndarray:
    """Embed + N blocks + final norm (reference: modeling_flash_t5.py:410-464)."""
    x = jnp.take(embedding, input_ids, axis=0).astype(_dtype(config))
    nblocks = len(stack_params["block"])
    rngs = jax.random.split(rng, nblocks + 2) if rng is not None else [None] * (nblocks + 2)
    x = _dropout(rngs[0], config.dropout_rate, x, deterministic)

    position_bias = None
    encdec_bias = None

    # pallas_rpe: the linear-memory kernel consumes the raw bucket table in
    # EVERY layer (T5 semantics: layer-0's bias applies to all layers,
    # reference modeling:452-455 — for bias PEs that happens by threading the
    # materialized bias; here the table itself is threaded)
    rpe_table = None
    if (config.attention_type == "pallas_rpe"
            and config.position_encoding_type == "t5"):
        pe = stack_params["block"][0]["self_attention_layer"][
            "self_attention"].get("pe_encoding")
        if pe is not None:
            rpe_table = pe["relative_attention_bias"]

    def make_block_fn(has_pe: bool):
        """Close over every static flag so jax.checkpoint only sees array
        arguments (booleans as traced args would break `if` dispatch)."""

        def f(block_params, h, attention_mask, position_bias,
              encoder_hidden_states, encoder_attention_mask,
              encoder_decoder_position_bias, layer_rng, rpe_table):
            return _block_apply(
                config, block_params, h,
                is_decoder=is_decoder, has_pe=has_pe,
                attention_mask=attention_mask,
                position_bias=position_bias,
                encoder_hidden_states=encoder_hidden_states,
                encoder_attention_mask=encoder_attention_mask,
                encoder_decoder_position_bias=encoder_decoder_position_bias,
                rng=layer_rng, deterministic=deterministic,
                rpe_table=rpe_table)

        if config.remat:
            return jax.checkpoint(
                f, policy=jax.checkpoint_policies.nothing_saveable)
        return f

    block0_fn = make_block_fn(has_pe=True)
    rest_fn = make_block_fn(has_pe=False)

    # Blocks 1..N-1 are structurally identical (only block 0 owns the
    # bias-producing positional encoding, reference: modeling:404); roll them
    # into one lax.scan so the compiled HLO is O(1) in depth instead of O(N)
    # — compile time and program size shrink ~N-fold on TPU.
    use_scan = config.scan_blocks and nblocks > 2
    if config.use_randomized_position_encoding and not deterministic:
        use_scan = False  # per-layer randomized positions need the unrolled path

    if use_scan:
        x, position_bias, encdec_bias = block0_fn(
            stack_params["block"][0], x, attention_mask, None,
            encoder_hidden_states, encoder_attention_mask, None, rngs[1],
            rpe_table)

        rest = jax.tree.map(lambda *leaves: jnp.stack(leaves),
                            *stack_params["block"][1:])
        if rng is not None:
            scan_rngs = jnp.stack(rngs[2:nblocks + 1])
        else:
            scan_rngs = jnp.zeros((nblocks - 1, 2), jnp.uint32)

        def body(carry, scanned):
            h, bias, xbias = carry
            bp, layer_rng = scanned
            r = layer_rng if rng is not None else None
            h, _, _ = rest_fn(bp, h, attention_mask, bias,
                              encoder_hidden_states, encoder_attention_mask,
                              xbias, r, rpe_table)
            return (h, bias, xbias), None

        (x, _, _), _ = jax.lax.scan(body, (x, position_bias, encdec_bias),
                                    (rest, scan_rngs))
    else:
        for i, block_params in enumerate(stack_params["block"]):
            fn = block0_fn if i == 0 else rest_fn
            x, position_bias, encdec_bias = fn(
                block_params, x, attention_mask, position_bias,
                encoder_hidden_states, encoder_attention_mask,
                encdec_bias, rngs[i + 1], rpe_table)

    x = _layer_norm(config, stack_params["final_layer_norm"]["weight"], x)
    x = _dropout(rngs[-1], config.dropout_rate, x, deterministic)
    return x


# ===========================================================================
# Losses
# ===========================================================================

def compute_loss(config: FlashT5Config, logits: jnp.ndarray,
                 labels: jnp.ndarray) -> jnp.ndarray:
    """CE + z-loss (reference: FlashT5CrossEntropyLoss, modeling:40-79).

    Reproduces the reference's reduction quirk: the fused path means over ALL
    rows (including ignored, modeling:68); the reference path means over
    non-ignored rows only (modeling:74).
    """
    z = config.z_loss or 0.0
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_labels = labels.reshape(-1)
    if config.use_fused_crossentropy:
        losses, _ = cross_entropy_loss(
            flat_logits, flat_labels, z, config.label_smoothing)
        return jnp.mean(losses)
    losses, _ = cross_entropy_loss_ref(
        flat_logits, flat_labels, lse_square_scale=z,
        label_smoothing=config.label_smoothing)
    n_valid = jnp.maximum(jnp.sum(flat_labels != -100), 1)
    return jnp.sum(losses) / n_valid


# ===========================================================================
# Top-level models
# ===========================================================================

def shift_right(config: FlashT5Config, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Decoder-input construction (reference: modeling:506-517)."""
    shifted = jnp.roll(input_ids, 1, axis=-1)
    shifted = shifted.at[..., 0].set(config.decoder_start_token_id)
    return jnp.where(shifted == -100, config.pad_token_id, shifted)


def encode(config: FlashT5Config, params: Params, input_ids,
           attention_mask=None, *, rng=None, deterministic=True):
    return stack_apply(config, params["encoder"],
                       params["shared"]["embedding"], input_ids,
                       is_decoder=False, attention_mask=attention_mask,
                       rng=rng, deterministic=deterministic)


def forward(
    config: FlashT5Config,
    params: Params,
    input_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    decoder_input_ids: Optional[jnp.ndarray] = None,
    decoder_attention_mask: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    *,
    rng=None,
    deterministic: bool = True,
):
    """Conditional-generation forward (reference: modeling:692-736).

    Returns dict(loss?, logits, encoder_hidden_states).
    """
    r_enc = r_dec = None
    if rng is not None:
        r_enc, r_dec = jax.random.split(rng)
    if encoder_hidden_states is None:
        encoder_hidden_states = encode(config, params, input_ids,
                                       attention_mask, rng=r_enc,
                                       deterministic=deterministic)
    if labels is not None and decoder_input_ids is None:
        decoder_input_ids = shift_right(config, labels)

    dec = stack_apply(config, params["decoder"],
                      params["shared"]["embedding"], decoder_input_ids,
                      is_decoder=True,
                      attention_mask=decoder_attention_mask,
                      encoder_hidden_states=encoder_hidden_states,
                      encoder_attention_mask=attention_mask,
                      rng=r_dec, deterministic=deterministic)
    if config.tie_word_embeddings:
        lm_logits = _matmul(dec, params["shared"]["embedding"].T)
    else:
        lm_logits = _matmul(dec, params["lm_head"])

    out = {"logits": lm_logits, "encoder_hidden_states": encoder_hidden_states}
    if labels is not None:
        if config.tp_axis is not None and not config.tie_word_embeddings:
            from flasht5_tpu.parallel.vocab_parallel import vocab_parallel_loss
            out["loss"] = vocab_parallel_loss(config, lm_logits, labels,
                                              config.tp_axis)
        elif (config.use_fused_lm_head_ce and not config.tie_word_embeddings
              and isinstance(params["lm_head"], jnp.ndarray)):
            # lm_head+CE in one kernel: loss computed straight from the
            # decoder hidden states; `lm_logits` above is dead code under
            # value_and_grad and XLA DCEs the unfused (rows x V) matmul.
            from flasht5_tpu.ops.fused_linear_ce import (
                fused_linear_cross_entropy)
            losses, _ = fused_linear_cross_entropy(
                dec.reshape(-1, dec.shape[-1]), params["lm_head"],
                labels.reshape(-1), config.z_loss or 0.0,
                config.label_smoothing)
            # Same reduction quirk as compute_loss: mean over ALL rows
            # (reference modeling:68).
            out["loss"] = jnp.mean(losses)
        else:
            out["loss"] = compute_loss(config, lm_logits, labels)
    return out


def model_forward(
    config: FlashT5Config,
    params: Params,
    input_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    decoder_input_ids: Optional[jnp.ndarray] = None,
    decoder_attention_mask: Optional[jnp.ndarray] = None,
    *,
    rng=None,
    deterministic: bool = True,
):
    """Bare encoder-decoder (FlashT5Model, reference: modeling:520-602):
    returns dict(last_hidden_state, encoder_last_hidden_state) without the
    lm_head/loss."""
    r_enc = r_dec = None
    if rng is not None:
        r_enc, r_dec = jax.random.split(rng)
    enc = encode(config, params, input_ids, attention_mask,
                 rng=r_enc, deterministic=deterministic)
    dec = stack_apply(config, params["decoder"],
                      params["shared"]["embedding"], decoder_input_ids,
                      is_decoder=True,
                      attention_mask=decoder_attention_mask,
                      encoder_hidden_states=enc,
                      encoder_attention_mask=attention_mask,
                      rng=r_dec, deterministic=deterministic)
    return {"last_hidden_state": dec, "encoder_last_hidden_state": enc}


def greedy_generate(
    config: FlashT5Config,
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    max_length: int = 32,
) -> jnp.ndarray:
    """Reference-parity greedy decode WITHOUT KV cache (modeling:648-690):
    start token 0, stop on EOS 1, force final EOS, zero-pad after first EOS.
    Re-runs the decoder over the full prefix each step (the reference's exact
    behavior); the KV-cached engine lives in inference/generate.py.
    """
    return _generate(config, params, input_ids, attention_mask, max_length,
                     lambda rng, logits: jnp.argmax(logits, -1).astype(jnp.int32),
                     jax.random.PRNGKey(0))


def sample_generate(
    config: FlashT5Config,
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    max_length: int = 32,
    *,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Sampling decode with the same start-0 / EOS-1 / pad-after-EOS contract
    as greedy_generate (the reference ships greedy only; temperature/top-k/
    nucleus come from inference/sampling.py)."""
    from flasht5_tpu.inference.sampling import sample_token

    def select(step_rng, logits):
        return sample_token(step_rng, logits, temperature=temperature,
                            top_k=top_k, top_p=top_p)

    return _generate(config, params, input_ids, attention_mask, max_length,
                     select, rng)


def _generate(config, params, input_ids, attention_mask, max_length,
              select_fn, rng) -> jnp.ndarray:
    b = input_ids.shape[0]
    enc = encode(config, params, input_ids, attention_mask)

    labels0 = jnp.zeros((b, max_length + 1), jnp.int32)
    # position t generated at step t; buffer position 0 is the start token

    def cond(state):
        labels, t, done, rng = state
        return (t < max_length) & jnp.logical_not(done)

    def body(state):
        labels, t, done, rng = state
        rng, sub = jax.random.split(rng)
        out = forward(config, params,
                      attention_mask=attention_mask,
                      decoder_input_ids=labels[:, :-1],
                      encoder_hidden_states=enc)
        logits_t = jax.lax.dynamic_index_in_dim(out["logits"], t, axis=1,
                                                keepdims=False)
        nxt = select_fn(sub, logits_t)
        labels = jax.lax.dynamic_update_index_in_dim(labels, nxt, t + 1, axis=1)
        pos = jnp.arange(max_length + 1)[None, :]
        gen = (pos >= 1) & (pos <= t + 1)
        has_eos = jnp.any((labels == config.eos_token_id) & gen, axis=-1)
        return labels, t + 1, jnp.all(has_eos), rng

    labels, t_final, _, _ = jax.lax.while_loop(cond, body,
                                               (labels0, 0, False, rng))
    out_len = max_length + 1
    labels = labels.at[:, -1].set(jnp.where(t_final == max_length,
                                            config.eos_token_id,
                                            labels[:, -1]))
    # zero-out everything after the first EOS; force an EOS at the boundary
    is_eos = labels == config.eos_token_id
    first_eos = jnp.argmax(is_eos, axis=-1)
    has_eos = jnp.any(is_eos, axis=-1)
    first_eos = jnp.where(has_eos, first_eos, out_len - 1)
    pos = jnp.arange(out_len)[None, :]
    labels = jnp.where(pos <= first_eos[:, None], labels, 0)
    labels = jnp.where(pos == first_eos[:, None], config.eos_token_id, labels)
    return labels
