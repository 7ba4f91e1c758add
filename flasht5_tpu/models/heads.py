"""Task heads over the encoder-only trunk.

Re-implements the reference's custom heads (src/model/custom_heads_flash_t5.py):
token classification (:20-86), a tanh classification head (:89-113), sequence
classification with EOS-token pooling and problem-type-dispatched losses
(:116-220), and extractive QA with start/end logits (:223-314). All are
pure functions over param trees whose `encoder`/`shared` subtrees are the
same as the trunk's, so HF/FAT5 checkpoints load directly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5

Params = Dict[str, Any]


def _mean_ce(logits, labels, ignore_index=-100):
    """torch.nn.CrossEntropyLoss semantics: mean over non-ignored rows."""
    from flasht5_tpu.ops.cross_entropy import cross_entropy_loss_ref
    losses, _ = cross_entropy_loss_ref(logits, labels, ignore_index=ignore_index)
    n = jnp.maximum(jnp.sum(labels != ignore_index), 1)
    return jnp.sum(losses) / n


def _init_linear(rng, d_in, d_out, std, dtype=jnp.float32):
    return {
        "weight": (jax.random.normal(rng, (d_in, d_out), jnp.float32) * std).astype(dtype),
        "bias": jnp.zeros((d_out,), dtype),
    }


def _linear(p, x):
    return jnp.dot(x, p["weight"].astype(x.dtype)) + p["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Token classification (reference: custom_heads_flash_t5.py:20-86)
# ---------------------------------------------------------------------------

def init_token_classification_params(rng, config: FlashT5Config,
                                     num_labels: int) -> Params:
    k1, k2 = jax.random.split(rng)
    params = t5.init_encoder_params(k1, config)
    params["classifier"] = _init_linear(k2, config.d_model, num_labels,
                                        config.initializer_factor * 1.0)
    return params


def token_classification_forward(config: FlashT5Config, params: Params,
                                 input_ids, attention_mask=None, labels=None,
                                 *, classifier_dropout: float = 0.0,
                                 rng=None, deterministic=True):
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    h = t5.encode(config, params, input_ids, attention_mask,
                  rng=r1, deterministic=deterministic)
    h = t5._dropout(r2, classifier_dropout, h, deterministic)
    logits = _linear(params["classifier"], h)
    out = {"logits": logits}
    if labels is not None:
        out["loss"] = _mean_ce(logits.reshape(-1, logits.shape[-1]),
                               labels.reshape(-1))
    return out


# ---------------------------------------------------------------------------
# Sequence classification (reference: custom_heads_flash_t5.py:89-220)
# ---------------------------------------------------------------------------

def init_sequence_classification_params(rng, config: FlashT5Config,
                                        num_labels: int) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    params = t5.init_encoder_params(k1, config)
    std = config.initializer_factor * config.d_model ** -0.5
    params["classification_head"] = {
        "dense": _init_linear(k2, config.d_model, config.d_model, std),
        "out_proj": _init_linear(k3, config.d_model, num_labels, std),
    }
    return params


def _classification_head(p, x, *, dropout, rng, deterministic):
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    x = t5._dropout(r1, dropout, x, deterministic)
    x = jnp.tanh(_linear(p["dense"], x))
    x = t5._dropout(r2, dropout, x, deterministic)
    return _linear(p["out_proj"], x)


def sequence_classification_forward(config: FlashT5Config, params: Params,
                                    input_ids, attention_mask=None,
                                    labels=None, *, problem_type=None,
                                    num_labels=None,
                                    classifier_dropout: float = 0.0,
                                    rng=None, deterministic=True):
    """EOS-token pooling (the LAST eos position per row, reference :180-185).

    Unlike the reference's boolean fancy-indexing (which requires every row to
    carry the same number of EOS tokens), pooling here picks each row's last
    EOS occurrence with a static-shape argmax — same result on well-formed
    batches, XLA-compatible, and robust to ragged EOS counts.
    """
    r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    h = t5.encode(config, params, input_ids, attention_mask,
                  rng=r1, deterministic=deterministic)
    eos = input_ids == config.eos_token_id
    seq_len = input_ids.shape[1]
    # last EOS index per row (rows without EOS fall back to the last position)
    rev_idx = seq_len - 1 - jnp.argmax(eos[:, ::-1], axis=1)
    last = jnp.where(jnp.any(eos, axis=1), rev_idx, seq_len - 1)
    pooled = jnp.take_along_axis(h, last[:, None, None].repeat(h.shape[-1], -1),
                                 axis=1)[:, 0]
    logits = _classification_head(params["classification_head"], pooled,
                                  dropout=classifier_dropout, rng=r2,
                                  deterministic=deterministic)
    out = {"logits": logits}
    if labels is None:
        return out

    nl = num_labels if num_labels is not None else logits.shape[-1]
    if problem_type is None:
        if nl == 1:
            problem_type = "regression"
        elif jnp.issubdtype(labels.dtype, jnp.integer):
            problem_type = "single_label_classification"
        else:
            problem_type = "multi_label_classification"
    if problem_type == "regression":
        out["loss"] = jnp.mean((jnp.squeeze(logits) - jnp.squeeze(labels).astype(logits.dtype)) ** 2)
    elif problem_type == "single_label_classification":
        out["loss"] = _mean_ce(logits.reshape(-1, nl), labels.reshape(-1))
    elif problem_type == "multi_label_classification":
        z = logits.astype(jnp.float32)
        y = labels.astype(jnp.float32)
        out["loss"] = jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))
    else:
        raise ValueError(f"unknown problem_type {problem_type!r}")
    return out


# ---------------------------------------------------------------------------
# Question answering (reference: custom_heads_flash_t5.py:223-314)
# ---------------------------------------------------------------------------

def init_question_answering_params(rng, config: FlashT5Config) -> Params:
    k1, k2 = jax.random.split(rng)
    params = t5.init_encoder_params(k1, config)
    params["qa_outputs"] = _init_linear(k2, config.d_model, 2,
                                        config.initializer_factor * 1.0)
    return params


def question_answering_forward(config: FlashT5Config, params: Params,
                               input_ids, attention_mask=None,
                               start_positions=None, end_positions=None,
                               *, rng=None, deterministic=True):
    h = t5.encode(config, params, input_ids, attention_mask,
                  rng=rng, deterministic=deterministic)
    logits = _linear(params["qa_outputs"], h)          # (B, L, 2)
    start_logits = logits[..., 0]
    end_logits = logits[..., 1]
    out = {"start_logits": start_logits, "end_logits": end_logits}
    if start_positions is not None and end_positions is not None:
        seq_len = start_logits.shape[1]
        # positions outside the sequence are ignored (reference :290-296):
        # clamp to seq_len and treat it as the CE ignore index by padding one
        # extra logit column that rows never legitimately target.
        sp = jnp.clip(start_positions.reshape(-1), 0, seq_len)
        ep = jnp.clip(end_positions.reshape(-1), 0, seq_len)
        pad = jnp.full((start_logits.shape[0], 1), -1e9, start_logits.dtype)
        sl = jnp.concatenate([start_logits, pad], axis=1)
        el = jnp.concatenate([end_logits, pad], axis=1)
        sp = jnp.where(sp == seq_len, -100, sp)
        ep = jnp.where(ep == seq_len, -100, ep)
        out["loss"] = 0.5 * (_mean_ce(sl, sp) + _mean_ce(el, ep))
    return out
