"""Continuous-batching inference engine for encode+decode request mixes.

North-star component (BASELINE.json: "continuous batching of encode+decode
requests ... across hosts"); the reference has no serving layer at all.

TPU-native design constraints drive the architecture (SURVEY.md §7 hard
part #2): XLA wants static shapes, so the engine runs a fixed-size decode
slot pool — `max_slots` sequences decode in lockstep with per-slot state
(position, done flag) — and admits new requests by (a) running a bucketed
encoder prefill (padded to the nearest bucket length, compiled once per
bucket) and (b) writing the new sequence's cross K/V and reset self K/V into
a free slot with `dynamic_update_slice`. One compiled `decode_step` serves
every mix of in-flight sequences; finished slots are harvested and refilled
between steps. This is the slot-based continuous batching used by production
TPU servers, as opposed to the GPU-style fully dynamic batching the XLA
compilation model penalizes.

The per-step host<->device control flow is a single scalar sync (the set of
finished slots), keeping the loop latency at one tunnel round-trip.
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import kv_cache
from flasht5_tpu.models import t5
from flasht5_tpu.ops.quant import dequantize_kv, quantize_kv


@dataclasses.dataclass
class Request:
    uid: int
    input_ids: np.ndarray           # (L,) int32
    max_new_tokens: int = 32
    result: Optional[np.ndarray] = None  # filled when finished
    # speculative drafts (spec_window engines) look up bigrams in this
    # sequence instead of input_ids when set — e.g. a retrieved document or
    # a cheap draft-model output; purely a speed hint, never changes tokens
    draft_source: Optional[np.ndarray] = None
    # load-generation / observability fields (all host wall-clock seconds):
    arrival_s: float = 0.0          # earliest admit time relative to run start
    admitted_at: Optional[float] = None     # when the prefill+insert happened
    first_token_at: Optional[float] = None  # when the first token reached host
    finished_at: Optional[float] = None     # when .result was materialized


@dataclasses.dataclass
class EngineConfig:
    max_slots: int = 8               # concurrent decoding sequences
    max_decode_len: int = 64         # self-KV capacity per slot
    max_encode_len: int = 512        # cross-KV capacity per slot
    encode_buckets: Tuple[int, ...] = (64, 128, 256, 512)
    kv_dtype: str = "native"         # "native" | "int8" (quantized caches)
    # Decode steps executed on-device per host synchronization (lax.scan
    # window). Each sync is a host round-trip; with remote/tunneled TPUs a
    # round-trip costs ~25ms, so windows of 8-16 amortize it. Finished slots
    # idle until the window ends (bounded over-decode, masked on harvest).
    steps_per_sync: int = 8
    # Use the fused Pallas decode-attention kernel (ops/decode_attention.py)
    # instead of the jnp dequant+einsum path. Default OFF on measurement, not
    # neglect: XLA lowers the batched single-query einsum to VPU
    # multiply+sublane-reduce and sits at the cache-read roofline (~180us
    # above the dispatch floor at 64 slots x 2048), while any MXU
    # formulation of M=1 attention pays an H-fold flop overshoot
    # (docs/decode_crossover.json, measured both kernel generations). The
    # kernel stays for A/B and for the paged engine, where page-table
    # indirection has no efficient XLA form.
    use_decode_kernel: bool = False
    # Sampling (inference/sampling.py): temperature <= 0 -> greedy argmax
    # (the reference generate's behavior, modeling_flash_t5.py:677);
    # temperature > 0 -> categorical draw with optional top-k / nucleus.
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    sample_seed: int = 0
    # Speculative decoding (>=2 enables): each device "step" becomes a
    # Q-token verify window per slot — prompt-lookup bigram drafts from the
    # request's own input ids, accepted by the slot's argmax chain
    # (token-exact vs the standard greedy path; see inference/speculative.py
    # for the single-stream form and docs/spec_decode.json for the window
    # cost measurements). Greedy-only (temperature must be 0), plain
    # engine only this round (no tp/shard_map), XLA attention path
    # (use_decode_kernel must be off — the fused kernel is single-query).
    spec_window: int = 0


class KVTensor(typing.NamedTuple):
    """(values, scales) cache tensor; scales None for native dtype.

    INT8 layout (north-star): values (B,H,L,D) int8 + per-(slot,head,pos)
    fp32 scales (B,H,L,1). HBM decode reads shrink 2-4x vs bf16/fp32 —
    decode is bandwidth-bound, so this is directly TTFT/throughput.
    """
    values: jnp.ndarray
    scales: Optional[jnp.ndarray] = None


def _kv_read(kv: KVTensor, dtype=jnp.float32) -> jnp.ndarray:
    if kv.scales is None:
        return kv.values.astype(dtype)
    return dequantize_kv(kv.values, kv.scales, dtype)


def _kv_make(x: jnp.ndarray, quantized: bool) -> KVTensor:
    if not quantized:
        return KVTensor(x)
    q, sc = quantize_kv(x)
    return KVTensor(q, sc)


class BatchState:
    """Device-side slot pool: shared KV caches + per-slot scalars."""

    def __init__(self, config: FlashT5Config, params, ecfg: EngineConfig):
        b, h, dkv = ecfg.max_slots, config.num_heads, config.d_kv
        quant = ecfg.kv_dtype == "int8"
        dt = jnp.int8 if quant else jnp.dtype(config.dtype)
        n_layers = len(params["decoder"]["block"])

        def kv(length):
            vals = jnp.zeros((b, h, length, dkv), dt)
            scales = jnp.zeros((b, h, length, 1), jnp.float32) if quant else None
            return KVTensor(vals, scales)

        self.layers = tuple(
            kv_cache.LayerCache(
                self_k=kv(ecfg.max_decode_len),
                self_v=kv(ecfg.max_decode_len),
                cross_k=kv(ecfg.max_encode_len),
                cross_v=kv(ecfg.max_encode_len),
            ) for _ in range(n_layers))
        self.enc_len = jnp.zeros((b,), jnp.int32)        # valid cross positions
        self.pos = jnp.zeros((b,), jnp.int32)            # next decode position
        self.cur_token = jnp.zeros((b,), jnp.int32)      # last emitted token
        self.active = jnp.zeros((b,), jnp.bool_)
        self.budget = jnp.zeros((b,), jnp.int32)         # remaining new tokens
        # token before cur_token (speculative bigram lookup; unused and
        # unsharded on the standard / sharded paths)
        self.prev_token = jnp.zeros((b,), jnp.int32)


class InferenceEngine:
    """Greedy continuous-batching engine over a slot pool.

    Usage:
        engine = InferenceEngine(config, params, EngineConfig(...))
        results = engine.run(requests)   # list of np token arrays per request
    """

    def __init__(self, config: FlashT5Config, params, ecfg: EngineConfig):
        self.config = config
        self.params = params
        self.ecfg = ecfg
        self.state = BatchState(config, params, ecfg)
        self._encode_fns: Dict[int, Callable] = {}
        self._step_fn = jax.jit(self._make_step())
        # donate the engine state (KV pools dominate serving HBM): without
        # donation XLA holds input AND output copies of the caches across
        # every window call, doubling peak memory at exactly the slot
        # counts where capacity is the product
        self._multi_step_fn = jax.jit(self._make_multi_step(),
                                      donate_argnums=(1, 2, 3, 4, 5, 6, 7))
        self._insert_fn = jax.jit(self._make_insert(),
                                  donate_argnums=(0, 1, 2, 3, 4, 5))
        self._sample_rng = jax.random.PRNGKey(ecfg.sample_seed)
        if ecfg.spec_window >= 2:
            self._spec_multi_fn = jax.jit(
                self._make_spec_multi(),
                donate_argnums=(1, 2, 3, 4, 5, 6, 7))
            # windows: device window dispatches that had any active slot;
            # slot_windows: (window, active slot) pairs — tokens /
            # slot_windows is the per-slot tokens-per-window acceptance
            self.spec_stats = {"windows": 0, "tokens": 0, "slot_windows": 0}

    # -- prefill -----------------------------------------------------------

    def _bucket_for(self, length: int) -> int:
        for b in self.ecfg.encode_buckets:
            if length <= b:
                return b
        return self.ecfg.encode_buckets[-1]

    def _prefill_batch(self, n: int) -> int:
        """Round a prefill batch up to a power of two (bounds the number of
        compiled encode variants at log2(max_slots) per bucket)."""
        b = 1
        while b < n:
            b *= 2
        return min(b, max(1, self.ecfg.max_slots))

    def _encode_fn(self, bucket: int, nb: int = 1) -> Callable:
        """Batched prefill: encode `nb` sequences of `bucket` length in ONE
        call and return per-layer cross K/V with leading dim nb. Batching the
        prefills of all waiting requests removes the per-request encode
        round-trips that serialized admission (VERDICT r2 weak #4)."""
        key = (bucket, nb)
        if key not in self._encode_fns:
            config = self.config

            def run(params, ids):
                enc = t5.encode(config, params, ids)
                # per-layer cross K/V for these sequences (head count from
                # the — possibly tensor-sharded — projection itself)
                outs = []
                for blk in params["decoder"]["block"]:
                    ca = blk["cross_attention_layer"]["cross_attention"]
                    h = ca["Wk"].shape[1] // config.d_kv
                    outs.append((
                        kv_cache._proj_heads(enc, ca["Wk"], h, config.d_kv),
                        kv_cache._proj_heads(enc, ca["Wv"], h, config.d_kv),
                    ))
                return outs

            self._encode_fns[key] = jax.jit(run)
        return self._encode_fns[key]

    def _make_insert(self):
        """Write one prefilled sequence into slot `slot` and reset it."""
        ecfg = self.ecfg

        quant = ecfg.kv_dtype == "int8"

        def put(kv: KVTensor, new: KVTensor, slot) -> KVTensor:
            vals = jax.lax.dynamic_update_slice(
                kv.values, new.values.astype(kv.values.dtype), (slot, 0, 0, 0))
            scales = kv.scales
            if scales is not None:
                scales = jax.lax.dynamic_update_slice(
                    scales, new.scales, (slot, 0, 0, 0))
            return KVTensor(vals, scales)

        def zero_slot(kv: KVTensor, slot) -> KVTensor:
            z = KVTensor(jnp.zeros_like(kv.values[0:1]),
                         None if kv.scales is None
                         else jnp.zeros_like(kv.scales[0:1]))
            return put(kv, z, slot)

        def insert(layers, enc_len, pos, cur_token, active, budget,
                   cross_kvs, row_idx, slot, true_len, max_new):
            """cross_kvs rows come from a BATCHED prefill; row_idx (traced)
            selects this request's row inside the jit — slicing outside would
            cost ~2·n_layers tiny dispatches per admission (ruinous through
            the tunnel)."""
            new_layers = []
            for cache, (ckb, cvb) in zip(layers, cross_kvs):
                ck = jax.lax.dynamic_slice_in_dim(ckb, row_idx, 1, 0)
                cv = jax.lax.dynamic_slice_in_dim(cvb, row_idx, 1, 0)
                pad = ecfg.max_encode_len - ck.shape[2]
                ckp = jnp.pad(ck, ((0, 0), (0, 0), (0, pad), (0, 0)))
                cvp = jnp.pad(cv, ((0, 0), (0, 0), (0, pad), (0, 0)))
                cross_k = put(cache.cross_k, _kv_make(ckp, quant), slot)
                cross_v = put(cache.cross_v, _kv_make(cvp, quant), slot)
                self_k = zero_slot(cache.self_k, slot)
                self_v = zero_slot(cache.self_v, slot)
                new_layers.append(kv_cache.LayerCache(self_k, self_v,
                                                      cross_k, cross_v))
            enc_len = enc_len.at[slot].set(true_len)
            pos = pos.at[slot].set(0)
            cur_token = cur_token.at[slot].set(0)  # decoder start token
            active = active.at[slot].set(True)
            budget = budget.at[slot].set(max_new)
            return tuple(new_layers), enc_len, pos, cur_token, active, budget

        return insert

    # -- decode ------------------------------------------------------------

    def _make_step(self, with_logits: bool = False):
        """with_logits=True builds the probe variant that also returns the
        full next-token logits (used by drift tests / quality probes; the
        production multi-step scan doesn't carry the (B, V) logits)."""
        config, ecfg = self.config, self.ecfg

        def step(params, layers, enc_len, pos, cur_token, active, budget,
                 rng):
            """One lockstep decode step for all slots (inactive slots run too
            — their outputs are masked; static shapes keep XLA happy).

            Shard-oblivious: slot count comes from the state (local slots
            under a data-sharded pool), head counts from the (possibly
            tensor-sharded) projections; with config.tp_axis set the
            o-projections reduce across tensor shards (blocking psum or the
            ring matmul_reducescatter via use_collective_matmul) and the
            next token comes from the vocab-parallel argmax/sample."""
            b = cur_token.shape[0]
            dkv = config.d_kv
            tp = config.tp_axis
            emb = params["shared"]["embedding"]
            x = jnp.take(emb, cur_token, axis=0).astype(
                jnp.dtype(config.dtype))[:, None, :]

            kpos = jnp.arange(ecfg.max_decode_len, dtype=jnp.int32)
            self_valid = kpos[None, :] <= pos[:, None]         # (B, L)
            cpos = jnp.arange(ecfg.max_encode_len, dtype=jnp.int32)
            cross_valid = cpos[None, :] < enc_len[:, None]

            new_layers = []
            self_bias = None
            for li, blk in enumerate(params["decoder"]["block"]):
                cache = layers[li]
                sa = blk["self_attention_layer"]["self_attention"]
                h = sa["Wq"].shape[1] // dkv
                normed = t5._layer_norm(
                    config, blk["self_attention_layer"]["layer_norm"]["weight"], x)
                q = kv_cache._proj_heads(normed, sa["Wq"], h, dkv)
                k_new = kv_cache._proj_heads(normed, sa["Wk"], h, dkv)
                v_new = kv_cache._proj_heads(normed, sa["Wv"], h, dkv)

                # per-slot scatter of the new K/V at each slot's position;
                # positions are zeroed at insert, so masked add == scatter
                # (works for int8 values and fp32 scales alike)
                oh = kpos[None, :] == pos[:, None]
                ohm = oh[:, None, :, None]

                def scatter(kv, new):
                    newq = _kv_make(new, kv.scales is not None)
                    vals = kv.values + jnp.where(
                        ohm, newq.values.astype(kv.values.dtype), 0)
                    scales = kv.scales
                    if scales is not None:
                        scales = scales + jnp.where(ohm[..., :1], newq.scales, 0.0)
                    return KVTensor(vals, scales)

                self_k = scatter(cache.self_k, k_new)
                self_v = scatter(cache.self_v, v_new)

                if li == 0 and config.position_encoding_type == "t5":
                    pe = sa.get("pe_encoding")
                    # per-slot bias row: bucket(k - pos_slot) -> (B,H,1,L)
                    rel = kpos[None, :] - pos[:, None]
                    from flasht5_tpu.positional import relative_position_bucket
                    buckets = relative_position_bucket(
                        rel, bidirectional=False,
                        num_buckets=config.relative_attention_num_buckets,
                        max_distance=config.relative_attention_max_distance)
                    vals = jnp.take(pe["relative_attention_bias"], buckets,
                                    axis=0)                    # (B, L, H)
                    self_bias = jnp.transpose(vals, (0, 2, 1))[:, :, None, :]

                if ecfg.use_decode_kernel:
                    from flasht5_tpu.ops.decode_attention import decode_attention
                    attn = decode_attention(
                        q[:, :, 0], self_k.values, self_v.values,
                        k_scales=self_k.scales, v_scales=self_v.scales,
                        lengths=pos + 1,
                        bias=(None if self_bias is None
                              else self_bias[:, :, 0].astype(jnp.float32)),
                        sm_scale=config.softmax_scale)
                    attn = attn.reshape(b, 1, h * dkv)
                else:
                    s = jnp.einsum("bhqd,bhnd->bhqn", q.astype(jnp.float32),
                                   _kv_read(self_k)) * config.softmax_scale
                    if self_bias is not None:
                        s = s + self_bias.astype(jnp.float32)
                    s = jnp.where(self_valid[:, None, None, :], s, -1e30)
                    p = jax.nn.softmax(s, axis=-1)
                    attn = jnp.einsum("bhqn,bhnd->bhqd", p,
                                      _kv_read(self_v)).astype(x.dtype)
                    attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, 1, h * dkv)
                if tp is not None:
                    x = x + t5._row_parallel_matmul(config, attn, sa["o"])
                else:
                    x = x + t5._matmul(attn, sa["o"])

                ca = blk["cross_attention_layer"]["cross_attention"]
                normed = t5._layer_norm(
                    config, blk["cross_attention_layer"]["layer_norm"]["weight"], x)
                qc = kv_cache._proj_heads(normed, ca["Wq"], h, dkv)
                if ecfg.use_decode_kernel:
                    from flasht5_tpu.ops.decode_attention import decode_attention
                    attn = decode_attention(
                        qc[:, :, 0], cache.cross_k.values, cache.cross_v.values,
                        k_scales=cache.cross_k.scales,
                        v_scales=cache.cross_v.scales,
                        lengths=enc_len,
                        sm_scale=config.softmax_scale)[:, None]
                    attn = attn.reshape(b, 1, h * dkv)
                else:
                    s = jnp.einsum("bhqd,bhnd->bhqn", qc.astype(jnp.float32),
                                   _kv_read(cache.cross_k)) * config.softmax_scale
                    s = jnp.where(cross_valid[:, None, None, :], s, -1e30)
                    p = jax.nn.softmax(s, axis=-1)
                    attn = jnp.einsum("bhqn,bhnd->bhqd", p,
                                      _kv_read(cache.cross_v)).astype(x.dtype)
                    attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, 1, h * dkv)
                if tp is not None:
                    x = x + t5._row_parallel_matmul(config, attn, ca["o"])
                else:
                    x = x + t5._matmul(attn, ca["o"])

                x = t5._ff(config, blk["ff_layer"], x, rng=None,
                           deterministic=True)
                new_layers.append(cache._replace(self_k=self_k, self_v=self_v))

            x = t5._layer_norm(config,
                               params["decoder"]["final_layer_norm"]["weight"], x)
            if config.tie_word_embeddings:
                logits = jnp.dot(x, emb.T.astype(x.dtype))
            else:
                logits = t5._matmul(x, params["lm_head"])
            if tp is not None and not config.tie_word_embeddings:
                # vocab-parallel next token: never materialize full logits
                # unless sampling needs the full distribution
                from flasht5_tpu.parallel.vocab_parallel import (
                    vocab_parallel_next_token)
                nxt = vocab_parallel_next_token(
                    logits[:, 0], tp, rng=rng, temperature=ecfg.temperature,
                    top_k=ecfg.top_k, top_p=ecfg.top_p)
            elif ecfg.temperature > 0.0:
                from flasht5_tpu.inference.sampling import sample_token
                nxt = sample_token(rng, logits[:, 0],
                                   temperature=ecfg.temperature,
                                   top_k=ecfg.top_k, top_p=ecfg.top_p)
            else:
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)

            budget = jnp.where(active, budget - 1, budget)
            hit_eos = nxt == config.eos_token_id
            out_of_room = (pos + 1 >= ecfg.max_decode_len) | (budget <= 0)
            finished = active & (hit_eos | out_of_room)
            cur_token = jnp.where(active, nxt, cur_token)
            pos = jnp.where(active, pos + 1, pos)
            active = active & ~finished
            out = (tuple(new_layers), enc_len, pos, cur_token, active,
                   budget, nxt, finished)
            if with_logits:
                return out + (logits[:, 0],)
            return out

        return step

    def probe_step(self, token_override=None):
        """One decode step that also returns the (B, V) logits; optionally
        overrides cur_token first (teacher forcing for drift measurements).
        Mutates self.state like a normal step."""
        if not hasattr(self, "_probe_fn"):
            self._probe_fn = jax.jit(self._make_step(with_logits=True))
        st = self.state
        cur = st.cur_token if token_override is None else jnp.asarray(
            token_override, jnp.int32)
        self._sample_rng, sub = jax.random.split(self._sample_rng)
        (st.layers, st.enc_len, st.pos, cur_token, st.active, st.budget,
         nxt, finished, logits) = self._probe_fn(
            self.params, st.layers, st.enc_len, st.pos, cur,
            st.active, st.budget, sub)
        st.cur_token = cur_token
        return np.asarray(nxt), np.asarray(logits)

    def _make_multi_step(self):
        step = self._make_step()
        k = self.ecfg.steps_per_sync

        def multi(params, layers, enc_len, pos, cur_token, active, budget,
                  rng):
            def body(carry, _):
                layers, enc_len, pos, cur_token, active, budget, rng = carry
                was_active = active
                rng, sub = jax.random.split(rng)
                (layers, enc_len, pos, cur_token, active, budget, nxt,
                 finished) = step(params, layers, enc_len, pos, cur_token,
                                  active, budget, sub)
                return ((layers, enc_len, pos, cur_token, active, budget,
                         rng), (nxt, finished, was_active))

            carry, (toks, fins, actives) = jax.lax.scan(
                body, (layers, enc_len, pos, cur_token, active, budget, rng),
                None, length=k)
            return carry[:-1], carry[-1], toks, fins, actives   # (k, B) each

        return multi

    # -- speculative decode (spec_window >= 2) -----------------------------

    def _make_spec_step(self):
        """Per-slot Q-token verify window (speculative decoding inside the
        slot engine). Every slot drafts `Q-1` tokens by bigram lookup in its
        own encoder input, runs them through one Q-row decode window (causal
        within the window, per-slot per-row T5 bias), and accepts the
        longest prefix its argmax chain confirms plus one bonus token —
        token-exact vs the standard greedy step at any acceptance rate
        (tests/test_engine_spec.py). Unlike the generate-level form
        (inference/speculative.py), acceptance is PER SLOT: each slot's
        `pos` advances by its own accepted count.

        KV writes are masked OVERWRITES of the window rows (the standard
        step's add-scatter assumes untouched rows are zero; rollback leaves
        stale non-zero rows that the next window must be able to rewrite),
        so a slot must be decoded exclusively by this step once admitted.
        """
        config, ecfg = self.config, self.ecfg
        q_len = ecfg.spec_window
        n_draft = q_len - 1
        quant = ecfg.kv_dtype == "int8"
        assert q_len >= 2
        assert ecfg.temperature <= 0.0, "speculative decode is greedy-only"
        assert not ecfg.use_decode_kernel, \
            "fused decode kernel is single-query; disable for spec_window"
        assert config.tp_axis is None, \
            "spec_window is plain-engine only this round"

        def step(params, layers, enc_len, pos, cur_token, prev_token,
                 active, budget, draft_src):
            b = cur_token.shape[0]
            dkv = config.d_kv
            emb = params["shared"]["embedding"]
            L = ecfg.max_decode_len
            kpos = jnp.arange(L, dtype=jnp.int32)

            # ---- per-slot prompt-lookup drafts ----
            s_len = draft_src.shape[1]
            prev_eff = jnp.where(pos == 0, -2, prev_token)
            prev_src = jnp.pad(draft_src[:, :-1], ((0, 0), (1, 0)),
                               constant_values=-1)
            match = ((draft_src == cur_token[:, None])
                     & (prev_src == prev_eff[:, None]))
            j_ar = jnp.arange(s_len, dtype=jnp.int32)[None, :]
            j_star = jnp.max(jnp.where(match, j_ar, -1), axis=-1)
            src_pad = jnp.pad(draft_src, ((0, 0), (0, n_draft)))
            idx = (j_star[:, None] + 1
                   + jnp.arange(n_draft, dtype=jnp.int32)[None, :])
            idx = jnp.clip(idx, 0, src_pad.shape[1] - 1)
            draft = jnp.take_along_axis(src_pad, idx, axis=1)
            draft = jnp.where((j_star >= 0)[:, None], draft, 0)
            w_in = jnp.concatenate([cur_token[:, None], draft], axis=1)

            x = jnp.take(emb, w_in, axis=0).astype(jnp.dtype(config.dtype))

            q_pos = pos[:, None] + jnp.arange(q_len, dtype=jnp.int32)[None]
            self_valid = kpos[None, None, :] <= q_pos[:, :, None]  # (B,Q,L)
            cpos = jnp.arange(ecfg.max_encode_len, dtype=jnp.int32)
            cross_valid = cpos[None, :] < enc_len[:, None]          # (B,N)

            # window-row overwrite helpers: target rows pos..pos+Q-1
            in_win = (kpos[None, :] >= pos[:, None]) & (
                kpos[None, :] < pos[:, None] + q_len)               # (B,L)
            row_idx = jnp.clip(kpos[None, :] - pos[:, None], 0, q_len - 1)

            def scatter_win(kv: KVTensor, new: jnp.ndarray) -> KVTensor:
                newq = _kv_make(new, quant)                    # (B,H,Q,D)
                gathered = jnp.take_along_axis(
                    newq.values, row_idx[:, None, :, None], axis=2)
                vals = jnp.where(in_win[:, None, :, None],
                                 gathered.astype(kv.values.dtype), kv.values)
                scales = kv.scales
                if scales is not None:
                    gsc = jnp.take_along_axis(
                        newq.scales, row_idx[:, None, :, None], axis=2)
                    scales = jnp.where(in_win[:, None, :, None], gsc, scales)
                return KVTensor(vals, scales)

            new_layers = []
            self_bias = None
            for li, blk in enumerate(params["decoder"]["block"]):
                cache = layers[li]
                sa = blk["self_attention_layer"]["self_attention"]
                h = sa["Wq"].shape[1] // dkv
                normed = t5._layer_norm(
                    config,
                    blk["self_attention_layer"]["layer_norm"]["weight"], x)
                qh = kv_cache._proj_heads(normed, sa["Wq"], h, dkv)
                k_new = kv_cache._proj_heads(normed, sa["Wk"], h, dkv)
                v_new = kv_cache._proj_heads(normed, sa["Wv"], h, dkv)

                self_k = scatter_win(cache.self_k, k_new)
                self_v = scatter_win(cache.self_v, v_new)

                if li == 0 and config.position_encoding_type == "t5":
                    pe = sa.get("pe_encoding")
                    rel = kpos[None, None, :] - q_pos[:, :, None]   # (B,Q,L)
                    from flasht5_tpu.positional import relative_position_bucket
                    buckets = relative_position_bucket(
                        rel, bidirectional=False,
                        num_buckets=config.relative_attention_num_buckets,
                        max_distance=config.relative_attention_max_distance)
                    vals = jnp.take(pe["relative_attention_bias"], buckets,
                                    axis=0)                     # (B,Q,L,H)
                    self_bias = jnp.transpose(vals, (0, 3, 1, 2))

                s = jnp.einsum("bhqd,bhnd->bhqn", qh.astype(jnp.float32),
                               _kv_read(self_k)) * config.softmax_scale
                if self_bias is not None:
                    s = s + self_bias.astype(jnp.float32)
                s = jnp.where(self_valid[:, None], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                attn = jnp.einsum("bhqn,bhnd->bhqd", p,
                                  _kv_read(self_v)).astype(x.dtype)
                attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(
                    b, q_len, h * dkv)
                x = x + t5._matmul(attn, sa["o"])

                ca = blk["cross_attention_layer"]["cross_attention"]
                normed = t5._layer_norm(
                    config,
                    blk["cross_attention_layer"]["layer_norm"]["weight"], x)
                qc = kv_cache._proj_heads(normed, ca["Wq"], h, dkv)
                s = jnp.einsum("bhqd,bhnd->bhqn", qc.astype(jnp.float32),
                               _kv_read(cache.cross_k)) * config.softmax_scale
                s = jnp.where(cross_valid[:, None, None, :], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                attn = jnp.einsum("bhqn,bhnd->bhqd", p,
                                  _kv_read(cache.cross_v)).astype(x.dtype)
                attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(
                    b, q_len, h * dkv)
                x = x + t5._matmul(attn, ca["o"])

                x = t5._ff(config, blk["ff_layer"], x, rng=None,
                           deterministic=True)
                new_layers.append(cache._replace(self_k=self_k,
                                                 self_v=self_v))

            x = t5._layer_norm(
                config, params["decoder"]["final_layer_norm"]["weight"], x)
            if config.tie_word_embeddings:
                logits = jnp.dot(x, emb.T.astype(x.dtype))
            else:
                logits = t5._matmul(x, params["lm_head"])
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # (B, Q)

            # ---- acceptance, clipped to budget, stopped at first EOS ----
            ok = jnp.cumprod((draft == g[:, :-1]).astype(jnp.int32), axis=1)
            n_emit = jnp.sum(ok, axis=1) + 1                    # (B,)
            n_emit = jnp.minimum(n_emit, jnp.maximum(budget, 1))
            within = jnp.arange(q_len)[None, :] < n_emit[:, None]
            eos_in = (g == config.eos_token_id) & within
            has_eos = jnp.any(eos_in, axis=-1)
            first_eos = jnp.argmax(eos_in, axis=-1)
            n_eff = jnp.where(has_eos, first_eos + 1, n_emit)
            n_eff = jnp.where(active, n_eff, 0)

            budget = jnp.where(active, budget - n_eff, budget)
            new_pos = pos + n_eff
            last = jnp.take_along_axis(
                g, jnp.maximum(n_eff - 1, 0)[:, None], axis=1)[:, 0]
            new_cur = jnp.where(active & (n_eff > 0), last, cur_token)
            # token before new_cur: g[n_eff-2] if >=2 accepted, else cur
            prev2 = jnp.take_along_axis(
                g, jnp.maximum(n_eff - 2, 0)[:, None], axis=1)[:, 0]
            new_prev = jnp.where(
                active & (n_eff >= 2), prev2,
                jnp.where(active & (n_eff == 1), cur_token, prev_token))

            out_of_room = (new_pos + 1 >= L) | (budget <= 0)
            finished = active & (has_eos | out_of_room)
            pos = jnp.where(active, new_pos, pos)
            cur_token = new_cur
            prev_token = new_prev
            active = active & ~finished
            return (tuple(new_layers), enc_len, pos, cur_token, prev_token,
                    active, budget, g, n_eff, finished)

        return step

    def _make_spec_multi(self):
        step = self._make_spec_step()
        k = self.ecfg.steps_per_sync

        def multi(params, layers, enc_len, pos, cur_token, prev_token,
                  active, budget, draft_src):
            def body(carry, _):
                (layers, enc_len, pos, cur_token, prev_token, active,
                 budget) = carry
                was_active = active
                (layers, enc_len, pos, cur_token, prev_token, active,
                 budget, g, n_eff, finished) = step(
                    params, layers, enc_len, pos, cur_token, prev_token,
                    active, budget, draft_src)
                return ((layers, enc_len, pos, cur_token, prev_token,
                         active, budget), (g, n_eff, finished, was_active))

            carry, (toks, n_effs, fins, actives) = jax.lax.scan(
                body,
                (layers, enc_len, pos, cur_token, prev_token, active,
                 budget), None, length=k)
            # toks (k,B,Q); n_effs/fins/actives (k,B)
            return carry, toks, n_effs, fins, actives

        return multi

    def warmup(self, buckets=None) -> None:
        """Compile every prefill variant (all power-of-two batch sizes per
        bucket) plus the decode window, so first-request latency under load
        measures serving, not compilation."""
        buckets = buckets or self.ecfg.encode_buckets
        st = self.state
        for bucket in buckets:
            nb = self._prefill_batch(1)
            while True:
                fn = self._encode_fn(bucket, nb)
                cross = fn(self.params, jnp.zeros((nb, bucket), jnp.int32))
                # compile the per-nb insert variant too. The state buffers
                # are DONATED, so the warm insert's outputs must replace
                # self.state (the fake slot-0 request is overwritten by the
                # first real admission)
                out = self._insert_fn(st.layers, st.enc_len, st.pos,
                                      st.cur_token, st.active, st.budget,
                                      cross, 0, 0, bucket, 1)
                (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
                 st.budget) = out
                jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
                if nb >= self._prefill_batch(self.ecfg.max_slots):
                    break
                nb *= 2
        st = self.state
        if self.ecfg.spec_window >= 2:
            draft0 = jnp.zeros((self.ecfg.max_slots,
                                self.ecfg.max_encode_len), jnp.int32)
            carry, toks, n_effs, fins, actives = self._spec_multi_fn(
                self.params, st.layers, st.enc_len, st.pos, st.cur_token,
                st.prev_token, st.active, st.budget, draft0)
            (st.layers, st.enc_len, st.pos, st.cur_token, st.prev_token,
             st.active, st.budget) = carry
            np.asarray(toks)
        else:
            self._sample_rng, sub = jax.random.split(self._sample_rng)
            out = self._multi_step_fn(self.params, st.layers, st.enc_len,
                                      st.pos, st.cur_token, st.active,
                                      st.budget, sub)
            (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
             st.budget) = out[0]
            self._sample_rng = out[1]
            np.asarray(out[2])  # force completion (block_until_ready can be
            # a dispatch-only no-op on tunneled backends)
        # park the warmup's fake request so the next run starts quiescent
        st.active = jnp.zeros_like(st.active)

    def admit_request(self, req: Request, slot: int) -> None:
        """Prefill + insert one request into `slot` without running the
        scheduler loop (probe/test helper; pairs with probe_step)."""
        L = min(len(req.input_ids), self.ecfg.max_encode_len)
        bucket = self._bucket_for(L)
        nb = self._prefill_batch(1)   # sharded engines floor this at `data`
        padded = np.zeros((nb, bucket), np.int32)
        padded[0, :L] = req.input_ids[:L]
        cross = self._encode_fn(bucket, nb)(self.params, jnp.asarray(padded))
        st = self.state
        out = self._insert_fn(
            st.layers, st.enc_len, st.pos, st.cur_token, st.active,
            st.budget, cross, 0, slot, bucket,
            min(req.max_new_tokens, self.ecfg.max_decode_len - 1))
        (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
         st.budget) = out

    # -- host-side scheduler ----------------------------------------------
    #
    # Adaptive double-buffered dispatch. When the host-side budget arithmetic
    # says more decode windows are needed after the in-flight one, the next
    # window is dispatched BEFORE fetching the in-flight window's outputs, so
    # the host round-trip (≈25ms through the tunnel) overlaps device compute
    # instead of serializing with it — this is what makes short windows
    # (which bound a queued request's time-to-first-token) stop costing
    # throughput. When the in-flight window will finish everything currently
    # running (e.g. one window covers a whole generation), the scheduler
    # harvests synchronously instead — pipelining there would only append a
    # fully-idle window and double single-request latency. Early EOS makes
    # the budget arithmetic an overestimate; the cost is one speculative
    # window of masked idle steps, never a correctness issue.

    def run(self, requests: List[Request],
            now: Callable[[], float] = None) -> List[Request]:
        """Serve all requests to completion; returns them with .result set
        (token array WITHOUT the leading start token, EOS-terminated).

        Requests with arrival_s > 0 become visible to the scheduler only once
        that much wall-clock time has elapsed since run() started (load-test
        support: admission under load, mid-stream). admitted_at /
        first_token_at / finished_at are stamped in the same clock.
        """
        import time as _time
        now = now or _time.perf_counter
        t0 = now()
        waiting = sorted(requests, key=lambda r: r.arrival_s)
        queue: List[Request] = []
        slots: List[Optional[Request]] = [None] * self.ecfg.max_slots
        emitted: List[List[int]] = [[] for _ in range(self.ecfg.max_slots)]
        limits: List[int] = [0] * self.ecfg.max_slots   # per-slot token caps
        st = self.state
        k_window = self.ecfg.steps_per_sync
        spec = self.ecfg.spec_window >= 2
        # speculative draft sources: each slot's own input ids (host-built,
        # shipped with every window dispatch — 4*B*max_enc bytes, trivial)
        draft_host = (np.zeros((self.ecfg.max_slots,
                                self.ecfg.max_encode_len), np.int32)
                      if spec else None)
        # max tokens one dispatched window can emit per slot
        window_credit = k_window * (self.ecfg.spec_window if spec else 1)

        def refresh_queue():
            t = now() - t0
            while waiting and waiting[0].arrival_s <= t:
                queue.append(waiting.pop(0))

        def admit():
            nonlocal st
            refresh_queue()
            free = [i for i, s in enumerate(slots) if s is None]
            if not free or not queue:
                return
            take = queue[: len(free)]
            del queue[: len(take)]
            by_bucket: Dict[int, list] = {}
            for req in take:
                L = min(len(req.input_ids), self.ecfg.max_encode_len)
                by_bucket.setdefault(self._bucket_for(L), []).append((req, L))
            for bucket, items in by_bucket.items():
                # ONE batched encode for every same-bucket waiting request
                nb = self._prefill_batch(len(items))
                padded = np.zeros((nb, bucket), np.int32)
                for j, (req, L) in enumerate(items):
                    padded[j, :L] = req.input_ids[:L]
                cross = self._encode_fn(bucket, nb)(self.params,
                                                    jnp.asarray(padded))
                for j, (req, L) in enumerate(items):
                    i = free.pop(0)
                    # parity with the reference's no-masking cross-attention
                    # (modeling_flash_t5.py:266-270 applies masks only via
                    # use_masking): attend the full padded bucket, exactly
                    # what a bucketed generate() sees.
                    out = self._insert_fn(
                        st.layers, st.enc_len, st.pos, st.cur_token,
                        st.active, st.budget, cross, j, i, bucket,
                        min(req.max_new_tokens, self.ecfg.max_decode_len - 1))
                    (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
                     st.budget) = out
                    slots[i] = req
                    emitted[i] = []
                    limits[i] = min(req.max_new_tokens,
                                    self.ecfg.max_decode_len - 1)
                    req.admitted_at = now() - t0
                    if spec:
                        src = (req.input_ids if req.draft_source is None
                               else req.draft_source)
                        draft_host[i] = 0
                        Ld = min(len(src), self.ecfg.max_encode_len)
                        draft_host[i, :Ld] = np.asarray(src[:Ld], np.int32)

        def harvest(pending):
            """Fetch a window's outputs (blocks on device completion of THAT
            window only) and retire finished requests."""
            if spec:
                snapshot, _credit, toks, n_effs, fins, actives = pending
                toks_h = np.asarray(toks)        # (k, B, Q)
                n_h = np.asarray(n_effs)         # (k, B)
                fins_h = np.asarray(fins)
                act_h = np.asarray(actives)
                t_host = now() - t0
                finished_now = [False] * len(snapshot)
                for t in range(toks_h.shape[0]):
                    any_active = False
                    for i, req in enumerate(snapshot):
                        if req is None or finished_now[i] or not act_h[t, i]:
                            continue
                        any_active = True
                        n = int(n_h[t, i])
                        if n > 0 and not emitted[i]:
                            req.first_token_at = t_host
                        emitted[i].extend(int(x) for x in toks_h[t, i, :n])
                        self.spec_stats["tokens"] += n
                        self.spec_stats["slot_windows"] += 1
                        if fins_h[t, i]:
                            finished_now[i] = True
                    if any_active:
                        self.spec_stats["windows"] += 1
            else:
                snapshot, _credit, toks, fins, actives = pending
                toks_h = np.asarray(toks)        # (k, B)
                fins_h = np.asarray(fins)
                act_h = np.asarray(actives)
                t_host = now() - t0
                finished_now = [False] * len(snapshot)
                for t in range(toks_h.shape[0]):
                    for i, req in enumerate(snapshot):
                        if req is None or finished_now[i] or not act_h[t, i]:
                            continue
                        if not emitted[i]:
                            req.first_token_at = t_host
                        emitted[i].append(int(toks_h[t, i]))
                        if fins_h[t, i]:
                            finished_now[i] = True
            for i, req in enumerate(snapshot):
                if req is None or not finished_now[i]:
                    continue
                toks_l = list(emitted[i])
                if self.config.eos_token_id in toks_l:
                    toks_l = toks_l[: toks_l.index(self.config.eos_token_id) + 1]
                else:
                    # reference contract: the boundary position is forced
                    # to EOS (modeling_flash_t5.py:683)
                    toks_l[-1] = self.config.eos_token_id
                req.result = np.asarray(toks_l, np.int32)
                req.finished_at = now() - t0
                slots[i] = None

        pending = None
        admit()
        while True:
            if not any(s is not None for s in slots):
                if pending is not None:
                    harvest(pending)
                    pending = None
                    admit()
                    continue
                refresh_queue()
                if queue:
                    admit()
                    continue
                if waiting:
                    dt = waiting[0].arrival_s - (now() - t0)
                    if dt > 0:
                        _time.sleep(min(dt, 0.02))
                    continue
                break
            # decode steps still needed after every dispatched window lands
            # (host-side budget arithmetic; EOS may finish slots earlier)
            rem = 0
            for i, req in enumerate(slots):
                if req is None:
                    continue
                credit = pending[1].get(i, 0) if pending is not None else 0
                rem = max(rem, limits[i] - len(emitted[i]) - credit)
            if pending is not None and rem <= 0:
                # the in-flight window finishes everything currently running:
                # fetch it now instead of stacking an idle window behind it
                harvest(pending)
                pending = None
                admit()
                continue
            if spec:
                carry, toks, n_effs, fins, actives = self._spec_multi_fn(
                    self.params, st.layers, st.enc_len, st.pos,
                    st.cur_token, st.prev_token, st.active, st.budget,
                    jnp.asarray(draft_host))
                (st.layers, st.enc_len, st.pos, st.cur_token,
                 st.prev_token, st.active, st.budget) = carry
            else:
                carry, self._sample_rng, toks, fins, actives = \
                    self._multi_step_fn(
                        self.params, st.layers, st.enc_len, st.pos,
                        st.cur_token, st.active, st.budget,
                        self._sample_rng)
                (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
                 st.budget) = carry
            snapshot = list(slots)
            credit = {i: window_credit for i, s in enumerate(slots)
                      if s is not None}
            if pending is not None:
                harvest(pending)
            if spec:
                pending = (snapshot, credit, toks, n_effs, fins, actives)
            else:
                pending = (snapshot, credit, toks, fins, actives)
            admit()
        return requests
