"""Continuous-batching engine over a PAGED decoder KV cache.

The slot-pool engine (engine.py) allocates max_decode_len per slot; this
variant stores decoder self-attention K/V in per-layer page pools
(inference/paged_kv.py), so HBM scales with tokens in flight and mixed-length
request batches pack densely — the production serving memory model
(PAPERS: Ragged Paged Attention). Cross-attention K/V stays slot-dense (it
is written once per request at prefill).

Same host scheduler shape as engine.py: bucketed prefill, windowed lockstep
decode (steps_per_sync per host sync), harvest+admit between windows. Page
allocation happens host-side between windows; the jitted step only does
functional scatter-appends at (page_table[slot, pos//P], pos%P).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import kv_cache
from flasht5_tpu.inference.engine import KVTensor, Request, _kv_make, _kv_read
from flasht5_tpu.inference.paged_kv import (
    paged_decode_attention_arrays,
    paged_decode_attention_chunked_packed,
    paged_decode_attention_ragged,
)
from flasht5_tpu.models import t5
from flasht5_tpu.ops.quant import quantize_kv
from flasht5_tpu.positional import relative_position_bucket


@dataclasses.dataclass
class PagedEngineConfig:
    max_slots: int = 8
    page_size: int = 16
    num_pages: int = 64               # shared per-layer pool size
    max_pages_per_slot: int = 8
    max_encode_len: int = 512
    encode_buckets: Tuple[int, ...] = (64, 128, 256, 512)
    kv_dtype: str = "native"          # pages + cross cache: "native" | "int8"
    steps_per_sync: int = 8
    # decode kernel over the page pool:
    #   "chunked" (default) — chunked work-list over FUSED token-pair-packed
    #       page records, 0.85 of the HBM roofline on-chip
    #       (docs/paged_roofline_chunked.json); pool stored packed
    #   "ragged"  — single-page work-list (grid over active pages)
    #   "dense"   — (slot, page) grid, flat in occupancy
    kernel: str = "chunked"
    pages_per_item: int = 8           # chunked kernel: pages per work item


class PagedState:
    def __init__(self, config: FlashT5Config, params, ecfg: PagedEngineConfig):
        h, dkv = config.num_heads, config.d_kv
        quant = ecfg.kv_dtype == "int8"
        dt = jnp.int8 if quant else jnp.dtype(config.dtype)
        n_layers = len(params["decoder"]["block"])
        b = ecfg.max_slots

        def page_arrays():
            vals = jnp.zeros((ecfg.num_pages, h, ecfg.page_size, dkv), dt)
            scales = (jnp.zeros((ecfg.num_pages, h, ecfg.page_size, 1),
                                jnp.float32) if quant else None)
            return KVTensor(vals, scales)

        def packed_kv_records():
            # fused token-packed page records for the chunked kernel
            # (paged_kv.pack_kv_pages_fused layout): [page, kv, h, P//f, f*D]
            from flasht5_tpu.inference.paged_kv import kv_packing_factor
            f = kv_packing_factor(dkv, ecfg.page_size)
            vals = jnp.zeros(
                (ecfg.num_pages, 2, h, ecfg.page_size // f, f * dkv), dt)
            scales = (jnp.zeros(
                (ecfg.num_pages, 2, f, h * (ecfg.page_size // f)),
                jnp.float32) if quant else None)
            return KVTensor(vals, scales)

        def cross():
            vals = jnp.zeros((b, h, ecfg.max_encode_len, dkv), dt)
            scales = (jnp.zeros((b, h, ecfg.max_encode_len, 1), jnp.float32)
                      if quant else None)
            return KVTensor(vals, scales)

        if ecfg.kernel == "chunked":
            self.layers = tuple(
                {"pages_kv": packed_kv_records(),
                 "cross_k": cross(), "cross_v": cross()}
                for _ in range(n_layers))
        else:
            self.layers = tuple(
                {"pages_k": page_arrays(), "pages_v": page_arrays(),
                 "cross_k": cross(), "cross_v": cross()}
                for _ in range(n_layers))
        self.page_table = jnp.zeros((b, ecfg.max_pages_per_slot), jnp.int32)
        self.enc_len = jnp.zeros((b,), jnp.int32)
        self.pos = jnp.zeros((b,), jnp.int32)
        self.cur_token = jnp.zeros((b,), jnp.int32)
        self.active = jnp.zeros((b,), jnp.bool_)
        self.budget = jnp.zeros((b,), jnp.int32)
        # host-side allocator
        self._free: List[int] = list(range(ecfg.num_pages))
        self._owned: List[List[int]] = [[] for _ in range(b)]

    # -- host allocator --
    def ensure_capacity(self, slot: int, tokens: int, page_size: int):
        while len(self._owned[slot]) * page_size < tokens:
            if not self._free:
                raise RuntimeError("KV page pool exhausted")
            page = self._free.pop()
            idx = len(self._owned[slot])
            self._owned[slot].append(page)
            self.page_table = self.page_table.at[slot, idx].set(page)

    def release(self, slot: int):
        self._free.extend(self._owned[slot])
        self._owned[slot] = []


class PagedInferenceEngine:
    """Greedy continuous batching with paged decoder KV."""

    def __init__(self, config: FlashT5Config, params, ecfg: PagedEngineConfig):
        self.config = config
        self.params = params
        self.ecfg = ecfg
        self.state = PagedState(config, params, ecfg)
        self._encode_fns: Dict[int, Callable] = {}
        self._multi_step_fn = jax.jit(self._make_multi_step())
        self._insert_fn = jax.jit(self._make_insert())

    def _bucket_for(self, length: int) -> int:
        for b in self.ecfg.encode_buckets:
            if length <= b:
                return b
        return self.ecfg.encode_buckets[-1]

    def _encode_fn(self, bucket: int) -> Callable:
        if bucket not in self._encode_fns:
            config = self.config

            def run(params, ids):
                enc = t5.encode(config, params, ids)
                outs = []
                for blk in params["decoder"]["block"]:
                    ca = blk["cross_attention_layer"]["cross_attention"]
                    outs.append((
                        kv_cache._proj_heads(enc, ca["Wk"], config.num_heads,
                                             config.d_kv),
                        kv_cache._proj_heads(enc, ca["Wv"], config.num_heads,
                                             config.d_kv)))
                return outs

            self._encode_fns[bucket] = jax.jit(run)
        return self._encode_fns[bucket]

    def _make_insert(self):
        ecfg = self.ecfg
        quant = ecfg.kv_dtype == "int8"

        def insert(layers, enc_len, pos, cur_token, active, budget,
                   cross_kvs, slot, bucket_len, max_new):
            new_layers = []
            for layer, (ck, cv) in zip(layers, cross_kvs):
                pad = ecfg.max_encode_len - ck.shape[2]
                ckp = jnp.pad(ck, ((0, 0), (0, 0), (0, pad), (0, 0)))
                cvp = jnp.pad(cv, ((0, 0), (0, 0), (0, pad), (0, 0)))

                def put(kv, new):
                    newq = _kv_make(new, quant)
                    vals = jax.lax.dynamic_update_slice(
                        kv.values, newq.values.astype(kv.values.dtype),
                        (slot, 0, 0, 0))
                    scales = kv.scales
                    if scales is not None:
                        scales = jax.lax.dynamic_update_slice(
                            scales, newq.scales, (slot, 0, 0, 0))
                    return KVTensor(vals, scales)

                new_layers.append({**layer,
                                   "cross_k": put(layer["cross_k"], ckp),
                                   "cross_v": put(layer["cross_v"], cvp)})
            enc_len = enc_len.at[slot].set(bucket_len)
            pos = pos.at[slot].set(0)
            cur_token = cur_token.at[slot].set(0)
            active = active.at[slot].set(True)
            budget = budget.at[slot].set(max_new)
            return tuple(new_layers), enc_len, pos, cur_token, active, budget

        return insert

    def _make_step(self):
        config, ecfg = self.config, self.ecfg
        quant = ecfg.kv_dtype == "int8"
        P = ecfg.page_size
        maxL = ecfg.max_pages_per_slot * P

        def step(params, layers, page_table, enc_len, pos, cur_token, active,
                 budget):
            b = ecfg.max_slots
            h, dkv = config.num_heads, config.d_kv
            emb = params["shared"]["embedding"]
            x = jnp.take(emb, cur_token, axis=0).astype(
                jnp.dtype(config.dtype))[:, None, :]

            slot_ids = jnp.arange(b)
            page_idx = pos // P
            offset = pos % P
            pids = page_table[slot_ids, page_idx]
            cpos = jnp.arange(ecfg.max_encode_len, dtype=jnp.int32)
            cross_valid = cpos[None, :] < enc_len[:, None]

            # per-slot T5 decode bias row vs all paged positions
            self_bias = None
            if config.position_encoding_type == "t5":
                pe = params["decoder"]["block"][0]["self_attention_layer"][
                    "self_attention"].get("pe_encoding")
                kpos = jnp.arange(maxL, dtype=jnp.int32)
                rel = kpos[None, :] - pos[:, None]
                buckets = relative_position_bucket(
                    rel, bidirectional=False,
                    num_buckets=config.relative_attention_num_buckets,
                    max_distance=config.relative_attention_max_distance)
                vals = jnp.take(pe["relative_attention_bias"], buckets, axis=0)
                self_bias = jnp.transpose(vals, (0, 2, 1))  # (B, H, maxL)

            new_layers = []
            for li, blk in enumerate(params["decoder"]["block"]):
                layer = layers[li]
                sa = blk["self_attention_layer"]["self_attention"]
                normed = t5._layer_norm(
                    config, blk["self_attention_layer"]["layer_norm"]["weight"], x)
                q = kv_cache._proj_heads(normed, sa["Wq"], h, dkv)[:, :, 0]
                k_new = kv_cache._proj_heads(normed, sa["Wk"], h, dkv)[:, :, 0]
                v_new = kv_cache._proj_heads(normed, sa["Wv"], h, dkv)[:, :, 0]

                def append(kv: KVTensor, new):
                    if quant:
                        nq, ns = quantize_kv(new)
                        vals = kv.values.at[pids, :, offset].set(
                            nq.astype(kv.values.dtype))
                        scales = kv.scales.at[pids, :, offset].set(ns)
                        return KVTensor(vals, scales)
                    vals = kv.values.at[pids, :, offset].set(
                        new.astype(kv.values.dtype))
                    return KVTensor(vals, None)

                def append_packed(kv: KVTensor, plane, new, fpack):
                    # token t lives in packed row t//f, lane block t%f
                    row = offset // fpack
                    half = offset % fpack                   # (B,)
                    if quant:
                        new, ns = quantize_kv(new)          # (B,H,D),(B,H,1)
                    # RMW the (B, H, f*D) packed rows: tile the new vector
                    # to every block, keep the slot's own lane block only
                    old = kv.values[pids, plane, :, row]    # (B, H, f*D)
                    lane = jnp.arange(fpack * dkv) // dkv   # (f*D,)
                    sel = lane[None, None, :] == half[:, None, None]
                    tiled = jnp.concatenate([new] * fpack, axis=-1)
                    vals = kv.values.at[pids, plane, :, row].set(
                        jnp.where(sel, tiled.astype(kv.values.dtype), old))
                    scales = kv.scales
                    if quant:
                        cols = (jnp.arange(h)[None, :] * (P // fpack)
                                + row[:, None])             # (B, H)
                        scales = scales.at[pids[:, None], plane,
                                           half[:, None], cols].set(ns[:, :, 0])
                    return KVTensor(vals, scales)

                if ecfg.kernel == "chunked":
                    from flasht5_tpu.inference.paged_kv import (
                        kv_packing_factor)
                    fpack = kv_packing_factor(dkv, P)
                    pages_kv = append_packed(layer["pages_kv"], 0, k_new,
                                             fpack)
                    pages_kv = append_packed(pages_kv, 1, v_new, fpack)
                    attn = paged_decode_attention_chunked_packed(
                        q.astype(jnp.float32), pages_kv.values,
                        pages_kv.scales, page_table, pos + 1,
                        sm_scale=config.softmax_scale,
                        bias=(None if self_bias is None
                              else self_bias.astype(jnp.float32)),
                        chunk=ecfg.pages_per_item)
                    new_page_state = {"pages_kv": pages_kv}
                else:
                    pages_k = append(layer["pages_k"], k_new)
                    pages_v = append(layer["pages_v"], v_new)
                    paged_attn = (paged_decode_attention_ragged
                                  if ecfg.kernel == "ragged"
                                  else paged_decode_attention_arrays)
                    attn = paged_attn(
                        q.astype(jnp.float32), pages_k.values, pages_v.values,
                        pages_k.scales, pages_v.scales, page_table, pos + 1,
                        sm_scale=config.softmax_scale,
                        bias=(None if self_bias is None
                              else self_bias.astype(jnp.float32)))
                    new_page_state = {"pages_k": pages_k, "pages_v": pages_v}
                attn = attn.astype(x.dtype).reshape(b, 1, h * dkv)
                x = x + t5._matmul(attn, sa["o"])

                ca = blk["cross_attention_layer"]["cross_attention"]
                normed = t5._layer_norm(
                    config, blk["cross_attention_layer"]["layer_norm"]["weight"], x)
                qc = kv_cache._proj_heads(normed, ca["Wq"], h, dkv)
                s = jnp.einsum("bhqd,bhnd->bhqn", qc.astype(jnp.float32),
                               _kv_read(layer["cross_k"])) * config.softmax_scale
                s = jnp.where(cross_valid[:, None, None, :], s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                attn = jnp.einsum("bhqn,bhnd->bhqd", p,
                                  _kv_read(layer["cross_v"])).astype(x.dtype)
                attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, 1, h * dkv)
                x = x + t5._matmul(attn, ca["o"])

                x = t5._ff(config, blk["ff_layer"], x, rng=None,
                           deterministic=True)
                new_layers.append({**layer, **new_page_state})

            x = t5._layer_norm(config,
                               params["decoder"]["final_layer_norm"]["weight"], x)
            if config.tie_word_embeddings:
                logits = jnp.dot(x, emb.T.astype(x.dtype))
            else:
                logits = t5._matmul(x, params["lm_head"])
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)

            budget = jnp.where(active, budget - 1, budget)
            hit_eos = nxt == config.eos_token_id
            out_of_room = (pos + 1 >= maxL) | (budget <= 0)
            finished = active & (hit_eos | out_of_room)
            cur_token = jnp.where(active, nxt, cur_token)
            pos = jnp.where(active, pos + 1, pos)
            active = active & ~finished
            return (tuple(new_layers), enc_len, pos, cur_token, active,
                    budget, nxt, finished)

        return step

    def _make_multi_step(self):
        step = self._make_step()
        k = self.ecfg.steps_per_sync

        def multi(params, layers, page_table, enc_len, pos, cur_token,
                  active, budget):
            def body(carry, _):
                layers, enc_len, pos, cur_token, active, budget = carry
                was_active = active
                (layers, enc_len, pos, cur_token, active, budget, nxt,
                 finished) = step(params, layers, page_table, enc_len, pos,
                                  cur_token, active, budget)
                return ((layers, enc_len, pos, cur_token, active, budget),
                        (nxt, finished, was_active))

            carry, outs = jax.lax.scan(
                body, (layers, enc_len, pos, cur_token, active, budget),
                None, length=k)
            return carry, outs

        return multi

    # -- host scheduler ----------------------------------------------------

    def run(self, requests: List[Request]) -> List[Request]:
        queue = list(requests)
        slots: List[Optional[Request]] = [None] * self.ecfg.max_slots
        emitted: List[List[int]] = [[] for _ in range(self.ecfg.max_slots)]
        st = self.state
        P = self.ecfg.page_size

        def admit():
            for i in range(self.ecfg.max_slots):
                if slots[i] is None and queue:
                    req = queue.pop(0)
                    st.release(i)
                    L = min(len(req.input_ids), self.ecfg.max_encode_len)
                    bucket = self._bucket_for(L)
                    padded = np.zeros((1, bucket), np.int32)
                    padded[0, :L] = req.input_ids[:L]
                    cross = self._encode_fn(bucket)(self.params,
                                                    jnp.asarray(padded))
                    max_new = min(req.max_new_tokens,
                                  self.ecfg.max_pages_per_slot * P - 1)
                    st.ensure_capacity(i, max_new + 1, P)
                    out = self._insert_fn(
                        st.layers, st.enc_len, st.pos, st.cur_token,
                        st.active, st.budget, cross, i, bucket, max_new)
                    (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
                     st.budget) = out
                    slots[i] = req
                    emitted[i] = []

        admit()
        while any(s is not None for s in slots):
            carry, (toks, fins, actives) = self._multi_step_fn(
                self.params, st.layers, st.page_table, st.enc_len, st.pos,
                st.cur_token, st.active, st.budget)
            (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
             st.budget) = carry
            toks_h = np.asarray(toks)
            fins_h = np.asarray(fins)
            act_h = np.asarray(actives)
            finished_now = [False] * len(slots)
            for t in range(toks_h.shape[0]):
                for i, req in enumerate(slots):
                    if req is None or finished_now[i] or not act_h[t, i]:
                        continue
                    emitted[i].append(int(toks_h[t, i]))
                    if fins_h[t, i]:
                        finished_now[i] = True
            for i, req in enumerate(slots):
                if req is None or not finished_now[i]:
                    continue
                toks_out = list(emitted[i])
                if self.config.eos_token_id in toks_out:
                    toks_out = toks_out[:toks_out.index(self.config.eos_token_id) + 1]
                else:
                    toks_out[-1] = self.config.eos_token_id
                req.result = np.asarray(toks_out, np.int32)
                slots[i] = None
            admit()
        return requests
