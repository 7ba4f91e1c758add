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
import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import kv_cache
from flasht5_tpu.inference.engine import KVTensor, Request, _kv_make, _kv_read
from flasht5_tpu.inference.paged_kv import (
    dense_cache_attention,
    dense_small_pool_attention,
    gather_pool_dense,
    paged_decode_attention_arrays,
    paged_decode_attention_chunked_packed,
    paged_decode_attention_ragged,
)
from flasht5_tpu.models import t5
from flasht5_tpu.ops.quant import quantize_kv
from flasht5_tpu.positional import relative_position_bucket


def _stage_read(staged_plane):
    """Dequantize one window-staged (values, scales) cache plane to f32."""
    vals, scales = staged_plane
    x = vals.astype(jnp.float32)
    return x if scales is None else x * scales


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
    # Small-pool reader (r4 experiment, default OFF): when
    # max_pages_per_slot*page_size <= dense_read_max tokens, read committed
    # pages with one fused XLA gather-attention instead of the chunked
    # Pallas kernel. MEASURED SLOWER on v5e (docs/paged_step_probe.json,
    # interleaved median of 7 at 8 slots x 320-token pools, int8: dense-read
    # window 256.6ms vs kernel 160.9ms vs slot engine 112.5ms): the int8
    # page gather + dequant + full masked attention materializes more HBM
    # traffic than the kernel's launch overhead costs. Kept as an opt-in
    # (parity-tested) for layouts where gathers win; 0 = always the kernel.
    #
    # Why the docs/decode_crossover.json switch is NOT wired as a default:
    # that microbench's XLA attention reads a CONTIGUOUS dense cache — the
    # layout the slot engine has — so its "XLA wins below the crossover"
    # rows do not transfer to this engine, where any XLA path must first
    # gather int8 pages through the page table (this dense-read path) or
    # stage them once per window (window_stage_max_bytes); BOTH in-engine
    # forms were measured slower than the chunked kernel at the serving
    # settings above. The crossover artifact is the map of what paging
    # itself costs vs a contiguous layout, not an unwired optimization.
    dense_read_max: int = 0
    # Window-buffered appends (r4, VERDICT #5 "append tax"): within a sync
    # window the new K/V go into a dense (B, H, k, D) side buffer written
    # with a one-hot masked add (the slot engine's cheap scatter); attention
    # = chunked kernel over the COMMITTED pages (work-list built ONCE per
    # window instead of per layer per step) LSE-merged with a dense
    # single-query attention over the side buffer; the packed-page
    # read-modify-write happens once per window per layer (batched, all k
    # tokens at once) instead of once per step per layer. Only with
    # kernel="chunked".
    window_appends: bool = True
    # Window-dense staging (r4 experiment, default OFF): gather each
    # layer's committed pages into a slot-layout (B, H, maxL, D)
    # int8(+scales) cache once per decode window, then run each step's
    # committed-prefix attention as plain dense XLA attention. MEASURED
    # SLOWER than the chunked kernel on v5e at the dense serving settings
    # (8 slots x 320-token pools, int8): staged window 233ms vs kernel-read
    # ~215ms chip-normalized, end-to-end 3,920 vs 4,594 tok/s — the
    # per-step XLA dequant+masked-attention over the staged cache costs
    # more than the per-layer kernel launches it removes. Kept as a
    # parity-tested opt-in; 0 disables.
    window_stage_max_bytes: int = 0


class PagedState:
    def __init__(self, config: FlashT5Config, params, ecfg: PagedEngineConfig):
        h, dkv = config.num_heads, config.d_kv
        quant = ecfg.kv_dtype == "int8"
        dt = jnp.int8 if quant else jnp.dtype(config.dtype)
        n_layers = len(params["decoder"]["block"])
        b = ecfg.max_slots

        def page_arrays():
            # +1 TRASH page (index num_pages, never allocated): inactive
            # slots' per-step appends are routed there, so a released slot
            # can never write into pages the allocator has handed to
            # another slot
            vals = jnp.zeros((ecfg.num_pages + 1, h, ecfg.page_size, dkv),
                             dt)
            scales = (jnp.zeros((ecfg.num_pages + 1, h, ecfg.page_size, 1),
                                jnp.float32) if quant else None)
            return KVTensor(vals, scales)

        def packed_kv_records():
            # fused token-packed page records for the chunked kernel
            # (paged_kv.pack_kv_pages_fused layout): [page, kv, h, P//f, f*D]
            # +1 TRASH page (index num_pages, never allocated): the window
            # flush is a masked batched scatter and rows with no valid lanes
            # are redirected there, so duplicate masked writes never race a
            # real page; the per-step append path routes inactive slots'
            # writes there for the same reason
            from flasht5_tpu.inference.paged_kv import kv_packing_factor
            f = kv_packing_factor(dkv, ecfg.page_size)
            n = ecfg.num_pages + 1
            vals = jnp.zeros(
                (n, 2, h, ecfg.page_size // f, f * dkv), dt)
            scales = (jnp.zeros(
                (n, 2, f, h * (ecfg.page_size // f)),
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
        # HOST-side page table (numpy): the allocator mutates it per
        # admission; materializing per-page .at[].set device updates costs a
        # tiny dispatch each through the tunnel (r4 probe: admissions, not
        # the window fn, carried part of the dense-settings gap). The run
        # loop ships it once per decode window as a jnp input.
        self.page_table = np.zeros((b, ecfg.max_pages_per_slot), np.int32)
        self.enc_len = jnp.zeros((b,), jnp.int32)
        self.pos = jnp.zeros((b,), jnp.int32)
        self.cur_token = jnp.zeros((b,), jnp.int32)
        self.active = jnp.zeros((b,), jnp.bool_)
        self.budget = jnp.zeros((b,), jnp.int32)
        # host-side allocator
        self._free: List[int] = list(range(ecfg.num_pages))
        self._owned: List[List[int]] = [[] for _ in range(b)]

    # -- host allocator --
    def can_allocate(self, slot: int, tokens: int, page_size: int) -> bool:
        need = -(-tokens // page_size) - len(self._owned[slot])
        return need <= len(self._free)

    def ensure_capacity(self, slot: int, tokens: int, page_size: int):
        while len(self._owned[slot]) * page_size < tokens:
            if not self._free:
                raise RuntimeError("KV page pool exhausted")
            page = self._free.pop()
            idx = len(self._owned[slot])
            self._owned[slot].append(page)
            self.page_table[slot, idx] = page

    def release(self, slot: int):
        # NOTE: a released slot's device-side pos stays stale until reuse;
        # the run loop ships a host-side `released` mask with every window
        # so the jitted step can zero it for free (a per-release device
        # .at[].set here was measured to cost a full ~25ms tunnel dispatch
        # per completed request — 7% of a whole FAT5-small serving run).
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
        # donate the page pool + slot state: without donation XLA holds
        # input and output copies of the multi-GiB pools across every
        # window call, doubling peak HBM right where pool capacity is the
        # engine's selling point (page_table ships fresh each window and
        # params are read-only — neither is donated)
        self._multi_step_fn = jax.jit(self._make_multi_step(),
                                      donate_argnums=(1, 4, 5, 6, 7, 8))
        self._insert_fn = jax.jit(self._make_insert(),
                                  donate_argnums=(0, 1, 2, 3, 4, 5))

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

    def warmup(self, buckets=None) -> None:
        """Compile every prefill variant (all power-of-two batch sizes per
        bucket) plus each per-nb insert, so churn-wave admissions under
        load measure serving, not compilation (r5: unwarmed nb variants
        stalled the heavy-tail XL runs mid-measurement)."""
        buckets = buckets or self.ecfg.encode_buckets
        st = self.state
        for bucket in buckets:
            nb = 1
            while True:
                fn = self._encode_fn(bucket, nb)
                cross = fn(self.params, jnp.zeros((nb, bucket), jnp.int32))
                # the insert donates the state buffers: thread the outputs
                # back (slot 0's fake request is parked below)
                out = self._insert_fn(st.layers, st.enc_len, st.pos,
                                      st.cur_token, st.active, st.budget,
                                      cross, 0, 0, bucket, 1)
                (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
                 st.budget) = out
                np.asarray(out[1])     # force completion through the tunnel
                if nb >= self._prefill_batch(self.ecfg.max_slots):
                    break
                nb *= 2
        st.active = jnp.zeros_like(st.active)
        st.pos = jnp.zeros_like(st.pos)

    def _use_dense_read(self) -> bool:
        """Trace-time reader choice: fused XLA gather-attention for small
        pools, the chunked Pallas kernel at scale (see dense_read_max)."""
        ecfg = self.ecfg
        return (ecfg.kernel == "chunked" and ecfg.dense_read_max > 0
                and ecfg.max_pages_per_slot * ecfg.page_size
                <= ecfg.dense_read_max)

    def _use_window_stage(self) -> bool:
        """Trace-time choice of the window-staged committed-prefix reader
        (see window_stage_max_bytes)."""
        ecfg = self.ecfg
        maxL = ecfg.max_pages_per_slot * ecfg.page_size
        itemsize = 1 if ecfg.kv_dtype == "int8" else 2
        staged = (ecfg.max_slots * self.config.num_heads * maxL
                  * (self.config.d_kv * itemsize + 4) * 2)
        return (ecfg.kernel == "chunked" and ecfg.window_appends
                and 0 < staged <= ecfg.window_stage_max_bytes)

    def _encode_fn(self, bucket: int, nb: int = 1) -> Callable:
        """Batched prefill: encode `nb` sequences in ONE call; per-layer
        cross K/V come back with leading dim nb (row j = request j — the
        insert slices its row on device, same as the slot engine)."""
        key = (bucket, nb)
        if key not in self._encode_fns:
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

            self._encode_fns[key] = jax.jit(run)
        return self._encode_fns[key]

    def _make_insert(self):
        ecfg = self.ecfg
        quant = ecfg.kv_dtype == "int8"

        def insert(layers, enc_len, pos, cur_token, active, budget,
                   cross_kvs, row_idx, slot, bucket_len, max_new):
            new_layers = []
            for layer, (ckb, cvb) in zip(layers, cross_kvs):
                # batched prefill: this request's row of the nb-row encode
                ck = jax.lax.dynamic_slice_in_dim(ckb, row_idx, 1, 0)
                cv = jax.lax.dynamic_slice_in_dim(cvb, row_idx, 1, 0)
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
            # inactive slots write to the trash page (index num_pages):
            # their table rows may reference pages already re-allocated
            pids = jnp.where(active, page_table[slot_ids, page_idx],
                             ecfg.num_pages)
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
                    paged_read = (dense_small_pool_attention
                                  if self._use_dense_read() else
                                  functools.partial(
                                      paged_decode_attention_chunked_packed,
                                      chunk=ecfg.pages_per_item))
                    attn = paged_read(
                        q.astype(jnp.float32), pages_kv.values,
                        pages_kv.scales, page_table, pos + 1,
                        sm_scale=config.softmax_scale,
                        bias=(None if self_bias is None
                              else self_bias.astype(jnp.float32)))
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
        if self.ecfg.kernel == "chunked" and self.ecfg.window_appends:
            return self._make_window_multi_step()
        step = self._make_step()
        k = self.ecfg.steps_per_sync

        def multi(params, layers, page_table, released, enc_len, pos,
                  cur_token, active, budget):
            # zero stale committed counts of released-but-unreused slots
            # (host mask rides the window dispatch for free)
            pos = jnp.where(released, 0, pos)

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

    # -- window-buffered decode (append tax removed) ------------------------

    def _make_window_step(self):
        """One decode step where new K/V go to the dense per-window side
        buffer and attention = committed-pages kernel (hoisted work-list)
        LSE-merged with a masked dense attention over the side buffer."""
        config, ecfg = self.config, self.ecfg
        quant = ecfg.kv_dtype == "int8"
        P = ecfg.page_size
        k_win = ecfg.steps_per_sync
        maxL = ecfg.max_pages_per_slot * P

        def step(params, layers, page_table, worklist, staged, base, side,
                 t, enc_len, pos, cur_token, active, budget):
            # shard-oblivious (ShardedPagedEngine runs this under
            # shard_map): slot count from the state, head count from the
            # (possibly tensor-sharded) projections; with config.tp_axis
            # set the o-projections reduce across tensor shards and the
            # next token comes from the vocab-parallel argmax
            b = cur_token.shape[0]
            dkv = config.d_kv
            tp = config.tp_axis
            emb = params["shared"]["embedding"]
            x = jnp.take(emb, cur_token, axis=0).astype(
                jnp.dtype(config.dtype))[:, None, :]

            cpos = jnp.arange(ecfg.max_encode_len, dtype=jnp.int32)
            cross_valid = cpos[None, :] < enc_len[:, None]

            paged_bias = None
            side_bias = None
            if config.position_encoding_type == "t5":
                pe = params["decoder"]["block"][0]["self_attention_layer"][
                    "self_attention"].get("pe_encoding")
                kpos = jnp.arange(maxL, dtype=jnp.int32)
                rel = kpos[None, :] - pos[:, None]
                buckets = relative_position_bucket(
                    rel, bidirectional=False,
                    num_buckets=config.relative_attention_num_buckets,
                    max_distance=config.relative_attention_max_distance)
                vals = jnp.take(pe["relative_attention_bias"], buckets,
                                axis=0)
                paged_bias = jnp.transpose(vals, (0, 2, 1))   # (B, H, maxL)
                # side keys live at positions base..base+k-1; the query is
                # at base+t, so rel = j - t: SLOT-INDEPENDENT (one (H, k)
                # row for the whole batch)
                rel_s = jnp.arange(k_win, dtype=jnp.int32)[None, :] - t
                bk_s = relative_position_bucket(
                    rel_s, bidirectional=False,
                    num_buckets=config.relative_attention_num_buckets,
                    max_distance=config.relative_attention_max_distance)
                side_bias = jnp.transpose(
                    jnp.take(pe["relative_attention_bias"], bk_s[0], axis=0),
                    (1, 0))[None]                             # (1, H, k)

            smask = (jnp.arange(k_win, dtype=jnp.int32)[None, None, :]
                     <= t)                                    # (1, 1, k)

            new_side = []
            for li, blk in enumerate(params["decoder"]["block"]):
                layer = layers[li]
                side_k, side_v = side[li]
                sa = blk["self_attention_layer"]["self_attention"]
                h = sa["Wq"].shape[1] // dkv           # local (sharded) heads
                normed = t5._layer_norm(
                    config, blk["self_attention_layer"]["layer_norm"]["weight"], x)
                q = kv_cache._proj_heads(normed, sa["Wq"], h, dkv)[:, :, 0]
                k_new = kv_cache._proj_heads(normed, sa["Wk"], h, dkv)[:, :, 0]
                v_new = kv_cache._proj_heads(normed, sa["Wv"], h, dkv)[:, :, 0]

                def side_append(kv: KVTensor, new):
                    # in-place dynamic_update_slice at column t (t is the
                    # same traced scalar for every slot): O(slice) traffic
                    # and XLA aliases the scan carry, vs the full-buffer
                    # read-add-write a masked add would cost per layer-step
                    at = (0, 0, t, 0)
                    if quant:
                        nq, ns = quantize_kv(new)          # (B,H,D),(B,H,1)
                        vals = jax.lax.dynamic_update_slice(
                            kv.values, nq[:, :, None, :].astype(
                                kv.values.dtype), at)
                        scales = jax.lax.dynamic_update_slice(
                            kv.scales, ns[:, :, None, :], at)
                        return KVTensor(vals, scales)
                    vals = jax.lax.dynamic_update_slice(
                        kv.values, new[:, :, None, :].astype(kv.values.dtype),
                        at)
                    return KVTensor(vals, None)

                side_k = side_append(side_k, k_new)
                side_v = side_append(side_v, v_new)

                q32 = q.astype(jnp.float32)
                pbias = (None if paged_bias is None
                         else paged_bias.astype(jnp.float32))
                if staged is not None:
                    out_p, m_p, l_p = dense_cache_attention(
                        q32, _stage_read(staged[li][0]),
                        _stage_read(staged[li][1]), base,
                        sm_scale=config.softmax_scale, bias=pbias,
                        return_state=True)
                elif self._use_dense_read():
                    out_p, m_p, l_p = dense_small_pool_attention(
                        q32, layer["pages_kv"].values,
                        layer["pages_kv"].scales, page_table, base,
                        sm_scale=config.softmax_scale, bias=pbias,
                        return_state=True)
                else:
                    # skip the kernel entirely when no slot has committed
                    # tokens — the common case when per-request budgets fit
                    # one sync window (e.g. XL serving at max_new <= sync):
                    # every (layer, step) launch would read an empty
                    # work-list. The empty branch returns the kernel's own
                    # empty-slot state (out 0, m -inf, l 0), so the side-
                    # buffer LSE merge is unchanged.
                    def _kernel_branch(qq):
                        return paged_decode_attention_chunked_packed(
                            qq, layer["pages_kv"].values,
                            layer["pages_kv"].scales,
                            page_table, base, sm_scale=config.softmax_scale,
                            bias=pbias, chunk=ecfg.pages_per_item,
                            worklist=worklist, return_state=True)

                    def _empty_branch(qq):
                        return (jnp.zeros((b, h, dkv), jnp.float32),
                                jnp.full((b, h), -1e30, jnp.float32),
                                jnp.zeros((b, h), jnp.float32))

                    if getattr(self, "_use_empty_gate", True):
                        out_p, m_p, l_p = jax.lax.cond(
                            jnp.max(base) > 0, _kernel_branch, _empty_branch,
                            q32)
                    else:
                        # ShardedPagedEngine: the gate's lax.cond wraps the
                        # Pallas call, which does not survive shard_map SPMD
                        # partitioning on every shard — run the kernel
                        # unconditionally there
                        out_p, m_p, l_p = _kernel_branch(q32)

                skf = side_k.values.astype(jnp.float32)
                svf = side_v.values.astype(jnp.float32)
                if quant:
                    skf = skf * side_k.scales
                s_side = jnp.einsum("bhd,bhtd->bht", q32,
                                    skf) * config.softmax_scale
                if side_bias is not None:
                    s_side = s_side + side_bias.astype(jnp.float32)
                s_side = jnp.where(smask, s_side, -jnp.inf)
                m_s = jnp.max(s_side, axis=-1)                   # (B, H)
                p = jnp.where(smask, jnp.exp(s_side - m_s[..., None]), 0.0)
                l_s = jnp.sum(p, axis=-1)
                if quant:
                    p = p * side_v.scales[..., 0]
                o_s = jnp.einsum("bht,bhtd->bhd", p, svf)        # unnorm

                m_c = jnp.maximum(m_p, m_s)
                w_p = jnp.exp(m_p - m_c) * l_p
                w_s = jnp.exp(m_s - m_c)
                denom = w_p + w_s * l_s
                attn = (out_p.astype(jnp.float32) * w_p[..., None]
                        + o_s * w_s[..., None]) / denom[..., None]
                attn = attn.astype(x.dtype).reshape(b, 1, h * dkv)
                if tp is not None:
                    x = x + t5._row_parallel_matmul(config, attn, sa["o"])
                else:
                    x = x + t5._matmul(attn, sa["o"])

                ca = blk["cross_attention_layer"]["cross_attention"]
                normed = t5._layer_norm(
                    config, blk["cross_attention_layer"]["layer_norm"]["weight"], x)
                qc = kv_cache._proj_heads(normed, ca["Wq"], h, dkv)
                s = jnp.einsum("bhqd,bhnd->bhqn", qc.astype(jnp.float32),
                               _kv_read(layer["cross_k"])) * config.softmax_scale
                s = jnp.where(cross_valid[:, None, None, :], s, -1e30)
                pc = jax.nn.softmax(s, axis=-1)
                attn = jnp.einsum("bhqn,bhnd->bhqd", pc,
                                  _kv_read(layer["cross_v"])).astype(x.dtype)
                attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, 1, h * dkv)
                if tp is not None:
                    x = x + t5._row_parallel_matmul(config, attn, ca["o"])
                else:
                    x = x + t5._matmul(attn, ca["o"])

                x = t5._ff(config, blk["ff_layer"], x, rng=None,
                           deterministic=True)
                new_side.append((side_k, side_v))

            x = t5._layer_norm(config,
                               params["decoder"]["final_layer_norm"]["weight"], x)
            if config.tie_word_embeddings:
                logits = jnp.dot(x, emb.T.astype(x.dtype))
            else:
                logits = t5._matmul(x, params["lm_head"])
            if tp is not None and not config.tie_word_embeddings:
                from flasht5_tpu.parallel.vocab_parallel import (
                    vocab_parallel_next_token)
                nxt = vocab_parallel_next_token(logits[:, 0], tp)
            else:
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)

            budget = jnp.where(active, budget - 1, budget)
            hit_eos = nxt == config.eos_token_id
            out_of_room = (pos + 1 >= maxL) | (budget <= 0)
            finished = active & (hit_eos | out_of_room)
            cur_token = jnp.where(active, nxt, cur_token)
            pos = jnp.where(active, pos + 1, pos)
            active = active & ~finished
            return (tuple(new_side), pos, cur_token, active, budget, nxt,
                    finished)

        return step

    def _flush_side(self, layer_kv: KVTensor, side_k: KVTensor,
                    side_v: KVTensor, page_table, base, cnt):
        """Commit a window's side-buffer tokens into the packed page pool:
        ONE batched gather + scatter per (layer, plane) covering all k
        tokens, vs the r3 engine's per-step per-layer read-modify-write.
        Rows with no valid lane are redirected to the TRASH page (all such
        writes carry identical gathered-old bytes, so duplicate scatters
        stay deterministic)."""
        ecfg = self.ecfg
        from flasht5_tpu.inference.paged_kv import kv_packing_factor
        P = ecfg.page_size
        dkv = self.config.d_kv
        f = kv_packing_factor(dkv, P)
        k_win = ecfg.steps_per_sync
        # spanned packed rows: tokens base..base+k-1 start at lane base%f,
        # so worst case floor((f-1 + k-1)/f) + 1 rows
        R = (k_win + f - 2) // f + 1
        b = base.shape[0]
        maxp = page_table.shape[1]
        trash = layer_kv.values.shape[0] - 1

        g = jnp.arange(R, dtype=jnp.int32)[None, :]            # (1, R)
        row_tok0 = (base[:, None] // f + g) * f                # (B, R)
        page_idx = jnp.clip(row_tok0 // P, 0, maxp - 1)
        pid = jnp.take_along_axis(page_table, page_idx, axis=1)  # (B, R)
        row_in_page = (row_tok0 % P) // f                      # (B, R)
        j = jnp.arange(f, dtype=jnp.int32)[None, None, :]      # (1, 1, f)
        sidx = (g[..., None] * f + j) - (base[:, None, None] % f)  # (B,R,f)
        maxL = ecfg.max_pages_per_slot * P
        valid = (sidx >= 0) & (sidx < cnt[:, None, None]) & \
            (row_tok0[..., None] < maxL)
        row_any = jnp.any(valid, axis=-1)                      # (B, R)
        pid_safe = jnp.where(row_any, pid, trash)

        sclip = jnp.clip(sidx, 0, k_win - 1).reshape(b, R * f)  # (B, R*f)

        def gather_side(vals):                                 # (B,H,k,D)
            h = vals.shape[1]
            gath = jnp.take_along_axis(
                vals, sclip[:, None, :, None].astype(jnp.int32),
                axis=2)                                        # (B,H,R*f,D)
            gath = gath.reshape(b, h, R, f, dkv)
            return jnp.transpose(gath, (0, 2, 1, 3, 4)).reshape(
                b, R, h, f * dkv)

        lane_valid = jnp.repeat(valid, dkv, axis=-1)[:, :, None, :]

        vals = layer_kv.values
        scales = layer_kv.scales
        for plane, sb in ((0, side_k), (1, side_v)):
            old = vals[pid_safe, plane, :, row_in_page]        # (B,R,H,fD)
            new = jnp.where(lane_valid,
                            gather_side(sb.values).astype(vals.dtype), old)
            vals = vals.at[pid_safe, plane, :, row_in_page].set(new)
            if scales is not None:
                h = sb.values.shape[1]
                cols = (jnp.arange(h, dtype=jnp.int32)[None, None, None, :]
                        * (P // f) + row_in_page[:, :, None, None])
                pid4 = pid_safe[:, :, None, None]
                j4 = j.reshape(1, 1, f, 1)
                old_s = scales[pid4, plane, j4, cols]          # (B,R,f,H)
                gs = jnp.take_along_axis(
                    sb.scales[..., 0], sclip[:, None, :], axis=2)  # (B,H,R*f)
                gs = jnp.transpose(gs.reshape(b, h, R, f), (0, 2, 3, 1))
                new_s = jnp.where(valid[..., None], gs, old_s)
                scales = scales.at[pid4, plane, j4, cols].set(new_s)
        return KVTensor(vals, scales)

    def _make_window_multi_step(self):
        from flasht5_tpu.inference.paged_kv import (build_chunked_worklist,
                                                    kv_packing_factor)
        step = self._make_window_step()
        config, ecfg = self.config, self.ecfg
        k = ecfg.steps_per_sync
        quant = ecfg.kv_dtype == "int8"
        P = ecfg.page_size

        def multi(params, layers, page_table, released, enc_len, pos,
                  cur_token, active, budget):
            # local (shard) sizes — see the step's shard-oblivious note
            b = enc_len.shape[0]
            dkv = config.d_kv
            h = (params["decoder"]["block"][0]["self_attention_layer"]
                 ["self_attention"]["Wq"].shape[1] // dkv)
            # zero stale committed counts of released-but-unreused slots so
            # the empty-pool kernel skip (max(base) > 0) stays armed under
            # churn; the host mask rides the window dispatch for free
            pos = jnp.where(released, 0, pos)
            base = pos                       # committed tokens, fixed window
            n_pool = layers[0]["pages_kv"].values.shape[0]
            staged = None
            if self._use_window_stage():
                staged = tuple(
                    gather_pool_dense(layer["pages_kv"].values,
                                      layer["pages_kv"].scales, page_table,
                                      head_dim=config.d_kv, dequant=False)
                    for layer in layers)
            worklist = (None
                        if staged is not None or self._use_dense_read()
                        else build_chunked_worklist(
                            page_table, base, page_size=P,
                            chunk=ecfg.pages_per_item, n_pages=n_pool))
            sdt = (jnp.int8 if quant
                   else jnp.dtype(config.dtype))

            def empty_side():
                vals = jnp.zeros((b, h, k, dkv), sdt)
                scales = (jnp.zeros((b, h, k, 1), jnp.float32)
                          if quant else None)
                return KVTensor(vals, scales)

            side0 = tuple((empty_side(), empty_side()) for _ in layers)

            def body(carry, t):
                side, pos, cur_token, active, budget = carry
                was_active = active
                (side, pos, cur_token, active, budget, nxt,
                 finished) = step(params, layers, page_table, worklist,
                                  staged, base, side, t, enc_len, pos,
                                  cur_token, active, budget)
                return ((side, pos, cur_token, active, budget),
                        (nxt, finished, was_active))

            (side, pos, cur_token, active, budget), outs = jax.lax.scan(
                body, (side0, pos, cur_token, active, budget),
                jnp.arange(k, dtype=jnp.int32))

            cnt = pos - base
            new_layers = tuple(
                {**layer, "pages_kv": self._flush_side(
                    layer["pages_kv"], side[li][0], side[li][1],
                    page_table, base, cnt)}
                for li, layer in enumerate(layers))
            return (new_layers, enc_len, pos, cur_token, active,
                    budget), outs

        return multi

    # -- host scheduler ----------------------------------------------------

    def run(self, requests: List[Request]) -> List[Request]:
        queue = list(requests)
        slots: List[Optional[Request]] = [None] * self.ecfg.max_slots
        emitted: List[List[int]] = [[] for _ in range(self.ecfg.max_slots)]
        st = self.state
        P = self.ecfg.page_size

        def admit():
            # free every finished slot's pages BEFORE fitting new requests,
            # so an oversubscribed pool never strands pages on empty slots
            for i in range(self.ecfg.max_slots):
                if slots[i] is None:
                    st.release(i)
            # select admissible requests FIFO (capacity-aware, reserving
            # pages as we go — oversubscribed pools defer at the first
            # request that doesn't fit, identical to per-request admission)
            take = []
            for i in range(self.ecfg.max_slots):
                if slots[i] is not None or not queue:
                    continue
                req = queue[0]
                max_new = min(req.max_new_tokens,
                              self.ecfg.max_pages_per_slot * P - 1)
                if not st.can_allocate(i, max_new + 1, P):
                    if not any(s is not None for s in slots) and not take:
                        raise RuntimeError(
                            "request %r needs %d tokens of KV but the "
                            "whole pool is %d pages x %d" %
                            (req.uid, max_new + 1, self.ecfg.num_pages, P))
                    break
                queue.pop(0)
                st.ensure_capacity(i, max_new + 1, P)
                take.append((req, i, max_new))
            # ONE batched encode per bucket for everything admitted this
            # cycle — under churn the per-request encode round-trips were
            # the dominant cost of heavy-tail XL serving (SERVING_XL_PAGED
            # _r05: 96 admissions x one full XL encode each)
            by_bucket: Dict[int, list] = {}
            for req, i, max_new in take:
                L = min(len(req.input_ids), self.ecfg.max_encode_len)
                by_bucket.setdefault(self._bucket_for(L), []).append(
                    (req, i, max_new, L))
            for bucket, items in by_bucket.items():
                nb = self._prefill_batch(len(items))
                padded = np.zeros((nb, bucket), np.int32)
                for j, (req, i, max_new, L) in enumerate(items):
                    padded[j, :L] = req.input_ids[:L]
                cross = self._encode_fn(bucket, nb)(self.params,
                                                    jnp.asarray(padded))
                for j, (req, i, max_new, L) in enumerate(items):
                    out = self._insert_fn(
                        st.layers, st.enc_len, st.pos, st.cur_token,
                        st.active, st.budget, cross, j, i, bucket, max_new)
                    (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
                     st.budget) = out
                    slots[i] = req
                    emitted[i] = []

        admit()
        while any(s is not None for s in slots):
            released = np.array([s is None for s in slots], np.bool_)
            carry, (toks, fins, actives) = self._multi_step_fn(
                self.params, st.layers, jnp.asarray(st.page_table),
                jnp.asarray(released), st.enc_len, st.pos, st.cur_token,
                st.active, st.budget)
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
