"""Paged KV cache: global page pool + per-slot page tables + ragged decode.

North-star serving component (PAPERS: "Ragged Paged Attention ... for TPU").
The slot-pool engine allocates max_decode_len per slot; paging replaces that
with a shared pool of fixed-size pages so memory scales with TOKENS IN
FLIGHT, not slots x worst-case length — the enabler for large mixed-length
request batches.

Device state:
    pages_k/pages_v: (num_pages, H, page_size, D)   [bf16/fp32 or int8]
    (+ per-position scales (num_pages, H, page_size, 1) when quantized)
    page_table:      (max_slots, max_pages_per_slot) int32 page ids
    lengths:         (max_slots,) tokens written per slot

Host state: a free-list allocator (the scheduler already lives host-side).

The decode kernel uses PrefetchScalarGridSpec: the page table is a
scalar-prefetch operand, so each (slot, j) grid cell's BlockSpec index_map
dereferences page_table[slot, j] to DMA exactly that page — the TPU-idiomatic
form of "paged attention" (indices drive the DMA schedule, not gathers).
Online softmax accumulates across a slot's pages in VMEM scratch.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flasht5_tpu.ops.quant import quantize_kv
from flasht5_tpu.runtime import interpret_mode

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Pool + allocator
# ---------------------------------------------------------------------------

class PagedKVPool:
    """Device page pool with a host-side free-list allocator."""

    def __init__(self, num_pages: int, num_heads: int, page_size: int,
                 head_dim: int, max_slots: int, max_pages_per_slot: int,
                 dtype=jnp.float32, quantized: bool = False):
        self.page_size = page_size
        self.quantized = quantized
        store = jnp.int8 if quantized else dtype
        self.pages_k = jnp.zeros((num_pages, num_heads, page_size, head_dim), store)
        self.pages_v = jnp.zeros_like(self.pages_k)
        if quantized:
            self.scales_k = jnp.zeros((num_pages, num_heads, page_size, 1), jnp.float32)
            self.scales_v = jnp.zeros_like(self.scales_k)
        else:
            self.scales_k = self.scales_v = None
        self.page_table = jnp.zeros((max_slots, max_pages_per_slot), jnp.int32)
        self.lengths = jnp.zeros((max_slots,), jnp.int32)
        self._free: List[int] = list(range(num_pages))
        self._owned: List[List[int]] = [[] for _ in range(max_slots)]

    # -- host-side allocation --
    def alloc_page(self, slot: int) -> int:
        if not self._free:
            raise RuntimeError("KV page pool exhausted")
        page = self._free.pop()
        idx = len(self._owned[slot])
        self._owned[slot].append(page)
        self.page_table = self.page_table.at[slot, idx].set(page)
        return page

    def ensure_capacity(self, slot: int, tokens: int):
        while len(self._owned[slot]) * self.page_size < tokens:
            self.alloc_page(slot)

    def release(self, slot: int):
        self._free.extend(self._owned[slot])
        self._owned[slot] = []
        self.lengths = self.lengths.at[slot].set(0)

    # -- device-side append --
    def append(self, slot_ids: jnp.ndarray, k_new: jnp.ndarray,
               v_new: jnp.ndarray):
        """Append one token's K/V for each listed slot.

        slot_ids: (B,) int32; k_new/v_new: (B, H, D). Positions are the
        slots' current lengths (ensure_capacity first).
        """
        pos = self.lengths[slot_ids]
        page_idx = pos // self.page_size
        offset = pos % self.page_size
        page_ids = self.page_table[slot_ids, page_idx]
        if self.quantized:
            kq, ks = quantize_kv(k_new)
            vq, vs = quantize_kv(v_new)
            self.pages_k = self.pages_k.at[page_ids, :, offset].set(
                kq.astype(self.pages_k.dtype))
            self.pages_v = self.pages_v.at[page_ids, :, offset].set(
                vq.astype(self.pages_v.dtype))
            self.scales_k = self.scales_k.at[page_ids, :, offset].set(ks)
            self.scales_v = self.scales_v.at[page_ids, :, offset].set(vs)
        else:
            self.pages_k = self.pages_k.at[page_ids, :, offset].set(
                k_new.astype(self.pages_k.dtype))
            self.pages_v = self.pages_v.at[page_ids, :, offset].set(
                v_new.astype(self.pages_v.dtype))
        self.lengths = self.lengths.at[slot_ids].add(1)


# ---------------------------------------------------------------------------
# Reference
# ---------------------------------------------------------------------------

def paged_decode_attention_ref(q, pool: PagedKVPool, *, sm_scale=1.0,
                               bias=None):
    """Oracle: gather each slot's pages densely, run masked attention.

    q: (max_slots, H, D); bias: (max_slots, H, max_pages*page_size) or None.
    """
    b, h, d = q.shape
    P = pool.page_size
    maxp = pool.page_table.shape[1]
    # (B, maxp, H, P, D) -> (B, H, maxp*P, D)
    k = pool.pages_k[pool.page_table]
    v = pool.pages_v[pool.page_table]
    if pool.quantized:
        k = k.astype(jnp.float32) * pool.scales_k[pool.page_table]
        v = v.astype(jnp.float32) * pool.scales_v[pool.page_table]
    k = jnp.transpose(k, (0, 2, 1, 3, 4)).reshape(b, h, maxp * P, d)
    v = jnp.transpose(v, (0, 2, 1, 3, 4)).reshape(b, h, maxp * P, d)
    s = jnp.einsum("bhd,bhld->bhl", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    pos = jnp.arange(maxp * P)
    s = jnp.where(pos[None, None, :] < pool.lengths[:, None, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhl,bhld->bhd", p, v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _paged_kernel(pt_ref, len_ref, meta_ref, q_ref, k_ref, v_ref, ks_ref,
                  vs_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  sm_scale, page_size, quantized, has_bias):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = len_ref[b]
    # skip pages entirely past this slot's length
    @pl.when(j * page_size < length)
    def _compute():
        # All heads in one pair of matmuls with own-head block masking —
        # same design as ops/decode_attention._kernel_flat; at page_size 16
        # the pages are so small that the 2*H narrow matvecs of the per-head
        # form were pure pipeline latency. Quantized pages dequant in fp32
        # BEFORE the (tiny, latency-bound) matmuls — bit-faithful to the
        # oracle, and the VPU cost is H*P*D elements per page.
        nh = q_ref.shape[1]
        d = q_ref.shape[2]
        hp = nh * page_size
        if quantized:
            cdt = jnp.float32
            kf = (k_ref[0].astype(jnp.float32) * ks_ref[0])
            vf = (v_ref[0].astype(jnp.float32) * vs_ref[0])
        else:
            cdt = (jnp.float32 if k_ref.dtype == jnp.float32
                   and q_ref.dtype == jnp.float32 else jnp.bfloat16)
            kf = k_ref[0].astype(cdt)
            vf = v_ref[0].astype(cdt)
        q = q_ref[0].astype(cdt)                          # (H, D)
        s = jax.lax.dot_general(
            q, kf.astype(cdt).reshape(hp, d), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # (H, HP)
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)    # (1, HP)
        chead = meta_ref[0:1, :]                          # (1, HP)
        pos = j * page_size + meta_ref[1:2, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (nh, hp), 0)
        own = (chead == row) & (pos < length)
        s = jnp.where(own, s, _NEG_INF)

        m_prev = m_scr[...]                               # (H, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(own, jnp.exp(s - m_new), 0.0)       # (H, HP)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(cdt), vf.astype(cdt).reshape(hp, d),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (H, D)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(j == n_pages - 1)
    def _finalize():
        l = l_scr[...]                                    # (H, 1)
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def _ragged_kernel(pid_ref, ws_ref, wp_ref, first_ref, last_ref, orow_ref,
                   pidf_ref, len_ref,
                   meta_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref,
                   o_ref, m_scr, l_scr, acc_scr, *,
                   sm_scale, page_size, quantized, has_bias):
    """Work-list form of _paged_kernel: one grid cell per ACTIVE page.

    The grid is (pool_capacity,), not (slots, max_pages_per_slot): a
    scalar-prefetched work list maps cell g to (slot ws[g], in-slot page
    wp[g], pool page pid[g]), entries grouped by slot with pages ascending
    (the TPU grid is sequential, so the online-softmax accumulators carry
    across a slot's pages). Decode time scales with tokens in flight — the
    pool is provisioned for live tokens — instead of slots x worst-case
    length; padding cells (g >= total active pages) re-fetch page 0 and
    skip compute, and their output DMA is routed to a garbage row."""
    g = pl.program_id(0)
    slot = ws_ref[g]
    in_slot = wp_ref[g]
    active = pid_ref[g] >= 0

    @pl.when(first_ref[g] == 1)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = len_ref[slot]

    @pl.when(active)
    def _compute():
        nh = q_ref.shape[1]
        d = q_ref.shape[2]
        hp = nh * page_size
        if quantized:
            cdt = jnp.float32
            kf = (k_ref[0].astype(jnp.float32) * ks_ref[0])
            vf = (v_ref[0].astype(jnp.float32) * vs_ref[0])
        else:
            cdt = (jnp.float32 if k_ref.dtype == jnp.float32
                   and q_ref.dtype == jnp.float32 else jnp.bfloat16)
            kf = k_ref[0].astype(cdt)
            vf = v_ref[0].astype(cdt)
        q = q_ref[0].astype(cdt)                          # (H, D)
        s = jax.lax.dot_general(
            q, kf.astype(cdt).reshape(hp, d), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # (H, HP)
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)    # (1, HP)
        chead = meta_ref[0:1, :]                          # (1, HP)
        pos = in_slot * page_size + meta_ref[1:2, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (nh, hp), 0)
        own = (chead == row) & (pos < length)
        s = jnp.where(own, s, _NEG_INF)

        m_prev = m_scr[...]                               # (H, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(own, jnp.exp(s - m_new), 0.0)       # (H, HP)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(cdt), vf.astype(cdt).reshape(hp, d),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (H, D)
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(last_ref[g] == 1)
    def _finalize():
        l = l_scr[...]                                    # (H, 1)
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def paged_decode_attention_ragged(q, pages_k, pages_v, scales_k, scales_v,
                                  page_table, lengths, *,
                                  sm_scale: float = 1.0,
                                  bias: Optional[jnp.ndarray] = None):
    """Ragged work-list paged decode (see _ragged_kernel). Same signature and
    semantics as paged_decode_attention_arrays; jit/scan friendly (the work
    list is built with static-shape XLA ops from page_table/lengths)."""
    b, h, d = q.shape
    P = pages_k.shape[2]
    G = pages_k.shape[0]                  # pool capacity = max active pages
    maxp = page_table.shape[1]
    quantized = scales_k is not None
    has_bias = bias is not None

    npages = (lengths + P - 1) // P                       # (b,)
    ends = jnp.cumsum(npages)
    starts = ends - npages
    total = ends[-1]
    g_ids = jnp.arange(G, dtype=jnp.int32)
    active = g_ids < total
    ws = jnp.searchsorted(ends, g_ids, side="right").astype(jnp.int32)
    ws = jnp.minimum(ws, b - 1)
    wp = jnp.clip(g_ids - starts[ws], 0, maxp - 1).astype(jnp.int32)
    pid = jnp.where(active, page_table[ws, wp], -1).astype(jnp.int32)
    first = (active & (wp == 0)).astype(jnp.int32)
    last = (active & (wp == npages[ws] - 1)).astype(jnp.int32)
    # non-final (and padding) output DMAs land on garbage row b
    o_row = jnp.where(last == 1, ws, b).astype(jnp.int32)
    pid_fetch = jnp.maximum(pid, 0)                       # page to DMA

    dummy_s = jnp.zeros((1, 1, 1, 1), jnp.float32)
    if has_bias:
        bias_in = (bias.reshape(b, h, maxp, P).transpose(0, 2, 1, 3)
                   .reshape(b, maxp, 1, h * P))
    else:
        bias_in = jnp.zeros((1, 1, 1, 1), jnp.float32)
    meta = jnp.stack([
        jnp.repeat(jnp.arange(h, dtype=jnp.int32), P),
        jnp.tile(jnp.arange(P, dtype=jnp.int32), h)])     # (2, H*P)

    # prefetch order: pid, ws, wp, first, last, o_row, pid_fetch, lengths
    def page_map(gg, pid_r, ws_r, wp_r, f_r, l_r, orow_r, pf_r, ln_r):
        return (pf_r[gg], 0, 0, 0)

    def slot_map(gg, pid_r, ws_r, wp_r, f_r, l_r, orow_r, pf_r, ln_r):
        return (ws_r[gg], 0, 0)

    def bias_map(gg, pid_r, ws_r, wp_r, f_r, l_r, orow_r, pf_r, ln_r):
        return (ws_r[gg], wp_r[gg], 0, 0)

    def const_map(gg, pid_r, ws_r, wp_r, f_r, l_r, orow_r, pf_r, ln_r):
        return (0, 0)

    def const4_map(gg, pid_r, ws_r, wp_r, f_r, l_r, orow_r, pf_r, ln_r):
        return (0, 0, 0, 0)

    def out_map(gg, pid_r, ws_r, wp_r, f_r, l_r, orow_r, pf_r, ln_r):
        return (orow_r[gg], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((2, h * P), const_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, d), slot_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, P, d), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, P, d), page_map, memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, h, P, 1), page_map, memory_space=pltpu.VMEM)
             if quantized else
             pl.BlockSpec((1, 1, 1, 1), const4_map, memory_space=pltpu.VMEM)),
            (pl.BlockSpec((1, h, P, 1), page_map, memory_space=pltpu.VMEM)
             if quantized else
             pl.BlockSpec((1, 1, 1, 1), const4_map, memory_space=pltpu.VMEM)),
            (pl.BlockSpec((1, 1, 1, h * P), bias_map,
                          memory_space=pltpu.VMEM)
             if has_bias else
             pl.BlockSpec((1, 1, 1, 1), const4_map, memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((1, h, d), out_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    kern = functools.partial(_ragged_kernel, sm_scale=sm_scale, page_size=P,
                             quantized=quantized, has_bias=has_bias)
    # kernel reads the accumulators at j==last even when some final write
    # raced nothing: grid is sequential, grouping by slot is guaranteed.
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b + 1, h, d), q.dtype),
        interpret=interpret_mode(),
    )(pid, ws, wp, first, last, o_row, pid_fetch,
      lengths.astype(jnp.int32), meta, q, pages_k, pages_v,
      scales_k if quantized else dummy_s,
      scales_v if quantized else dummy_s,
      bias_in)
    # empty slots own no work-list entry, so their output row is never
    # written — mask to zero for determinism
    return jnp.where(lengths[:, None, None] > 0, out[:b], 0.0).astype(q.dtype)


def kv_packing_factor(head_dim: int, page_size: int) -> int:
    """Tokens packed per 128-lane row: f = 128//D when D divides 128 and
    f divides the page size; 1 otherwise (D>=128, or indivisible shapes)."""
    if head_dim >= 128 or 128 % head_dim != 0:
        return 1
    f = 128 // head_dim
    while f > 1 and page_size % f != 0:
        f //= 2
    return f


def pack_kv_pages(pages, scales=None):
    """Repack a (num_pages, H, P, D) page pool into the lane-aligned layout
    the chunked kernel DMAs from.

    TPU VMEM/DMA tiling is 128 lanes wide; at d_kv<128, a (.., P, D) page is
    a partial-lane slice that Mosaic cannot extract with an async copy
    (packed int8 tiles doubly so — measured: 'Slice shape along dimension 3
    must be aligned to tiling (128), but is 64'). Packing f = 128//D
    CONSECUTIVE TOKENS per 128-lane row makes every page DMA full-width:

        pages2:  (num_pages, H, P//f, f*D)  row r = [token f*r | ... | f*r+f-1]
        scales2: (num_pages, f, H * P//f)   plane j = parity-j tokens, in the
                                            kernel's (H, P//f) row order

    f=1 (D>=128) degenerates to the unpacked layout.
    """
    n, h, P, d = pages.shape
    f = kv_packing_factor(d, P)
    pages2 = pages.reshape(n, h, P // f, f * d)
    if scales is not None:
        s = scales.reshape(n, h, P // f, f)
        scales2 = jnp.stack(
            [s[..., j].reshape(n, h * (P // f)) for j in range(f)], axis=1)
    else:
        scales2 = None
    return pages2, scales2


def pack_kv_pages_fused(pages_k, pages_v, scales_k=None, scales_v=None):
    """Fuse K and V (and their scales) into single per-page records so each
    page costs TWO DMAs (one int8/bf16 record, one fp32 scale record)
    instead of four — per-page DMA start/wait pairs were the measured
    bottleneck of the chunked kernel after compute fattening
    (docs/paged_roofline_chunked.json).

        pages_kv:  (num_pages, 2, H, P//f, f*D)   [0]=K rows, [1]=V rows
        scales_kv: (num_pages, 2, f, H * P//f)    [kv, parity, (H,P//f) row]
    """
    pk2, sk2 = pack_kv_pages(pages_k, scales_k)
    pv2, sv2 = pack_kv_pages(pages_v, scales_v)
    pages_kv = jnp.stack([pk2, pv2], axis=1)
    scales_kv = (None if sk2 is None
                 else jnp.stack([sk2, sv2], axis=1))
    return pages_kv, scales_kv


def _chunked_kernel(ws_ref, first_ref, last_ref, orow_ref, active_ref,
                    base_ref, pids_ref, len_ref,
                    q_ref, bias_ref, kv_hbm, skv_hbm,
                    o_ref, *state_refs,
                    sm_scale, page_size, head_dim, pack, chunk, quantized,
                    has_bias, return_state=False):
    if return_state:
        m_ref, l_ref = state_refs[0], state_refs[1]
        state_refs = state_refs[2:]
    (m_scr, l_scr, acc_scr, kvbuf, skvbuf, kvsem, skvsem) = state_refs
    """Chunked work-list paged decode over the PACKED page layout.

    One grid cell = up to `chunk` consecutive in-slot pages, manually DMA'd
    from HBM with cross-item double buffering: item g waits on the page
    copies started at item g-1 (buffer g%2), starts item g+1's pages into
    buffer (g+1)%2 (page ids come from the scalar-prefetched work list), and
    computes over the whole buffer at once — the single-page work-list
    kernel is PROGRAM-bound (31 GB/s at page 16 / 78 GB/s at page 128,
    docs/paged_roofline.json), so items must be fat and DMAs must overlap
    compute across items.

    Packed rows hold f = 128//D tokens (pack_kv_pages), so scores come from
    ONE f-stacked zero-padded q matmul that cannot mix tokens: score rows
    [j*H:(j+1)*H] carry q shifted to lane offset j*D and hit only parity-j
    tokens; per-token int8 scales FOLD INTO the scores (k) and
    probabilities (v) as row-wise multiplies instead of dequantizing K/V
    element-wise; PV recombines as sum_j pv[j*H:(j+1)*H, j*D:(j+1)*D]. The
    online-softmax accumulators carry across a slot's items on the
    sequential grid exactly as in _ragged_kernel."""
    g = pl.program_id(0)
    n_items = pl.num_programs(0)
    nh = q_ref.shape[1]
    d = head_dim
    f = pack
    pp = page_size // f                    # packed rows per page
    hpp = nh * pp
    rows = chunk * hpp

    def start_dmas(buf, item):
        for ci in range(chunk):
            pid = pids_ref[item * chunk + ci]
            pltpu.make_async_copy(kv_hbm.at[pid], kvbuf.at[buf, ci],
                                  kvsem.at[buf, ci]).start()
            if quantized:
                pltpu.make_async_copy(skv_hbm.at[pid], skvbuf.at[buf, ci],
                                      skvsem.at[buf, ci]).start()

    def wait_dmas(buf):
        for ci in range(chunk):
            pltpu.make_async_copy(kv_hbm.at[0], kvbuf.at[buf, ci],
                                  kvsem.at[buf, ci]).wait()
            if quantized:
                pltpu.make_async_copy(skv_hbm.at[0], skvbuf.at[buf, ci],
                                      skvsem.at[buf, ci]).wait()

    # the work list is sorted (active items form a prefix of the grid), so
    # gating every start/wait on the TARGET item's active flag keeps
    # start/wait pairs matched while padding items cost nothing — without
    # this, pad items re-DMA page 0 and dominate at low occupancy (the
    # first on-chip run spent ~2/3 of its time on them)
    @pl.when((g == 0) & (active_ref[0] == 1))
    def _warm():
        start_dmas(0, 0)

    @pl.when((g + 1 < n_items) & (active_ref[jnp.minimum(g + 1, n_items - 1)] == 1))
    def _prefetch_next():
        start_dmas((g + 1) % 2, g + 1)

    buf = g % 2

    @pl.when(first_ref[g] == 1)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    slot = ws_ref[g]
    length = len_ref[slot]
    base = base_ref[g] * chunk        # first in-slot page of this item

    @pl.when(active_ref[g] == 1)
    def _compute():
        wait_dmas(buf)
        kv = kvbuf[buf]                                   # (chunk,2,h,pp,f*d)
        cdt = jnp.float32 if (quantized or q_ref.dtype == jnp.float32
                              and kvbuf.dtype != jnp.bfloat16) else jnp.bfloat16
        kflat = kv[:, 0].astype(cdt).reshape(rows, f * d)
        vflat = kv[:, 1].astype(cdt).reshape(rows, f * d)
        q = q_ref[0].astype(cdt)                          # (H, D)
        zeros = jnp.zeros_like(q)
        # ONE f-stacked matmul covers all parities: rows [j*H:(j+1)*H]
        # carry q at lane offset j*D and hit only parity-j tokens
        q_all = jnp.concatenate(
            [jnp.concatenate([zeros] * j + [q] + [zeros] * (f - 1 - j),
                             axis=1) if f > 1 else q
             for j in range(f)], axis=0)                   # (fH, fD)
        s_all = jax.lax.dot_general(
            q_all, kflat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (fH, rows)

        def per_parity_rows(x):
            # (chunk, f, hpp) [ci, parity, row] -> (fH, rows): row block j
            # carries the parity-j token values
            planes = jnp.stack([x[:, j, :].reshape(rows)
                                for j in range(f)])        # (f, rows)
            return jnp.repeat(planes, nh, axis=0)          # (fH, rows)

        if quantized:
            # per-token K scales fold into the scores: s = (q . k_int8) * sk
            skv = skvbuf[buf]                              # (chunk,2,f,hpp)
            s_all = s_all * per_parity_rows(skv[:, 0])
        if sm_scale != 1.0:
            s_all = s_all * sm_scale
        if has_bias:
            bias = bias_ref[0, 0, 0]                       # (chunk, f, hpp)
            s_all = s_all + per_parity_rows(bias).astype(jnp.float32)

        col = jax.lax.broadcasted_iota(jnp.int32, (f * nh, rows), 1)
        ci = col // hpp
        within_hp = col - ci * hpp
        chead = within_hp // pp
        within = within_hp - chead * pp
        row_id = jax.lax.broadcasted_iota(jnp.int32, (f * nh, rows), 0)
        parity = row_id // nh                              # token parity j
        pos = (base + ci) * page_size + f * within + parity
        own = (chead == row_id - parity * nh) & (pos < length)
        s_all = jnp.where(own, s_all, _NEG_INF)

        m_prev = m_scr[...]                                # (H, 1)
        m_new = m_prev
        for j in range(f):
            m_new = jnp.maximum(m_new, jnp.max(
                s_all[j * nh:(j + 1) * nh], axis=1, keepdims=True))
        m_all = jnp.concatenate([m_new] * f, axis=0)       # (fH, 1)
        alpha = jnp.exp(m_prev - m_new)
        p_all = jnp.where(own, jnp.exp(s_all - m_all), 0.0)
        lsum = jnp.zeros_like(m_new)
        for j in range(f):
            lsum = lsum + jnp.sum(p_all[j * nh:(j + 1) * nh], axis=1,
                                  keepdims=True)
        l_scr[...] = l_scr[...] * alpha + lsum
        m_scr[...] = m_new
        if quantized:
            # per-token V scales fold into the probabilities
            p_all = p_all * per_parity_rows(skvbuf[buf][:, 1])
        pv_all = jax.lax.dot_general(
            p_all.astype(cdt), vflat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (fH, fD)
        pv = pv_all[:nh, :d]
        for j in range(1, f):
            pv = pv + pv_all[j * nh:(j + 1) * nh, j * d:(j + 1) * d]
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(last_ref[g] == 1)
    def _finalize():
        l = l_scr[...]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        if return_state:
            m_ref[0] = m_scr[...]
            l_ref[0] = l


def build_chunked_worklist(page_table, lengths, *, page_size: int,
                           chunk: int, n_pages: int):
    """Work-list construction for the chunked kernel, exposed so engines can
    hoist it out of per-step code: within a decode window the committed
    lengths and page table are FIXED, so one work-list serves every step of
    every layer (the r3 engine rebuilt it per layer per step — part of the
    measured paged append tax)."""
    b = page_table.shape[0]
    maxp = page_table.shape[1]
    # MUST mirror the kernel wrapper's clamp (paged_decode_attention_
    # chunked_packed): the kernel strides this list as pids[item*chunk+ci]
    # with ITS clamped chunk, so an externally hoisted list built with a
    # wider chunk is silently misaligned — every slot but the first read
    # the wrong pages whenever max_pages_per_slot < pages_per_item
    # (latent r3-r5 bug, caught by the sharded-paged parity tests whose
    # per-shard slot-0s disagreed with the single-device engine).
    chunk = max(1, min(chunk, maxp))
    P = page_size
    n_items = (n_pages + chunk - 1) // chunk + b
    npages = (lengths + P - 1) // P                        # (b,)
    nitems = (npages + chunk - 1) // chunk
    ends = jnp.cumsum(nitems)
    starts = ends - nitems
    total = ends[-1]
    g_ids = jnp.arange(n_items, dtype=jnp.int32)
    active = g_ids < total
    ws = jnp.searchsorted(ends, g_ids, side="right").astype(jnp.int32)
    ws = jnp.minimum(ws, b - 1)
    item_in_slot = jnp.clip(g_ids - starts[ws], 0, maxp - 1)
    first = (active & (item_in_slot == 0)).astype(jnp.int32)
    last = (active & (item_in_slot == nitems[ws] - 1)).astype(jnp.int32)
    o_row = jnp.where(last == 1, ws, b).astype(jnp.int32)
    ci = jnp.arange(chunk, dtype=jnp.int32)
    in_slot = item_in_slot[:, None] * chunk + ci[None, :]  # (n_items, chunk)
    pids = page_table[ws[:, None], jnp.clip(in_slot, 0, maxp - 1)]
    pids = jnp.where(active[:, None] & (in_slot < npages[ws][:, None]),
                     pids, 0).astype(jnp.int32).reshape(-1)
    return (ws, first, last, o_row, active.astype(jnp.int32),
            item_in_slot.astype(jnp.int32), pids)


def dense_small_pool_attention(q, pages_kv, scales_kv, page_table, lengths, *,
                               sm_scale: float = 1.0,
                               bias: Optional[jnp.ndarray] = None,
                               return_state: bool = False):
    """Small-pool decode attention over the SAME fused packed page pool as
    the chunked kernel, read via one XLA gather instead of a Pallas launch.

    The chunked kernel is the right tool at scale (0.85 of the HBM roofline
    at 64 slots x 2048 int8 tokens, docs/paged_roofline_chunked.json) but is
    launch-bound when max_pages_per_slot*P is a few hundred tokens: the
    window decode step pays 8 kernel launches per token (one per layer) to
    read a pool that fits a single fused XLA region. Same (out[, m, l]) API
    so the engine swaps readers at trace time; the paged memory model
    (pool + page table, tokens-in-flight footprint) is unchanged."""
    kf, vf = gather_pool_dense(pages_kv, scales_kv, page_table,
                               head_dim=q.shape[-1])
    return dense_cache_attention(q, kf, vf, lengths, sm_scale=sm_scale,
                                 bias=bias, return_state=return_state)


def gather_pool_dense(pages_kv, scales_kv, page_table, *, head_dim,
                      dequant=True):
    """Gather a fused packed page pool into slot-dense (B, H, maxp*P, D)
    K and V caches (the slot engine's layout). dequant=True returns f32;
    dequant=False returns ((k_vals, k_scales), (v_vals, v_scales)) in the
    pool dtype so per-step readers pay int8 bandwidth like the slot
    engine (the window-staging path)."""
    n_pages, _, h, pp, d2 = pages_kv.shape
    d = head_dim
    f = d2 // d
    P = pp * f
    b, maxp = page_table.shape
    maxL = maxp * P
    gath = jnp.take(pages_kv, page_table, axis=0)   # (B, maxp, 2, H, pp, fD)
    gath = gath.reshape(b, maxp, 2, h, pp, f, d)
    kv = jnp.transpose(gath, (2, 0, 3, 1, 4, 5, 6)).reshape(2, b, h, maxL, d)
    sc = None
    if scales_kv is not None:
        # scales[p, plane, j, h*pp + r] scales token r*f + j of head h
        sg = jnp.take(scales_kv, page_table, axis=0)  # (B, maxp, 2, f, h*pp)
        sg = sg.reshape(b, maxp, 2, f, h, pp)
        sc = jnp.transpose(sg, (2, 0, 4, 1, 5, 3)).reshape(2, b, h, maxL, 1)
    if not dequant:
        return ((kv[0], None if sc is None else sc[0]),
                (kv[1], None if sc is None else sc[1]))
    kf = kv[0].astype(jnp.float32)
    vf = kv[1].astype(jnp.float32)
    if sc is not None:
        kf = kf * sc[0]
        vf = vf * sc[1]
    return kf, vf


def dense_cache_attention(q, kf, vf, lengths, *, sm_scale=1.0, bias=None,
                          return_state=False):
    """Masked single-query attention over a dense f32 (B, H, maxL, D) cache;
    same (out[, m, l]) contract as the chunked kernel's return_state."""
    maxL = kf.shape[2]
    s = jnp.einsum("bhd,bhnd->bhn", q.astype(jnp.float32), kf) * sm_scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    tok = jnp.arange(maxL, dtype=jnp.int32)
    mask = tok[None, None, :] < lengths[:, None, None]
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1)
    m_safe = jnp.where(m > _NEG_INF / 2, m, 0.0)
    p = jnp.where(mask, jnp.exp(s - m_safe[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    o = (jnp.einsum("bhn,bhnd->bhd", p, vf)
         / jnp.maximum(l, 1e-30)[..., None])
    out = o.astype(q.dtype)
    if not return_state:
        return out
    return out, jnp.where(l > 0, m_safe, _NEG_INF), l


def paged_decode_attention_chunked_packed(q, pages_kv, scales_kv,
                                          page_table, lengths, *,
                                          sm_scale: float = 1.0,
                                          bias: Optional[jnp.ndarray] = None,
                                          chunk: int = 8,
                                          worklist=None,
                                          return_state: bool = False):
    """Chunked work-list paged decode over FUSED PACKED pools
    (pack_kv_pages_fused layout — production keeps the pool packed; appends
    write token t to row t//f, lane block t%f). `chunk` = pages per item.

    `worklist`: optional precomputed build_chunked_worklist(...) result (the
    window-buffered engine hoists it — one list per decode window instead of
    per layer per step). `return_state`: also return the per-slot online-
    softmax (m, l) so a caller can LSE-merge this output with attention over
    uncommitted tokens (the window side buffer).
    """
    b, h, d = q.shape
    n_pages, _, _, pp, d2 = pages_kv.shape
    f = d2 // d                               # tokens packed per lane row
    P = pp * f
    maxp = page_table.shape[1]
    quantized = scales_kv is not None
    has_bias = bias is not None
    chunk = max(1, min(chunk, maxp))
    n_items = (n_pages + chunk - 1) // chunk + b

    if worklist is None:
        worklist = build_chunked_worklist(page_table, lengths,
                                          page_size=P, chunk=chunk,
                                          n_pages=n_pages)
    ws, first, last, o_row, active, item_in_slot, pids = worklist

    dummy_s = jnp.zeros((1, 2, f, h * pp), jnp.float32)
    if has_bias:
        # (B, n_chunks, 1, chunk, f, H*pp): per-item parity planes in the
        # kernel's (H, pp) row order
        pad_p = (-maxp) % chunk
        br = bias.reshape(b, h, maxp, pp, f)
        br = br.transpose(0, 2, 4, 1, 3).reshape(b, maxp, f, h * pp)
        if pad_p:
            br = jnp.pad(br, ((0, 0), (0, pad_p), (0, 0), (0, 0)))
        bias_in = br.reshape(b, (maxp + pad_p) // chunk, 1, chunk, f, h * pp)
    else:
        bias_in = jnp.zeros((1, 1, 1, 1, 1, 1), jnp.float32)

    # prefetch order: ws, first, last, o_row, active, base_chunkidx, pids, len
    def slot_map(gg, ws_r, f_r, l_r, orow_r, act_r, bidx_r, pids_r, ln_r):
        return (ws_r[gg], 0, 0)

    def bias_map(gg, ws_r, f_r, l_r, orow_r, act_r, bidx_r, pids_r, ln_r):
        return (ws_r[gg], bidx_r[gg], 0, 0, 0, 0)

    def const6_map(gg, ws_r, f_r, l_r, orow_r, act_r, bidx_r, pids_r, ln_r):
        return (0, 0, 0, 0, 0, 0)

    def out_map(gg, ws_r, f_r, l_r, orow_r, act_r, bidx_r, pids_r, ln_r):
        return (orow_r[gg], 0, 0)

    store = pages_kv.dtype
    out_specs = [pl.BlockSpec((1, h, d), out_map, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b + 1, h, d), q.dtype)]
    if return_state:
        out_specs += [pl.BlockSpec((1, h, 1), out_map,
                                   memory_space=pltpu.VMEM)] * 2
        out_shape += [jax.ShapeDtypeStruct((b + 1, h, 1), jnp.float32)] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((1, h, d), slot_map, memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, 1, 1, chunk, f, h * pp), bias_map,
                          memory_space=pltpu.VMEM)
             if has_bias else
             pl.BlockSpec((1, 1, 1, 1, 1, 1), const6_map,
                          memory_space=pltpu.VMEM)),
            # manual-DMA pools stay in HBM; the DMA engine does the
            # (now lane-aligned) page extraction
            pl.BlockSpec(memory_space=pltpu.HBM),   # fused KV page records
            pl.BlockSpec(memory_space=pltpu.HBM),   # fused scale records
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
            pltpu.VMEM((2, chunk, 2, h, pp, d2), store),
            pltpu.VMEM((2, chunk, 2, f, h * pp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA((2, chunk)),
        ],
    )
    kern = functools.partial(_chunked_kernel, sm_scale=sm_scale,
                             page_size=P, head_dim=d, pack=f, chunk=chunk,
                             quantized=quantized, has_bias=has_bias,
                             return_state=return_state)
    from flasht5_tpu.ops.flash_attention import _compiler_params
    outs = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=_compiler_params(("arbitrary",)),
        interpret=interpret_mode(),
    )(ws, first, last, o_row, active.astype(jnp.int32),
      item_in_slot.astype(jnp.int32), pids, lengths.astype(jnp.int32),
      q, bias_in, pages_kv,
      scales_kv if quantized else dummy_s)
    live = lengths[:, None, None] > 0
    out = jnp.where(live, outs[0][:b], 0.0).astype(q.dtype)
    if not return_state:
        return out
    m = jnp.where(live, outs[1][:b], _NEG_INF)
    l = jnp.where(live, outs[2][:b], 0.0)
    return out, m[..., 0], l[..., 0]


def paged_decode_attention_chunked(q, pages_k, pages_v, scales_k, scales_v,
                                   page_table, lengths, *,
                                   sm_scale: float = 1.0,
                                   bias: Optional[jnp.ndarray] = None,
                                   chunk: int = 8):
    """Standard-layout convenience wrapper: fuses + packs the pool
    (pack_kv_pages_fused) then runs the chunked packed kernel. Production
    callers keep the pool packed and call
    paged_decode_attention_chunked_packed directly — the per-call repack
    here reads the whole pool and is for tests/oracles."""
    pages_kv, scales_kv = pack_kv_pages_fused(pages_k, pages_v,
                                              scales_k, scales_v)
    return paged_decode_attention_chunked_packed(
        q, pages_kv, scales_kv, page_table, lengths,
        sm_scale=sm_scale, bias=bias, chunk=chunk)


def paged_decode_attention(q, pool: PagedKVPool, *, sm_scale: float = 1.0,
                           bias: Optional[jnp.ndarray] = None):
    """Ragged paged decode attention over a PagedKVPool (host object API)."""
    return paged_decode_attention_arrays(
        q, pool.pages_k, pool.pages_v, pool.scales_k, pool.scales_v,
        pool.page_table, pool.lengths, sm_scale=sm_scale, bias=bias)


def paged_decode_attention_arrays(q, pages_k, pages_v, scales_k, scales_v,
                                  page_table, lengths, *,
                                  sm_scale: float = 1.0,
                                  bias: Optional[jnp.ndarray] = None):
    """Functional form over raw arrays (jit/scan friendly — the engine passes
    the pool state through its compiled step).

    q: (max_slots, H, D); bias: (max_slots, H, max_pages*page_size) or None.
    """
    b, h, d = q.shape
    P = pages_k.shape[2]
    maxp = page_table.shape[1]
    quantized = scales_k is not None
    has_bias = bias is not None

    dummy_s = jnp.zeros((1, 1, 1, 1), jnp.float32)
    if has_bias:
        # (B, maxp, 1, H*P): per-page rows in the kernel's head-major
        # k_flat order
        bias_in = (bias.reshape(b, h, maxp, P).transpose(0, 2, 1, 3)
                   .reshape(b, maxp, 1, h * P))
    else:
        bias_in = jnp.zeros((1, 1, 1, 1), jnp.float32)
    meta = jnp.stack([
        jnp.repeat(jnp.arange(h, dtype=jnp.int32), P),
        jnp.tile(jnp.arange(P, dtype=jnp.int32), h)])     # (2, H*P)

    def page_map(bb, jj, pt, ln):
        return (pt[bb, jj], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, maxp),
        in_specs=[
            pl.BlockSpec((2, h * P), lambda bb, jj, pt, ln: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, d), lambda bb, jj, pt, ln: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, P, d), page_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, P, d), page_map, memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, h, P, 1), page_map, memory_space=pltpu.VMEM)
             if quantized else
             pl.BlockSpec((1, 1, 1, 1), lambda bb, jj, pt, ln: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
            (pl.BlockSpec((1, h, P, 1), page_map, memory_space=pltpu.VMEM)
             if quantized else
             pl.BlockSpec((1, 1, 1, 1), lambda bb, jj, pt, ln: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
            (pl.BlockSpec((1, 1, 1, h * P),
                          lambda bb, jj, pt, ln: (bb, jj, 0, 0),
                          memory_space=pltpu.VMEM)
             if has_bias else
             pl.BlockSpec((1, 1, 1, 1), lambda bb, jj, pt, ln: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda bb, jj, pt, ln: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    kern = functools.partial(_paged_kernel, sm_scale=sm_scale, page_size=P,
                             quantized=quantized, has_bias=has_bias)

    def run(pt, lengths, meta, q, pk, pv, sk, sv, bias_in):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
            interpret=interpret_mode(),
        )(pt, lengths, meta, q, pk, pv, sk, sv, bias_in)

    return run(page_table, lengths, meta, q, pages_k, pages_v,
               scales_k if quantized else dummy_s,
               scales_v if quantized else dummy_s,
               bias_in)
