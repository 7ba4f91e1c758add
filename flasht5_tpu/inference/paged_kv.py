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
