"""Mesh-sharded PAGED continuous-batching engine: the full serving matrix.

inference/sharded_engine.py shards the SLOT engine over ("data", "tensor");
this module does the same for the paged engine, completing the north-star
combination — paged (oversubscribable) KV pools + INT8 weights/KV +
tensor sharding + continuous batching across hosts:

- weights: Megatron layout (parallel/sharding.py), incl. quantized leaves
- page pools: EACH DATA SHARD OWNS AN INDEPENDENT POOL (pool dim 0 is
  data-sharded; every shard's last local page is its own TRASH page, which
  the flush's shape-derived `trash = shape[0]-1` picks up for free). The
  host allocator keeps one free list per shard; a slot's page-table row
  holds LOCAL page ids of its owning shard, so the device-side work-list
  build and packed-record RMW run unchanged on local shapes.
- packed records: head dim tensor-sharded (vals dim 2 explicit; the scales'
  folded h*(P//f) lane dim is head-major, so tensor slicing stays aligned)
- cross-KV: slots over "data", heads over "tensor" (as the slot engine)
- decode window: the shard-oblivious _make_window_multi_step under
  shard_map — per shard it builds its local work-list, runs the chunked
  kernel over its local pool, psums only the o/wo reductions over "tensor",
  and takes the next token from the vocab-parallel argmax; window outputs
  are all-gathered over "data" so the host scheduler is unchanged.
- prefill: rows sharded over "data", then row-all-gathered (any shard may
  own the destination slot); insert is a masked SPMD write.

Requires the production paged path (kernel="chunked", window_appends=True,
no staged/dense-read experiments). Parity: tests/test_sharded_paged_engine
pins token streams against the single-device paged engine on the 8-device
CPU mesh (int8 weights + int8 KV).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import kv_cache
from flasht5_tpu.inference.engine import KVTensor, _kv_make
from flasht5_tpu.inference.paged_engine import (PagedEngineConfig,
                                                PagedInferenceEngine,
                                                PagedState)
from flasht5_tpu.models import t5
from flasht5_tpu.parallel.sharding import param_pspecs, param_shardings

_SLOT_SPEC = P("data")
_CROSS_SPEC = P("data", "tensor", None, None)
# packed records: [page, kv-plane, h, P//f, f*D] / scales [page, kv, f, h*(P//f)]
_PAGES_VALS_SPEC = P("data", None, "tensor", None, None)
_PAGES_SCALES_SPEC = P("data", None, None, "tensor")


class ShardedPagedState(PagedState):
    """PagedState whose pool dim 0 concatenates `data` independent
    per-shard pools (each with its own trash page) and whose host
    allocator keeps one free list per shard with LOCAL page ids."""

    def __init__(self, config, params, ecfg: PagedEngineConfig, data: int):
        # build arrays with pool dim = data * (num_pages + 1): constructor
        # sees num_pages' = data*(num_pages+1) - 1
        import dataclasses
        self._data = data
        self._local_pages = ecfg.num_pages
        big = dataclasses.replace(
            ecfg, num_pages=data * (ecfg.num_pages + 1) - 1)
        super().__init__(config, params, big)
        b = ecfg.max_slots
        self._slots_per_shard = b // data
        # per-shard free lists of LOCAL ids (local trash = num_pages)
        self._free_per_shard: List[List[int]] = [
            list(range(ecfg.num_pages)) for _ in range(data)]
        self._owned = [[] for _ in range(b)]

    def _shard_of(self, slot: int) -> int:
        return slot // self._slots_per_shard

    def can_allocate(self, slot: int, tokens: int, page_size: int) -> bool:
        need = -(-tokens // page_size) - len(self._owned[slot])
        return need <= len(self._free_per_shard[self._shard_of(slot)])

    def ensure_capacity(self, slot: int, tokens: int, page_size: int):
        free = self._free_per_shard[self._shard_of(slot)]
        while len(self._owned[slot]) * page_size < tokens:
            if not free:
                raise RuntimeError("KV page pool exhausted (shard %d)"
                                   % self._shard_of(slot))
            page = free.pop()
            idx = len(self._owned[slot])
            self._owned[slot].append(page)
            self.page_table[slot, idx] = page

    def release(self, slot: int):
        self._free_per_shard[self._shard_of(slot)].extend(self._owned[slot])
        self._owned[slot] = []


class ShardedPagedEngine(PagedInferenceEngine):
    """PagedInferenceEngine whose device functions run under shard_map.

    Drop-in: same PagedEngineConfig (num_pages = pages PER DATA SHARD),
    same host scheduler, same Request API. max_slots must divide evenly
    over "data"."""

    def __init__(self, config: FlashT5Config, params,
                 ecfg: PagedEngineConfig, mesh: Mesh):
        assert set(mesh.axis_names) >= {"data", "tensor"}, mesh.axis_names
        data = mesh.shape["data"]
        assert ecfg.max_slots % data == 0, (ecfg.max_slots, data)
        assert ecfg.kernel == "chunked" and ecfg.window_appends, (
            "sharded paged serving supports the production path only "
            "(kernel='chunked', window_appends=True)")
        assert ecfg.dense_read_max == 0 and ecfg.window_stage_max_bytes == 0
        # Mosaic lane-alignment constraint (found by the AOT schedule check,
        # tools/serving_overlap_check.py): the chunked kernel's packed-row
        # flatten needs the LOCAL lane count h_local*(P//f) to be a
        # multiple of 128 on real TPUs. FAT5-small (H=8, d_kv=64, P=64)
        # supports tensor<=2; T5-XL (H=32) supports tensor<=8. CPU
        # interpret mode (the parity tests) has no such limit.
        from flasht5_tpu.inference.paged_kv import kv_packing_factor
        tshards = mesh.shape["tensor"]
        f = kv_packing_factor(config.d_kv, ecfg.page_size)
        local_lanes = (config.num_heads // tshards) * (ecfg.page_size // f)
        if jax.default_backend() == "tpu" and local_lanes % 128 != 0:
            import warnings
            warnings.warn(
                f"sharded paged kernel: local packed lanes {local_lanes} "
                "not 128-aligned — Mosaic will reject this tensor-sharding "
                "degree on real TPUs (reduce tensor ways or raise "
                "page_size)", stacklevel=2)
        self.mesh = mesh
        self.data = data
        self.config = config.replace(tp_axis="tensor")
        self.ecfg = ecfg

        self._use_empty_gate = False   # see _make_window_step: lax.cond
        #                                 around the Pallas call breaks under
        #                                 shard_map SPMD on shards > 0
        self.params = jax.device_put(params, param_shardings(mesh, params))
        self._pspecs = param_pspecs(params)

        state = ShardedPagedState(config, params, ecfg, data)
        kv_specs = {"pages_kv": KVTensor(_PAGES_VALS_SPEC,
                                         _PAGES_SCALES_SPEC
                                         if ecfg.kv_dtype == "int8"
                                         else None),
                    "cross_k": KVTensor(_CROSS_SPEC,
                                        _CROSS_SPEC
                                        if ecfg.kv_dtype == "int8" else None),
                    "cross_v": KVTensor(_CROSS_SPEC,
                                        _CROSS_SPEC
                                        if ecfg.kv_dtype == "int8" else None)}

        def put_layer(layer):
            return {k: KVTensor(
                jax.device_put(layer[k].values,
                               NamedSharding(mesh, kv_specs[k].values)),
                (None if layer[k].scales is None else jax.device_put(
                    layer[k].scales,
                    NamedSharding(mesh, kv_specs[k].scales))))
                for k in layer}

        state.layers = tuple(put_layer(l) for l in state.layers)
        slot_sh = NamedSharding(mesh, _SLOT_SPEC)
        for f in ("enc_len", "pos", "cur_token", "active", "budget"):
            setattr(state, f, jax.device_put(getattr(state, f), slot_sh))
        self.state = state

        self._layer_specs = tuple(
            {k: KVTensor(kv_specs[k].values,
                         (None if layer[k].scales is None
                          else kv_specs[k].scales))
             for k in layer}
            for layer in state.layers)
        self._encode_fns: Dict[int, Callable] = {}
        self._multi_step_fn = jax.jit(self._shard_window_multi(),
                                      donate_argnums=(1, 4, 5, 6, 7, 8))
        self._insert_fn = jax.jit(self._shard_insert(),
                                  donate_argnums=(0, 1, 2, 3, 4, 5))

    # -- prefill (rows over "data", gathered) ---------------------------

    def _prefill_batch(self, n: int) -> int:
        return max(super()._prefill_batch(n), self.data)

    def _encode_fn(self, bucket: int, nb: int = 1) -> Callable:
        key = (bucket, nb)
        if key not in self._encode_fns:
            config = self.config

            def run(params, ids):
                enc = t5.encode(config, params, ids)
                outs = []
                for blk in params["decoder"]["block"]:
                    ca = blk["cross_attention_layer"]["cross_attention"]
                    h = ca["Wk"].shape[1] // config.d_kv
                    ck = kv_cache._proj_heads(enc, ca["Wk"], h, config.d_kv)
                    cv = kv_cache._proj_heads(enc, ca["Wv"], h, config.d_kv)
                    outs.append((
                        jax.lax.all_gather(ck, "data", axis=0, tiled=True),
                        jax.lax.all_gather(cv, "data", axis=0, tiled=True),
                    ))
                return outs

            n_layers = len(self.params["decoder"]["block"])
            cross_spec = P(None, "tensor", None, None)
            sharded = shard_map(
                run, mesh=self.mesh,
                in_specs=(self._pspecs, P("data")),
                out_specs=[(cross_spec, cross_spec)] * n_layers,
                check_vma=False)
            self._encode_fns[key] = jax.jit(sharded)
        return self._encode_fns[key]

    # -- insert (masked SPMD write) -------------------------------------

    def _shard_insert(self):
        ecfg = self.ecfg
        quant = ecfg.kv_dtype == "int8"

        def insert(layers, enc_len, pos, cur_token, active, budget,
                   cross_kvs, row_idx, slot, bucket_len, max_new):
            bl = enc_len.shape[0]
            gids = (jax.lax.axis_index("data") * bl
                    + jnp.arange(bl, dtype=jnp.int32))
            own = gids == slot
            own4 = own[:, None, None, None]

            def put(kv: KVTensor, new: KVTensor) -> KVTensor:
                vals = jnp.where(own4, new.values.astype(kv.values.dtype),
                                 kv.values)
                scales = kv.scales
                if scales is not None:
                    scales = jnp.where(own4, new.scales, scales)
                return KVTensor(vals, scales)

            new_layers = []
            for layer, (ckb, cvb) in zip(layers, cross_kvs):
                ck = jax.lax.dynamic_slice_in_dim(ckb, row_idx, 1, 0)
                cv = jax.lax.dynamic_slice_in_dim(cvb, row_idx, 1, 0)
                pad = ecfg.max_encode_len - ck.shape[2]
                ckp = jnp.pad(ck, ((0, 0), (0, 0), (0, pad), (0, 0)))
                cvp = jnp.pad(cv, ((0, 0), (0, 0), (0, pad), (0, 0)))
                new_layers.append({
                    **layer,
                    "cross_k": put(layer["cross_k"], _kv_make(ckp, quant)),
                    "cross_v": put(layer["cross_v"], _kv_make(cvp, quant)),
                })
            enc_len = jnp.where(own, bucket_len, enc_len)
            pos = jnp.where(own, 0, pos)
            cur_token = jnp.where(own, 0, cur_token)
            active = jnp.where(own, True, active)
            budget = jnp.where(own, max_new, budget)
            return tuple(new_layers), enc_len, pos, cur_token, active, budget

        n_layers = len(self.params["decoder"]["block"])
        cross_spec = P(None, "tensor", None, None)
        state_specs = (self._layer_specs,) + (_SLOT_SPEC,) * 5
        return shard_map(
            insert, mesh=self.mesh,
            in_specs=state_specs + (
                [(cross_spec, cross_spec)] * n_layers, P(), P(), P(), P()),
            out_specs=state_specs,
            check_vma=False)

    # -- decode window ---------------------------------------------------

    def _shard_window_multi(self):
        base = self._make_window_multi_step()

        def multi(params, layers, page_table, released, enc_len, pos,
                  cur_token, active, budget):
            carry, (nxt, fins, actives) = base(
                params, layers, page_table, released, enc_len, pos,
                cur_token, active, budget)
            nxt = jax.lax.all_gather(nxt, "data", axis=1, tiled=True)
            fins = jax.lax.all_gather(fins, "data", axis=1, tiled=True)
            actives = jax.lax.all_gather(actives, "data", axis=1, tiled=True)
            return carry, (nxt, fins, actives)

        state_specs = (self._layer_specs,) + (_SLOT_SPEC,) * 5
        # args: params, layers, page_table(rows), released, enc_len, pos,
        #       cur_token, active, budget
        return shard_map(
            multi, mesh=self.mesh,
            in_specs=(self._pspecs, self._layer_specs,
                      _SLOT_SPEC, _SLOT_SPEC) + (_SLOT_SPEC,) * 5,
            out_specs=(state_specs, (P(), P(), P())),
            check_vma=False)
