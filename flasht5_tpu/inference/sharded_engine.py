"""Mesh-sharded continuous-batching engine: the serving north star.

BASELINE.json's north-star sentence: KV caches "tensor-sharded with the
weights across a multi-host TPU pod slice, with continuous batching of
encode+decode requests across hosts and ICI collectives overlapped with
dequant-matmul compute". This module runs the slot engine's prefill, insert,
and decode step functions under `shard_map` on a ("data", "tensor") mesh:

- weights: Megatron layout (parallel/sharding.py) — heads/d_ff column-
  parallel, o/wo row-parallel, lm_head vocab-parallel, bias table
  head-parallel
- KV pools: slots sharded over "data" (each host owns max_slots/data slots
  — continuous batching across hosts), heads sharded over "tensor" (the KV
  cache is tensor-sharded WITH the weights; inference/kv_cache.py:64 is the
  per-layer form, this is the engine-level pool)
- decode: zero collectives over "data" (each data shard decodes its own
  slots in lockstep); over "tensor" only the two o-projection reductions per
  block (blocking psum, or the ring matmul_reducescatter when
  use_collective_matmul is set — with int8 weights the overlapped compute is
  the dequant-matmul, parallel/collective_matmul.py) plus the vocab-parallel
  argmax gather (2*t scalars per slot, parallel/vocab_parallel.py)
- prefill: the admission batch's rows are sharded over "data" (encode runs
  across hosts), then row-all-gathered so any shard can insert any request
  into a slot it owns
- insert: a masked write keyed on global slot id — every shard executes the
  same program, only the owner's lanes change (SPMD, no host-side branching)

Token streams leave the device replicated (an all_gather over "data" of the
(k, B_local) window outputs), so the host scheduler (InferenceEngine.run) is
unchanged: it sees exactly the single-device engine's interface.

Parity: tests/test_sharded_engine.py pins token streams against the
single-device engine on the 8-device CPU mesh, for native and int8 KV.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference import kv_cache
from flasht5_tpu.inference.engine import (BatchState, EngineConfig,
                                          InferenceEngine, KVTensor, _kv_make)
from flasht5_tpu.models import t5
from flasht5_tpu.parallel.sharding import param_pspecs, param_shardings

_KV_SPEC = P("data", "tensor", None, None)
_SLOT_SPEC = P("data")
_CROSS_SPEC = P(None, "tensor", None, None)


def make_serving_mesh(data: int = 1, tensor: int = 1) -> Mesh:
    """("data", "tensor") mesh for serving: tensor innermost so its
    collectives ride the fastest ICI links (same layout rationale as
    parallel/mesh.py)."""
    import numpy as np
    devs = np.asarray(jax.devices()[: data * tensor]).reshape(data, tensor)
    return Mesh(devs, ("data", "tensor"))


class ShardedEngine(InferenceEngine):
    """InferenceEngine whose device functions run under shard_map.

    Drop-in: same EngineConfig, same host scheduler, same Request API.
    `mesh` must have axes ("data", "tensor"); max_slots must divide evenly
    over "data". With mesh (1, 1) the program is the single-device engine
    plus two size-1 collectives (measured no-regression gate in
    tools/bench_serving.py --mesh 1,1).
    """

    def __init__(self, config: FlashT5Config, params, ecfg: EngineConfig,
                 mesh: Mesh):
        assert set(mesh.axis_names) >= {"data", "tensor"}, mesh.axis_names
        data = mesh.shape["data"]
        assert ecfg.max_slots % data == 0, (ecfg.max_slots, data)
        assert data & (data - 1) == 0, f"data={data} must be a power of two"
        self.mesh = mesh
        self.data = data
        self.config = config.replace(tp_axis="tensor")
        self.ecfg = ecfg

        # Shard the weights (Megatron layout) and the slot pool.
        self.params = jax.device_put(params, param_shardings(mesh, params))
        self._pspecs = param_pspecs(params)
        state = BatchState(config, params, ecfg)
        kv_sh = NamedSharding(mesh, _KV_SPEC)
        slot_sh = NamedSharding(mesh, _SLOT_SPEC)
        state.layers = jax.tree.map(
            lambda x: jax.device_put(x, kv_sh), state.layers)
        for f in ("enc_len", "pos", "cur_token", "active", "budget"):
            setattr(state, f, jax.device_put(getattr(state, f), slot_sh))
        self.state = state

        self._encode_fns: Dict[int, Callable] = {}
        lc = state.layers[0]
        self._layers_spec = tuple(
            type(lc)(*(jax.tree.map(lambda _: _KV_SPEC, c)
                       for c in cache))
            for cache in state.layers)
        self._state_specs = (self._layers_spec,) + (_SLOT_SPEC,) * 5

        # same state donation as the parent engine: sharded KV pools are
        # per-device slices of the same multi-GiB buffers
        self._multi_step_fn = jax.jit(self._shard_multi_step(),
                                      donate_argnums=(1, 2, 3, 4, 5, 6, 7))
        self._insert_fn = jax.jit(self._shard_insert(),
                                  donate_argnums=(0, 1, 2, 3, 4, 5))
        self._sample_rng = jax.random.PRNGKey(ecfg.sample_seed)

    # -- prefill -------------------------------------------------------

    def _prefill_batch(self, n: int) -> int:
        # rows are sharded over "data": the batch must divide evenly
        return max(super()._prefill_batch(n), self.data)

    def _encode_fn(self, bucket: int, nb: int = 1) -> Callable:
        """Prefill sharded over "data" rows + "tensor" heads, then a row
        all_gather so every data shard holds all nb cross-KV rows (any shard
        may own the slot this request lands in)."""
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
            sharded = shard_map(
                run, mesh=self.mesh,
                in_specs=(self._pspecs, P("data")),
                out_specs=[(_CROSS_SPEC, _CROSS_SPEC)] * n_layers,
                check_vma=False)
            self._encode_fns[key] = jax.jit(sharded)
        return self._encode_fns[key]

    # -- insert ---------------------------------------------------------

    def _shard_insert(self):
        """Masked SPMD insert: all shards run the same program; the data
        shard owning global slot id `slot` takes the new values, everyone
        else keeps theirs. Replaces the single-device dynamic_update_slice
        (whose index would be out of range on non-owner shards)."""
        ecfg = self.ecfg
        quant = ecfg.kv_dtype == "int8"

        def insert(layers, enc_len, pos, cur_token, active, budget,
                   cross_kvs, row_idx, slot, true_len, max_new):
            bl = enc_len.shape[0]
            gids = (jax.lax.axis_index("data") * bl
                    + jnp.arange(bl, dtype=jnp.int32))
            own = gids == slot                              # (bl,)
            own4 = own[:, None, None, None]

            def put(kv: KVTensor, new: KVTensor) -> KVTensor:
                vals = jnp.where(own4, new.values.astype(kv.values.dtype),
                                 kv.values)
                scales = kv.scales
                if scales is not None:
                    scales = jnp.where(own4, new.scales, scales)
                return KVTensor(vals, scales)

            def zero_slot(kv: KVTensor) -> KVTensor:
                vals = jnp.where(own4, jnp.zeros_like(kv.values), kv.values)
                scales = kv.scales
                if scales is not None:
                    scales = jnp.where(own4, jnp.zeros_like(scales), scales)
                return KVTensor(vals, scales)

            new_layers = []
            for cache, (ckb, cvb) in zip(layers, cross_kvs):
                ck = jax.lax.dynamic_slice_in_dim(ckb, row_idx, 1, 0)
                cv = jax.lax.dynamic_slice_in_dim(cvb, row_idx, 1, 0)
                pad = ecfg.max_encode_len - ck.shape[2]
                ckp = jnp.pad(ck, ((0, 0), (0, 0), (0, pad), (0, 0)))
                cvp = jnp.pad(cv, ((0, 0), (0, 0), (0, pad), (0, 0)))
                new_layers.append(kv_cache.LayerCache(
                    self_k=zero_slot(cache.self_k),
                    self_v=zero_slot(cache.self_v),
                    cross_k=put(cache.cross_k, _kv_make(ckp, quant)),
                    cross_v=put(cache.cross_v, _kv_make(cvp, quant)),
                ))
            enc_len = jnp.where(own, true_len, enc_len)
            pos = jnp.where(own, 0, pos)
            cur_token = jnp.where(own, 0, cur_token)
            active = jnp.where(own, True, active)
            budget = jnp.where(own, max_new, budget)
            return tuple(new_layers), enc_len, pos, cur_token, active, budget

        n_layers = len(self.params["decoder"]["block"])
        return shard_map(
            insert, mesh=self.mesh,
            in_specs=self._state_specs + (
                [(_CROSS_SPEC, _CROSS_SPEC)] * n_layers, P(), P(), P(), P()),
            out_specs=self._state_specs,
            check_vma=False)

    # -- decode ----------------------------------------------------------

    def _shard_multi_step(self):
        base = self._make_multi_step()

        def multi(params, layers, enc_len, pos, cur_token, active, budget,
                  rng):
            carry, rng_out, toks, fins, actives = base(
                params, layers, enc_len, pos, cur_token, active, budget, rng)
            # window outputs to the host: gather each (k, B_local) stream to
            # the full (k, B) so the scheduler sees global slot indexing
            toks = jax.lax.all_gather(toks, "data", axis=1, tiled=True)
            fins = jax.lax.all_gather(fins, "data", axis=1, tiled=True)
            actives = jax.lax.all_gather(actives, "data", axis=1, tiled=True)
            return carry, rng_out, toks, fins, actives

        return shard_map(
            multi, mesh=self.mesh,
            in_specs=(self._pspecs,) + self._state_specs + (P(),),
            out_specs=(self._state_specs, P(), P(), P(), P()),
            check_vma=False)

    def probe_step(self, token_override=None):
        """Sharded probe: one step returning the FULL (B, V) logits
        (vocab gathered over "tensor", slots over "data")."""
        import numpy as np
        if not hasattr(self, "_probe_fn"):
            step = self._make_step(with_logits=True)

            def probe(params, layers, enc_len, pos, cur_token, active,
                      budget, rng):
                out = step(params, layers, enc_len, pos, cur_token, active,
                           budget, rng)
                *state_out, nxt, finished, logits = out
                logits = jax.lax.all_gather(logits, "tensor", axis=-1,
                                            tiled=True)
                logits = jax.lax.all_gather(logits, "data", axis=0,
                                            tiled=True)
                nxt = jax.lax.all_gather(nxt, "data", axis=0, tiled=True)
                finished = jax.lax.all_gather(finished, "data", axis=0,
                                              tiled=True)
                return tuple(state_out), nxt, finished, logits

            self._probe_fn = jax.jit(shard_map(
                probe, mesh=self.mesh,
                in_specs=(self._pspecs,) + self._state_specs + (P(),),
                out_specs=(self._state_specs, P(), P(), P()),
                check_vma=False))
        st = self.state
        cur = st.cur_token if token_override is None else jax.device_put(
            jnp.asarray(token_override, jnp.int32),
            NamedSharding(self.mesh, _SLOT_SPEC))
        self._sample_rng, sub = jax.random.split(self._sample_rng)
        state_out, nxt, finished, logits = self._probe_fn(
            self.params, st.layers, st.enc_len, st.pos, cur, st.active,
            st.budget, sub)
        (st.layers, st.enc_len, st.pos, st.cur_token, st.active,
         st.budget) = state_out
        return np.asarray(nxt), np.asarray(logits)
