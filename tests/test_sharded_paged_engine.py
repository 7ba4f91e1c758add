"""Mesh-sharded PAGED engine parity: token-identical streams to the
single-device paged engine on the 8-device CPU mesh — the full north-star
serving combination (paged KV + int8 + tensor sharding + slots across the
data axis)."""

import jax
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.engine import Request
from flasht5_tpu.inference.paged_engine import (PagedEngineConfig,
                                                PagedInferenceEngine)
from flasht5_tpu.inference.sharded_engine import make_serving_mesh
from flasht5_tpu.inference.sharded_paged_engine import ShardedPagedEngine
from flasht5_tpu.models import t5


def _tiny_config(**kw):
    base = dict(
        vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
        num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        use_glu_mlp=True, use_gelu_act=True, attention_scale=1.0,
        position_encoding_type="t5", attention_type="ref",
        use_fused_crossentropy=False, pad_token_id=0, dtype="float32")
    base.update(kw)
    return FlashT5Config(**base)


def _requests(n, seed=0, max_new=12):
    rng = np.random.RandomState(seed)
    reqs = []
    for uid in range(n):
        L = int(rng.randint(5, 40))
        ids = rng.randint(2, 250, size=(L,)).astype(np.int32)
        reqs.append(Request(uid=uid, input_ids=ids, max_new_tokens=max_new))
    return reqs


ECFG = dict(max_slots=4, page_size=8, max_pages_per_slot=3,
            max_encode_len=64, encode_buckets=(16, 32, 64),
            steps_per_sync=4)


def _run_pair(config, mesh_shape, kv="int8", n_req=6, seed=3,
              quant_weights=False, num_pages_local=None):
    params = t5.init_params(jax.random.PRNGKey(0), config)
    if quant_weights:
        from flasht5_tpu.quantize import quantize_params
        params = quantize_params(params)

    data, tensor = mesh_shape
    npages = num_pages_local if num_pages_local is not None else 12
    # reference: single device with the SAME pages-per-data-shard capacity
    ref_ecfg = PagedEngineConfig(num_pages=npages * data, kv_dtype=kv,
                                 **ECFG)
    ref_out = PagedInferenceEngine(config, params, ref_ecfg).run(
        _requests(n_req, seed))

    sh_ecfg = PagedEngineConfig(num_pages=npages, kv_dtype=kv, **ECFG)
    sh = ShardedPagedEngine(config, params, sh_ecfg,
                            make_serving_mesh(data, tensor))
    sh_out = sh.run(_requests(n_req, seed))

    for r_ref, r_sh in zip(ref_out, sh_out):
        assert r_ref.result is not None and r_sh.result is not None
        np.testing.assert_array_equal(r_ref.result, r_sh.result,
                                      err_msg=f"uid={r_ref.uid}")


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 1)])
def test_token_parity_int8_kv(mesh_shape):
    _run_pair(_tiny_config(), mesh_shape)


def test_token_parity_native_kv():
    _run_pair(_tiny_config(), (2, 4), kv="native")


def test_token_parity_int8_weights_and_kv():
    """The full north-star cell: INT8 weights (Megatron-sharded incl.
    scales) + INT8 paged KV + tensor sharding + data-sharded slots."""
    _run_pair(_tiny_config(), (2, 4), quant_weights=True)


def test_oversubscribed_pool_deferred_admission():
    """Per-shard pools defer admission independently when exhausted
    (capacity-aware continuous batching, sharded)."""
    # 2 local pages per shard: a 12-token budget (2 pages at size 8) fits
    # exactly one request per slot-shard at a time
    _run_pair(_tiny_config(), (2, 4), n_req=7, num_pages_local=6)