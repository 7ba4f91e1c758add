"""Paged continuous-batching engine: token-exact parity with the slot-dense
engine on identical request queues, bf16 and INT8."""

import jax
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.engine import EngineConfig, InferenceEngine, Request
from flasht5_tpu.inference.paged_engine import PagedEngineConfig, PagedInferenceEngine
from flasht5_tpu.models import t5


def tiny_config():
    return FlashT5Config(vocab_size=256, d_model=64, d_kv=16, num_heads=4,
                         d_ff=128, num_layers=2, dropout_rate=0.0,
                         attention_scale=1.0, dtype="float32", pad_token_id=0)


def mk_requests(n=6, max_new=6):
    return [Request(uid=i,
                    input_ids=np.random.default_rng(i).integers(
                        2, 256, size=(6 + i,)).astype(np.int32),
                    max_new_tokens=max_new)
            for i in range(n)]


@pytest.mark.parametrize("dense_read", [0, 512])
@pytest.mark.parametrize("kernel", ["chunked", "ragged", "dense"])
@pytest.mark.parametrize("kv", ["native", "int8"])
def test_paged_matches_dense_engine(kv, kernel, dense_read):
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)

    dense = InferenceEngine(config, params, EngineConfig(
        max_slots=3, max_decode_len=8, max_encode_len=16,
        encode_buckets=(16,), kv_dtype=kv)).run(mk_requests())
    paged = PagedInferenceEngine(config, params, PagedEngineConfig(
        max_slots=3, page_size=4, num_pages=16, max_pages_per_slot=2,
        max_encode_len=16, encode_buckets=(16,), kv_dtype=kv,
        kernel=kernel, pages_per_item=2,
        dense_read_max=dense_read)).run(mk_requests())
    for a, b in zip(dense, paged):
        np.testing.assert_array_equal(
            a.result, b.result,
            err_msg=f"kv={kv} kernel={kernel} dense_read={dense_read}")


def test_paged_pool_reuse_across_requests():
    """More requests than pool slots; pages recycle between admissions."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    engine = PagedInferenceEngine(config, params, PagedEngineConfig(
        max_slots=2, page_size=4, num_pages=6, max_pages_per_slot=2,
        max_encode_len=16, encode_buckets=(16,)))
    done = engine.run(mk_requests(n=8, max_new=5))
    assert all(r.result is not None for r in done)
    assert all(r.result[-1] == config.eos_token_id for r in done)


def test_oversubscribed_pool_defers_admission():
    """num_pages < slots * max_pages_per_slot: heavy-budget requests must
    wait in queue (admission control) instead of crashing the allocator,
    and the served token streams must still match the slot-dense engine
    run at a per-slot provision large enough to never defer."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    # mixed budgets: uids 0..2 need 2 pages (max_new 7), 3..5 need 1 page
    reqs = lambda: [Request(uid=i,
                            input_ids=np.random.default_rng(i).integers(
                                2, 256, size=(6 + i,)).astype(np.int32),
                            max_new_tokens=7 if i < 3 else 3)
                    for i in range(6)]
    # 4 slots x 2 pages worst case = 8 pages, pool holds only 5
    paged = PagedInferenceEngine(config, params, PagedEngineConfig(
        max_slots=4, page_size=4, num_pages=5, max_pages_per_slot=2,
        max_encode_len=16, encode_buckets=(16,), pages_per_item=2,
        steps_per_sync=3)).run(reqs())
    dense = InferenceEngine(config, params, EngineConfig(
        max_slots=4, max_decode_len=9, max_encode_len=16,
        encode_buckets=(16,), steps_per_sync=3)).run(reqs())
    # scheduling order differs under deferral; compare per-uid streams
    by_uid = {r.uid: r.result for r in dense}
    for r in paged:
        np.testing.assert_array_equal(r.result, by_uid[r.uid],
                                      err_msg=f"uid={r.uid}")


def test_oversubscribed_pool_impossible_request_raises():
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    engine = PagedInferenceEngine(config, params, PagedEngineConfig(
        max_slots=2, page_size=4, num_pages=1, max_pages_per_slot=2,
        max_encode_len=16, encode_buckets=(16,)))
    with pytest.raises(RuntimeError, match="pool"):
        engine.run(mk_requests(n=1, max_new=7))


@pytest.mark.parametrize("dense_read,stage", [(0, 0), (512, 0), (0, 1 << 25)])
@pytest.mark.parametrize("sync", [2, 3, 5])
@pytest.mark.parametrize("kv", ["native", "int8"])
def test_window_appends_multi_window_parity(kv, sync, dense_read, stage):
    """Window-buffered appends (r4): budgets spanning several sync windows,
    so flushes hit packed rows mid-row (base % f != 0), cross page
    boundaries, and interleave with finished slots — token streams must
    stay identical to the slot-dense engine AND to the per-step append
    path."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)

    def paged(window):
        return PagedInferenceEngine(config, params, PagedEngineConfig(
            max_slots=3, page_size=8, num_pages=12, max_pages_per_slot=3,
            max_encode_len=16, encode_buckets=(16,), kv_dtype=kv,
            kernel="chunked", pages_per_item=2, steps_per_sync=sync,
            dense_read_max=dense_read, window_stage_max_bytes=stage,
            window_appends=window)).run(mk_requests(n=7, max_new=17))

    dense = InferenceEngine(config, params, EngineConfig(
        max_slots=3, max_decode_len=24, max_encode_len=16,
        encode_buckets=(16,), kv_dtype=kv,
        steps_per_sync=sync)).run(mk_requests(n=7, max_new=17))
    windowed = paged(True)
    stepwise = paged(False)
    for a, b, c in zip(dense, windowed, stepwise):
        np.testing.assert_array_equal(a.result, b.result,
                                      err_msg=f"windowed kv={kv} sync={sync}")
        np.testing.assert_array_equal(a.result, c.result,
                                      err_msg=f"stepwise kv={kv} sync={sync}")


@pytest.mark.parametrize("kv", ["native", "int8"])
def test_chunk_wider_than_page_table_parity(kv):
    """Regression (r5): pages_per_item WIDER than max_pages_per_slot. The
    kernel wrapper clamps its chunk to the table width, but the engine's
    hoisted work-list used the unclamped value — every slot except the
    first read the wrong pages (misaligned pids stride). This is the
    production default shape (pages_per_item=8) whenever budgets are small
    (e.g. the dense serving A/B: max_new 256 / page 64 -> 5-page tables).
    build_chunked_worklist now mirrors the clamp."""
    config = tiny_config()
    params = t5.init_params(jax.random.PRNGKey(0), config)
    got = PagedInferenceEngine(config, params, PagedEngineConfig(
        max_slots=3, page_size=8, num_pages=12, max_pages_per_slot=3,
        max_encode_len=16, encode_buckets=(16,), kv_dtype=kv,
        kernel="chunked", pages_per_item=8, steps_per_sync=3)).run(
            mk_requests(n=7, max_new=17))
    want = InferenceEngine(config, params, EngineConfig(
        max_slots=3, max_decode_len=24, max_encode_len=16,
        encode_buckets=(16,), kv_dtype=kv, steps_per_sync=3)).run(
            mk_requests(n=7, max_new=17))
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a.result, b.result,
                                      err_msg=f"uid={a.uid} kv={kv}")
