"""Paged KV pool + ragged paged decode attention tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.inference.paged_kv import (
    PagedKVPool,
    paged_decode_attention,
    paged_decode_attention_arrays,
    paged_decode_attention_chunked,
    paged_decode_attention_ragged,
    paged_decode_attention_ref,
)


def _fill_pool(quantized=False, seed=0, slots=4, P=16, maxp=4, h=4, d=32):
    pool = PagedKVPool(num_pages=32, num_heads=h, page_size=P, head_dim=d,
                       max_slots=slots, max_pages_per_slot=maxp,
                       quantized=quantized)
    rng = np.random.default_rng(seed)
    lengths = [37, 16, 5, 60][:slots]
    for slot, L in enumerate(lengths):
        pool.ensure_capacity(slot, L)
        for _ in range(L):
            k_new = jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32)
            v_new = jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32)
            pool.append(jnp.asarray([slot]), k_new, v_new)
    return pool, lengths


def test_allocator_and_lengths():
    pool, lengths = _fill_pool()
    np.testing.assert_array_equal(np.asarray(pool.lengths), lengths)
    # pages allocated = ceil(L/P) per slot
    assert [len(o) for o in pool._owned] == [3, 1, 1, 4]
    free_before = len(pool._free)
    pool.release(0)
    assert len(pool._free) == free_before + 3
    assert int(pool.lengths[0]) == 0


def test_pool_exhaustion():
    pool = PagedKVPool(num_pages=2, num_heads=2, page_size=4, head_dim=8,
                       max_slots=2, max_pages_per_slot=4)
    pool.ensure_capacity(0, 8)  # takes both pages
    with pytest.raises(RuntimeError):
        pool.ensure_capacity(1, 1)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
def test_paged_attention_matches_oracle(quantized, with_bias):
    pool, lengths = _fill_pool(quantized=quantized)
    h, d, P, maxp = 4, 32, 16, 4
    q = jax.random.normal(jax.random.PRNGKey(1), (4, h, d), jnp.float32)
    bias = (jax.random.normal(jax.random.PRNGKey(2), (4, h, maxp * P),
                              jnp.float32) * 0.3 if with_bias else None)
    out = paged_decode_attention(q, pool, sm_scale=0.2, bias=bias)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3,
                               rtol=1e-2)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
def test_ragged_worklist_matches_oracle(quantized, with_bias):
    """Work-list (grid over ACTIVE pages) form == oracle, on ragged
    mixed-length slots including an empty one."""
    pool, lengths = _fill_pool(quantized=quantized)
    h, d, P, maxp = 4, 32, 16, 4
    q = jax.random.normal(jax.random.PRNGKey(1), (4, h, d), jnp.float32)
    bias = (jax.random.normal(jax.random.PRNGKey(2), (4, h, maxp * P),
                              jnp.float32) * 0.3 if with_bias else None)
    out = paged_decode_attention_ragged(
        q, pool.pages_k, pool.pages_v, pool.scales_k, pool.scales_v,
        pool.page_table, pool.lengths, sm_scale=0.2, bias=bias)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3,
                               rtol=1e-2)


def test_ragged_worklist_empty_and_released_slots():
    """Slots with length 0 (never admitted or released) must not corrupt
    neighbours; their own output is defined as zero."""
    pool, lengths = _fill_pool()
    h, d = 4, 32
    pool.release(2)
    q = jax.random.normal(jax.random.PRNGKey(3), (4, h, d), jnp.float32)
    out = paged_decode_attention_ragged(
        q, pool.pages_k, pool.pages_v, None, None,
        pool.page_table, pool.lengths, sm_scale=0.2)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2)
    for slot in (0, 1, 3):
        np.testing.assert_allclose(np.asarray(out[slot]),
                                   np.asarray(ref[slot]),
                                   atol=3e-3, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(out[2]), 0.0)


def test_ragged_worklist_under_jit_and_fragmentation():
    """jit-compatibility + a fragmented page table (pages allocated out of
    order across slots) — the work list must follow page_table, not pool
    order; also parity with the dense-grid kernel."""
    h, d, P, maxp, slots = 4, 32, 16, 6, 3
    rng = np.random.default_rng(11)
    pool = PagedKVPool(num_pages=24, num_heads=h, page_size=P, head_dim=d,
                       max_slots=slots, max_pages_per_slot=maxp)
    # interleave allocations so page ids are shuffled across slots
    lengths = [70, 33, 90]
    for tok in range(max(lengths)):
        for slot, L in enumerate(lengths):
            if tok < L:
                pool.ensure_capacity(slot, tok + 1)
                pool.append(jnp.asarray([slot]),
                            jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32),
                            jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32))
    q = jax.random.normal(jax.random.PRNGKey(5), (slots, h, d), jnp.float32)

    ragged = jax.jit(lambda *a: paged_decode_attention_ragged(
        *a, sm_scale=0.2))(q, pool.pages_k, pool.pages_v, None, None,
                           pool.page_table, pool.lengths)
    dense_grid = paged_decode_attention_arrays(
        q, pool.pages_k, pool.pages_v, None, None,
        pool.page_table, pool.lengths, sm_scale=0.2)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2)
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(ref),
                               atol=3e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(dense_grid),
                               atol=3e-3, rtol=1e-2)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("chunk", [1, 2, 3])
def test_chunked_worklist_matches_oracle(quantized, with_bias, chunk):
    """Chunked work-list (manual double-buffered DMA) form == oracle for
    chunk sizes that divide, exceed, and straddle per-slot page counts."""
    pool, lengths = _fill_pool(quantized=quantized)
    h, d, P, maxp = 4, 32, 16, 4
    q = jax.random.normal(jax.random.PRNGKey(1), (4, h, d), jnp.float32)
    bias = (jax.random.normal(jax.random.PRNGKey(2), (4, h, maxp * P),
                              jnp.float32) * 0.3 if with_bias else None)
    out = paged_decode_attention_chunked(
        q, pool.pages_k, pool.pages_v, pool.scales_k, pool.scales_v,
        pool.page_table, pool.lengths, sm_scale=0.2, bias=bias, chunk=chunk)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3,
                               rtol=1e-2)


def test_chunked_packing_factor_one():
    """Head dims that don't divide 128 (or >=128) take the f=1 unpacked
    path; kernel must degenerate correctly."""
    from flasht5_tpu.inference.paged_kv import kv_packing_factor

    assert kv_packing_factor(64, 16) == 2
    assert kv_packing_factor(32, 16) == 4
    assert kv_packing_factor(16, 16) == 8
    assert kv_packing_factor(128, 16) == 1
    assert kv_packing_factor(48, 16) == 1
    assert kv_packing_factor(64, 2) == 2

    h, d, P, maxp, slots = 2, 48, 8, 4, 3
    pool = PagedKVPool(num_pages=12, num_heads=h, page_size=P, head_dim=d,
                       max_slots=slots, max_pages_per_slot=maxp)
    rng = np.random.default_rng(21)
    for slot, L in enumerate([19, 7, 26]):
        pool.ensure_capacity(slot, L)
        for _ in range(L):
            pool.append(jnp.asarray([slot]),
                        jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32),
                        jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32))
    q = jax.random.normal(jax.random.PRNGKey(4), (slots, h, d), jnp.float32)
    out = paged_decode_attention_chunked(
        q, pool.pages_k, pool.pages_v, None, None,
        pool.page_table, pool.lengths, sm_scale=0.2, chunk=2)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3,
                               rtol=1e-2)


def test_chunked_worklist_fragmented_jit_and_empty():
    """Chunked form under jit on a fragmented pool with a released slot."""
    h, d, P, maxp, slots = 4, 32, 16, 6, 3
    rng = np.random.default_rng(13)
    pool = PagedKVPool(num_pages=24, num_heads=h, page_size=P, head_dim=d,
                       max_slots=slots, max_pages_per_slot=maxp)
    lengths = [70, 33, 90]
    for tok in range(max(lengths)):
        for slot, L in enumerate(lengths):
            if tok < L:
                pool.ensure_capacity(slot, tok + 1)
                pool.append(jnp.asarray([slot]),
                            jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32),
                            jnp.asarray(rng.normal(size=(1, h, d)), jnp.float32))
    pool.release(1)
    q = jax.random.normal(jax.random.PRNGKey(7), (slots, h, d), jnp.float32)
    out = jax.jit(lambda *a: paged_decode_attention_chunked(
        *a, sm_scale=0.2, chunk=2))(q, pool.pages_k, pool.pages_v, None,
                                    None, pool.page_table, pool.lengths)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2)
    for slot in (0, 2):
        np.testing.assert_allclose(np.asarray(out[slot]),
                                   np.asarray(ref[slot]),
                                   atol=3e-3, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)


def test_paged_matches_dense_decode():
    """Paged attention over pool contents == dense decode_attention over the
    same tokens (cross-implementation consistency)."""
    from flasht5_tpu.ops.decode_attention import decode_attention_ref

    pool, lengths = _fill_pool()
    h, d, P, maxp = 4, 32, 16, 4
    q = jax.random.normal(jax.random.PRNGKey(1), (4, h, d), jnp.float32)
    out = paged_decode_attention(q, pool, sm_scale=0.2)

    # rebuild the dense cache
    k = pool.pages_k[pool.page_table]        # (B, maxp, H, P, D)
    k = jnp.transpose(k, (0, 2, 1, 3, 4)).reshape(4, h, maxp * P, d)
    v = pool.pages_v[pool.page_table]
    v = jnp.transpose(v, (0, 2, 1, 3, 4)).reshape(4, h, maxp * P, d)
    dense = decode_attention_ref(q, k, v, lengths=pool.lengths, sm_scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=3e-3,
                               rtol=1e-2)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("with_bias", [False, True])
def test_dense_small_pool_reader_matches_oracle(quantized, with_bias):
    """dense_small_pool_attention (the launch-free small-pool reader the
    engine swaps in below dense_read_max) == oracle over the SAME fused
    packed pool the chunked kernel reads, including the (m, l) softmax
    state used for LSE-merging with the window side buffer."""
    from flasht5_tpu.inference.paged_kv import (dense_small_pool_attention,
                                                pack_kv_pages_fused)

    pool, lengths = _fill_pool(quantized=quantized)
    h, d, P, maxp = 4, 32, 16, 4
    q = jax.random.normal(jax.random.PRNGKey(1), (4, h, d), jnp.float32)
    bias = (jax.random.normal(jax.random.PRNGKey(2), (4, h, maxp * P),
                              jnp.float32) * 0.3 if with_bias else None)
    pages_kv, scales_kv = pack_kv_pages_fused(
        pool.pages_k, pool.pages_v, pool.scales_k, pool.scales_v)
    out, m, l = jax.jit(lambda *a: dense_small_pool_attention(
        *a, sm_scale=0.2, bias=bias, return_state=True))(
        q, pages_kv, scales_kv, pool.page_table, pool.lengths)
    ref = paged_decode_attention_ref(q, pool, sm_scale=0.2, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3,
                               rtol=1e-2)
    # the state must reconstruct the normalizer: sum over valid tokens of
    # exp(score - m) == l, and out is already normalized
    assert np.all(np.asarray(l)[np.asarray(pool.lengths) > 0] > 0)
