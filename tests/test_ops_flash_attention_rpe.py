"""RPE-fused flash attention vs (materialized-bias) oracle.

The oracle is attn_ref with positional.t5_relative_bias — the exact math the
in-kernel bucket/bias computation must reproduce, including the bucket-weight
gradient (the capability the reference gets only from its out-of-tree CUDA
patch, README.md:60)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu import positional
from flasht5_tpu.ops.attn_ref import attn_ref
from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe


def _setup(b, h, m, n, d, nb=32, maxd=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (b, h, m, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, n, d), jnp.float32)
    w = jax.random.normal(ks[3], (nb, h), jnp.float32) * 0.5
    return q, k, v, w


def _ref_out(q, k, v, w, *, causal, bidirectional, nb, maxd, scale):
    bias = positional.t5_relative_bias(
        {"relative_attention_bias": w}, q.shape[2], k.shape[2],
        bidirectional=bidirectional, num_buckets=nb, max_distance=maxd)
    return attn_ref(q, k, v, bias, sm_scale=scale, causal=causal)


@pytest.mark.parametrize("m,n", [(128, 128), (160, 224), (133, 70)])
@pytest.mark.parametrize("causal,bidirectional", [(False, True), (True, False)])
def test_rpe_forward(m, n, causal, bidirectional):
    nb, maxd, scale = 32, 128, 0.25
    q, k, v, w = _setup(2, 3, m, n, 64, nb, maxd)
    out = flash_attention_rpe(q, k, v, w, causal=causal, sm_scale=scale,
                              bidirectional=bidirectional, num_buckets=nb,
                              max_distance=maxd)
    ref = _ref_out(q, k, v, w, causal=causal, bidirectional=bidirectional,
                   nb=nb, maxd=maxd, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


@pytest.mark.parametrize("m,n", [(128, 128), (96, 160)])
@pytest.mark.parametrize("causal,bidirectional", [(False, True), (True, False)])
def test_rpe_backward(m, n, causal, bidirectional):
    nb, maxd, scale = 32, 128, 0.25
    b, h, d = 2, 2, 64
    q, k, v, w = _setup(b, h, m, n, d, nb, maxd)
    dout = jax.random.normal(jax.random.PRNGKey(9), (b, h, m, d), jnp.float32)

    def f_kernel(q, k, v, w):
        o = flash_attention_rpe(q, k, v, w, causal=causal, sm_scale=scale,
                                bidirectional=bidirectional, num_buckets=nb,
                                max_distance=maxd)
        return jnp.sum(o * dout)

    def f_ref(q, k, v, w):
        o = _ref_out(q, k, v, w, causal=causal, bidirectional=bidirectional,
                     nb=nb, maxd=maxd, scale=scale)
        return jnp.sum(o * dout)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, w)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, w)
    for a, r, name in zip(gk, gr, ["dq", "dk", "dv", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-3,
                                   rtol=1e-2, err_msg=name)


def test_rpe_none_weights_falls_back():
    q, k, v, _ = _setup(1, 2, 64, 64, 32)
    out = flash_attention_rpe(q, k, v, None, causal=False, sm_scale=1.0)
    ref = attn_ref(q, k, v, sm_scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_rpe_model_integration():
    from flasht5_tpu.config import FlashT5Config
    from flasht5_tpu.models import t5

    config = FlashT5Config(vocab_size=128, d_model=64, d_kv=16, num_heads=4,
                           d_ff=128, num_layers=1, dropout_rate=0.0,
                           attention_type="pallas_rpe", attention_scale=1.0,
                           dtype="float32")
    config_ref = config.replace(attention_type="ref")
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 128)
    lbl = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 128)
    out = t5.forward(config, params, input_ids=ids, labels=lbl)
    ref = t5.forward(config_ref, params, input_ids=ids, labels=lbl)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]), atol=5e-3, rtol=1e-2)


def test_rpe_long_range_bucket_saturation():
    """Beyond max_distance all positions share the terminal bucket — the
    length-generalization property the linear-memory kernel must preserve
    (north-star 8k-encode config exercises this at scale)."""
    nb, maxd, scale = 32, 128, 0.125
    q, k, v, w = _setup(1, 2, 512, 512, 32, nb, maxd, seed=3)
    out = flash_attention_rpe(q, k, v, w, causal=False, sm_scale=scale,
                              bidirectional=True, num_buckets=nb,
                              max_distance=maxd)
    ref = _ref_out(q, k, v, w, causal=False, bidirectional=True,
                   nb=nb, maxd=maxd, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=1e-2)


def test_rpe_table_and_chain_paths_agree(monkeypatch):
    """The precomputed-offset-table fast path and the fully in-kernel
    select-chain path (used beyond the table budget) must agree."""
    import flasht5_tpu.ops.flash_attention_rpe as rpe_mod

    nb, maxd, scale = 32, 128, 0.25
    q, k, v, w = _setup(1, 2, 256, 256, 32, nb, maxd, seed=5)

    out_table = flash_attention_rpe(q, k, v, w, causal=True, sm_scale=scale,
                                    bidirectional=False, num_buckets=nb,
                                    max_distance=maxd)
    monkeypatch.setattr(rpe_mod, "_TABLE_BUDGET_BYTES", 0)
    out_chain = flash_attention_rpe(q, k, v, w, causal=True, sm_scale=scale,
                                    bidirectional=False, num_buckets=nb,
                                    max_distance=maxd)
    np.testing.assert_allclose(np.asarray(out_table), np.asarray(out_chain),
                               atol=2e-3, rtol=1e-2)


def test_rpe_budget_boundary_flips_path(monkeypatch):
    """Dispatch at the exact table budget: a budget equal to the computed
    table size keeps the offset-table fast path; one byte less flips to the
    in-kernel chain (the long-context fallback, SURVEY.md §5) — and the two
    agree numerically at the boundary."""
    import flasht5_tpu.ops.flash_attention_rpe as rpe_mod

    nb, maxd, scale = 8, 20, 0.25
    q, k, v, w = _setup(1, 2, 256, 256, 32, nb, maxd, seed=11)

    seen = {}
    orig_tb = rpe_mod._table_bytes

    def spy_tb(*a):
        out = orig_tb(*a)
        seen["bytes"] = out
        return out

    builds = []
    orig_build = rpe_mod._build_offset_table

    def spy_build(*a, **kw):
        builds.append(1)
        return orig_build(*a, **kw)

    monkeypatch.setattr(rpe_mod, "_table_bytes", spy_tb)
    monkeypatch.setattr(rpe_mod, "_build_offset_table", spy_build)

    kwargs = dict(causal=False, sm_scale=scale, bidirectional=True,
                  num_buckets=nb, max_distance=maxd)
    out_ref = flash_attention_rpe(q, k, v, w, **kwargs)
    assert builds, "default budget should use the offset-table path"
    boundary = seen["bytes"]

    monkeypatch.setattr(rpe_mod, "_TABLE_BUDGET_BYTES", boundary)
    builds.clear()
    out_at = flash_attention_rpe(q, k, v, w, **kwargs)
    assert builds, "budget == table size must still take the table path"

    monkeypatch.setattr(rpe_mod, "_TABLE_BUDGET_BYTES", boundary - 1)
    builds.clear()
    out_over = flash_attention_rpe(q, k, v, w, **kwargs)
    assert not builds, "budget exceeded must take the in-kernel chain path"

    np.testing.assert_allclose(np.asarray(out_at), np.asarray(out_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_over), np.asarray(out_ref),
                               atol=2e-3, rtol=1e-2)


def test_rpe_model_integration_multilayer():
    """Regression: with num_layers > 1, the bucket table must reach blocks
    1..N-1 (round-1 bug: flash_attention_rpe got None there and silently ran
    bias-free attention in every layer but the first)."""
    from flasht5_tpu.config import FlashT5Config
    from flasht5_tpu.models import t5

    config = FlashT5Config(vocab_size=128, d_model=64, d_kv=16, num_heads=4,
                           d_ff=128, num_layers=3, dropout_rate=0.0,
                           attention_type="pallas_rpe", attention_scale=1.0,
                           dtype="float32")
    config_ref = config.replace(attention_type="ref")
    params = t5.init_params(jax.random.PRNGKey(0), config)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 128)
    lbl = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 128)
    out = t5.forward(config, params, input_ids=ids, labels=lbl)
    ref = t5.forward(config_ref, params, input_ids=ids, labels=lbl)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]), atol=1e-2, rtol=1e-2)
    # the unrolled (scan_blocks=False) path must agree too
    out2 = t5.forward(config.replace(scan_blocks=False), params,
                      input_ids=ids, labels=lbl)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(out2["logits"]), atol=1e-5)


def test_rpe_bf16_table_fwd_bwd():
    """bf16 inputs store the offset table in bf16 (model dtype — reference
    kernels likewise read the bias at model precision); numerics must stay
    within bf16 tolerance of the fp32 oracle, fwd and bwd."""
    nb, maxd, scale = 32, 128, 0.125
    q, k, v, w = _setup(2, 4, 128, 128, 64, nb, maxd, seed=11)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    out = flash_attention_rpe(qb, kb, vb, w, causal=False, sm_scale=scale,
                              bidirectional=True, num_buckets=nb,
                              max_distance=maxd)
    ref = _ref_out(q, k, v, w, causal=False, bidirectional=True,
                   nb=nb, maxd=maxd, scale=scale)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    def loss(w_):
        return jnp.sum(flash_attention_rpe(
            qb, kb, vb, w_, causal=False, sm_scale=scale, bidirectional=True,
            num_buckets=nb, max_distance=maxd).astype(jnp.float32))

    def loss_ref(w_):
        return jnp.sum(_ref_out(q, k, v, w_, causal=False, bidirectional=True,
                                nb=nb, maxd=maxd, scale=scale))

    gw = jax.grad(loss)(w)
    gw_ref = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=0.5, rtol=5e-2)


@pytest.mark.parametrize("causal,m,n", [(False, 128, 128), (True, 128, 128),
                                        (False, 96, 160)])
def test_rpe_fused_bwd_matches_two_pass(monkeypatch, causal, m, n):
    """The default single-sweep backward (dq through an aliased HBM
    accumulator) must match the FLASHT5_RPE_FUSED_BWD=0 two-pass backward."""
    nb, maxd, scale = 32, 128, 0.125
    q, k, v, w = _setup(2, 3, m, n, 64, nb, maxd, seed=13)

    def grads(q, k, v, w):
        def loss(q_, k_, v_, w_):
            return jnp.sum(flash_attention_rpe(
                q_, k_, v_, w_, causal=causal, sm_scale=scale,
                bidirectional=not causal, num_buckets=nb,
                max_distance=maxd).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, w)

    monkeypatch.setenv("FLASHT5_RPE_FUSED_BWD", "0")
    ref = grads(q, k, v, w)
    monkeypatch.setenv("FLASHT5_RPE_FUSED_BWD", "1")
    fused = grads(q, k, v, w)
    for a, b, name in zip(fused, ref, ["dq", "dk", "dv", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("causal,m,n", [(False, 128, 128), (True, 128, 128),
                                        (False, 96, 160), (True, 70, 133)])
def test_rpe_fwd_resident_matches_scratch_path(monkeypatch, causal, m, n):
    """The default batch-innermost resident-bias forward (n_j==1
    specialization) must match the FLASHT5_RPE_FWD_RESIDENT=0 revolving
    scratch forward: outputs and all four gradients."""
    nb, maxd, scale = 32, 128, 0.125
    q, k, v, w = _setup(2, 3, m, n, 64, nb, maxd, seed=7)

    def vals_and_grads(q, k, v, w):
        def loss(q_, k_, v_, w_):
            return jnp.sum(flash_attention_rpe(
                q_, k_, v_, w_, causal=causal, sm_scale=scale,
                bidirectional=not causal, num_buckets=nb,
                max_distance=maxd).astype(jnp.float32) ** 2)
        out = flash_attention_rpe(q, k, v, w, causal=causal, sm_scale=scale,
                                  bidirectional=not causal, num_buckets=nb,
                                  max_distance=maxd)
        return (out,) + jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, w)

    monkeypatch.setenv("FLASHT5_RPE_FWD_RESIDENT", "0")
    ref = vals_and_grads(q, k, v, w)
    monkeypatch.setenv("FLASHT5_RPE_FWD_RESIDENT", "1")
    res = vals_and_grads(q, k, v, w)
    for a, b, name in zip(res, ref, ["o", "dq", "dk", "dv", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5, err_msg=name)


@pytest.mark.parametrize("causal,m,n", [(False, 128, 128), (True, 128, 128),
                                        (False, 96, 160), (True, 70, 133)])
def test_rpe_bfold_matches_default(monkeypatch, causal, m, n):
    """The default batch-folded kernels (batch loop unrolled inside the
    program, grid (h, i)) must match the FLASHT5_RPE_BFOLD=0 batch-innermost
    (h, i, b) kernels: outputs and all four gradients."""
    nb, maxd, scale = 32, 128, 0.125
    q, k, v, w = _setup(3, 2, m, n, 64, nb, maxd, seed=23)

    def vals_and_grads(q, k, v, w):
        def loss(q_, k_, v_, w_):
            return jnp.sum(flash_attention_rpe(
                q_, k_, v_, w_, causal=causal, sm_scale=scale,
                bidirectional=not causal, num_buckets=nb,
                max_distance=maxd).astype(jnp.float32) ** 2)
        out = flash_attention_rpe(q, k, v, w, causal=causal, sm_scale=scale,
                                  bidirectional=not causal, num_buckets=nb,
                                  max_distance=maxd)
        return (out,) + jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, w)

    monkeypatch.setenv("FLASHT5_RPE_BFOLD", "0")
    ref = vals_and_grads(q, k, v, w)
    monkeypatch.setenv("FLASHT5_RPE_BFOLD", "1")
    res = vals_and_grads(q, k, v, w)
    for a, b, name in zip(res, ref, ["o", "dq", "dk", "dv", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5, err_msg=name)


@pytest.mark.parametrize("causal,m,n", [(False, 128, 128), (True, 128, 128),
                                        (True, 70, 133)])
def test_rpe_exp2_matches_default(monkeypatch, causal, m, n):
    """FLASHT5_EXP2=1 (exp2 on prescaled q + log2-domain bias table in the
    batch-folded kernels) must match the default exp path on outputs and all
    four gradients (dw is natural-domain in both)."""
    nb, maxd, scale = 32, 128, 0.125
    q, k, v, w = _setup(3, 2, m, n, 64, nb, maxd, seed=59)

    def vals_and_grads(q, k, v, w):
        def loss(q_, k_, v_, w_):
            return jnp.sum(flash_attention_rpe(
                q_, k_, v_, w_, causal=causal, sm_scale=scale,
                bidirectional=not causal, num_buckets=nb,
                max_distance=maxd).astype(jnp.float32) ** 2)
        out = flash_attention_rpe(q, k, v, w, causal=causal, sm_scale=scale,
                                  bidirectional=not causal, num_buckets=nb,
                                  max_distance=maxd)
        return (out,) + jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, w)

    monkeypatch.setenv("FLASHT5_EXP2", "0")
    ref = vals_and_grads(q, k, v, w)
    monkeypatch.setenv("FLASHT5_EXP2", "1")
    res = vals_and_grads(q, k, v, w)
    for a, b, name in zip(res, ref, ["o", "dq", "dk", "dv", "dw"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3, err_msg=name)
