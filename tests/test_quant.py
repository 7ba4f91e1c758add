"""INT8 weight-only quantization tests: kernel vs oracle, tree tool,
end-to-end quantized forward/generate quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    quant_matmul,
    quant_matmul_ref,
    quantize_int8,
)
from flasht5_tpu.quantize import dequantize_params, quantize_params, quantized_bytes


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512))
    qt = quantize_int8(w)
    assert qt.qvalues.dtype == jnp.int8
    assert qt.scales.shape == (1, 512)
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w)).max()
    # max error bounded by scale/2 per channel
    assert err <= float(np.asarray(qt.scales).max()) * 0.51


@pytest.mark.parametrize("m,k,n", [(64, 512, 512), (37, 512, 1024)])
def test_quant_matmul_kernel(m, k, n):
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.05
    qt = quantize_int8(w)
    out = quant_matmul(x, qt)
    ref = quant_matmul_ref(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2,
                               rtol=1e-2)


def test_quant_matmul_fallback_shapes():
    # N not divisible by the block -> jnp fallback path (exact match)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 512))
    w = jax.random.normal(jax.random.PRNGKey(1), (512, 600)) * 0.1
    qt = quantize_int8(w)
    np.testing.assert_allclose(np.asarray(quant_matmul(x, qt)),
                               np.asarray(quant_matmul_ref(x, qt)), atol=1e-5)
    # small odd shapes run through the kernel with bf16 accuracy
    x2 = jax.random.normal(jax.random.PRNGKey(2), (8, 100))
    w2 = jax.random.normal(jax.random.PRNGKey(3), (100, 64)) * 0.1
    qt2 = quantize_int8(w2)
    np.testing.assert_allclose(np.asarray(quant_matmul(x2, qt2)),
                               np.asarray(quant_matmul_ref(x2, qt2)),
                               atol=2e-2, rtol=1e-2)


def test_quantize_params_selectivity():
    config = FlashT5Config(vocab_size=128, d_model=64, d_kv=16, num_heads=4,
                           d_ff=128, num_layers=1, dtype="float32")
    params = t5.init_params(jax.random.PRNGKey(0), config)
    qp = quantize_params(params)
    blk = qp["encoder"]["block"][0]
    assert isinstance(blk["self_attention_layer"]["self_attention"]["Wq"],
                      QuantizedTensor)
    assert isinstance(qp["lm_head"], QuantizedTensor)
    # norms / pe / embeddings untouched
    assert not isinstance(blk["self_attention_layer"]["layer_norm"]["weight"],
                          QuantizedTensor)
    assert not isinstance(qp["shared"]["embedding"], QuantizedTensor)
    assert not isinstance(
        blk["self_attention_layer"]["self_attention"]["pe_encoding"]
        ["relative_attention_bias"], QuantizedTensor)
    assert quantized_bytes(qp) < quantized_bytes(params) * 0.6


def test_quantized_forward_close_and_generate():
    config = FlashT5Config(vocab_size=256, d_model=64, d_kv=16, num_heads=4,
                           d_ff=128, num_layers=2, dropout_rate=0.0,
                           attention_scale=1.0, dtype="float32", pad_token_id=0)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    qp = quantize_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 2, 256)
    lbl = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 2, 256)

    out_f = t5.forward(config, params, input_ids=ids, labels=lbl)
    out_q = t5.forward(config, qp, input_ids=ids, labels=lbl)
    # int8 weight-only should track full precision closely at init scale
    np.testing.assert_allclose(np.asarray(out_q["logits"]),
                               np.asarray(out_f["logits"]), atol=0.1, rtol=0.5)

    from flasht5_tpu.inference import generate
    gen = generate(config, qp, ids, max_length=5)
    assert gen.shape == (2, 6)

    # dequantize restores a plain tree
    dq = dequantize_params(qp)
    assert not isinstance(dq["lm_head"], QuantizedTensor)
    out_d = t5.forward(config, dq, input_ids=ids, labels=lbl)
    # kernel computes in bf16, dequantized tree in fp32 — small drift expected
    np.testing.assert_allclose(np.asarray(out_d["logits"]),
                               np.asarray(out_q["logits"]), atol=5e-2, rtol=1e-2)


def test_fp8_quantization():
    from flasht5_tpu.ops.quant import quantize_fp8

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512)) * 0.1
    qt = quantize_fp8(w)
    assert qt.qvalues.dtype == jnp.float8_e4m3fn
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w))
    # e4m3 relative error ~2^-3 of each value's magnitude
    assert err.max() < float(np.abs(np.asarray(w)).max()) * 0.08
    # fp8 storage now goes THROUGH the Pallas kernel (bf16 MXU) — compare
    # with the kernel-path tolerance, same as the int8 kernel test
    out = quant_matmul(jax.random.normal(jax.random.PRNGKey(1), (16, 256)), qt)
    ref = quant_matmul_ref(jax.random.normal(jax.random.PRNGKey(1), (16, 256)), qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2,
                               rtol=1e-2)


@pytest.mark.parametrize("m,k,n", [(64, 512, 512), (37, 512, 1024)])
def test_quant_matmul_kernel_fp8(m, k, n):
    """FP8-e4m3 storage through the fused Pallas kernel (round-1 gap: fp8
    always fell back to the XLA path, ops/quant.py:115-117)."""
    from flasht5_tpu.ops.quant import quantize_fp8

    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.05
    qt = quantize_fp8(w)
    out = quant_matmul(x, qt)
    ref = quant_matmul_ref(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2,
                               rtol=1e-2)


def test_quantize_params_fp8_forward():
    config = FlashT5Config(vocab_size=256, d_model=64, d_kv=16, num_heads=4,
                           d_ff=128, num_layers=1, dropout_rate=0.0,
                           attention_scale=1.0, dtype="float32", pad_token_id=0)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    qp = quantize_params(params, mode="fp8")
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 2, 256)
    lbl = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 2, 256)
    out_q = t5.forward(config, qp, input_ids=ids, labels=lbl)
    out_f = t5.forward(config, params, input_ids=ids, labels=lbl)
    np.testing.assert_allclose(np.asarray(out_q["logits"]),
                               np.asarray(out_f["logits"]), atol=0.2, rtol=0.5)


# ---------------------------------------------------------------------------
# Group-wise (sub-channel) scaling
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode,group", [("int8", 128), ("int8", 64),
                                        ("fp8", 128)])
def test_groupwise_quantize_roundtrip(mode, group):
    from flasht5_tpu.ops.quant import quantize_fp8
    quantizer = {"int8": quantize_int8, "fp8": quantize_fp8}[mode]
    # outlier rows make per-channel scales coarse; group-wise must win
    w = np.array(jax.random.normal(jax.random.PRNGKey(0), (512, 256)))
    w[::97] *= 20.0
    w = jnp.asarray(w)
    qt_pc = quantizer(w)
    qt_g = quantizer(w, group)
    assert qt_g.scales.shape == (512 // group, 256)
    assert qt_g.group_size == group
    err_pc = float(jnp.abs(dequantize(qt_pc) - w).mean())
    err_g = float(jnp.abs(dequantize(qt_g) - w).mean())
    assert err_g < err_pc


@pytest.mark.parametrize("mode,group,k", [("int8", 128, 512), ("fp8", 128, 512),
                                          ("int8", 256, 1024),
                                          ("int8", 1024, 1024)])
def test_groupwise_quant_matmul_kernel(mode, group, k):
    from flasht5_tpu.ops.quant import quantize_fp8
    quantizer = {"int8": quantize_int8, "fp8": quantize_fp8}[mode]
    x = jax.random.normal(jax.random.PRNGKey(0), (64, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, 512), jnp.float32) * 0.05
    qt = quantizer(w, group)
    out = quant_matmul(x, qt)
    ref = quant_matmul_ref(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2,
                               rtol=1e-2)


def test_quantize_params_groupwise_forward():
    config = FlashT5Config(
        vocab_size=128, d_model=64, d_kv=16, num_heads=4, d_ff=256,
        num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        attention_type="ref", pad_token_id=0)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    qp = quantize_params(params, "fp8", group_size=32)
    # scales really are grouped on the quantized linears
    wq = qp["encoder"]["block"][0]["self_attention_layer"][
        "self_attention"]["Wq"]
    assert isinstance(wq, QuantizedTensor)
    assert wq.scales.shape[0] == wq.qvalues.shape[0] // 32
    ids = jnp.arange(24, dtype=jnp.int32).reshape(2, 12) % 100
    labels = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 100
    out_fp = t5.forward(config, params, input_ids=ids, labels=labels)
    out_q = t5.forward(config, qp, input_ids=ids, labels=labels)
    assert np.isfinite(float(out_q["loss"]))
    assert abs(float(out_q["loss"]) - float(out_fp["loss"])) < 0.35


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_groupwise_quant_matmul_sub128_group_falls_back(mode):
    """Group sizes < 128 violate Mosaic's lane rule for the x-block k-tile;
    quant_matmul must route them to the XLA fused-dequant path and still
    match the oracle exactly."""
    from flasht5_tpu.ops.quant import quantize_fp8
    quantizer = {"int8": quantize_int8, "fp8": quantize_fp8}[mode]
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 512),
                          jnp.float32) * 0.05
    qt = quantizer(w, 64)
    out = quant_matmul(x, qt)
    ref = quant_matmul_ref(x, qt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0,
                               rtol=0)
