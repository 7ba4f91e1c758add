"""On-chip A/B of the lm_head+CE region, fused vs unfused, fwd+bwd
(chained differential timing at the flagship loss shape).

Unfused = bf16 matmul -> tiled Pallas CE (production r3 path).
Fused   = ops/fused_linear_ce.py (logits never round-trip HBM).

Roofline anatomy at (rows 2048, d 512, V 32768), v5e (197 TFLOP/s bf16,
819 GB/s):
  unfused: 3 matmuls (logits, dx, dW) = 206 GF = 1.05 ms MXU floor, plus
           ~768 MB of logits/dlogits HBM round-trips = 0.94 ms
  fused:   4 matmuls (logits fwd, recompute, dx, dW) = 275 GF = 1.40 ms MXU
           floor, plus ~130 MB residual traffic = 0.16 ms

    python tools/flce_probe.py
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

import jax
import jax.numpy as jnp


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from speed_of_light_tpu import chained_seconds
    from flasht5_tpu.ops.cross_entropy import cross_entropy_loss
    from flasht5_tpu.ops.fused_linear_ce import fused_linear_cross_entropy

    rows, d, v = 2048, 512, 32768
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x0 = jax.random.normal(ks[0], (rows, d), jnp.bfloat16)
    w = jax.random.normal(ks[1], (d, v), jnp.float32) * (d ** -0.5)
    labels = jax.random.randint(ks[2], (rows,), 0, v)

    def fold(x, dx, dw):
        # keep both gradients live in the carry so nothing is DCE'd
        return (x + dx * 1e-30
                + (dw.sum(axis=1) * 1e-30)[None, :].astype(x.dtype))

    def unfused(x, w, labels):
        def loss_fn(x, w):
            logits = jnp.dot(x, w.astype(x.dtype))
            losses, _ = cross_entropy_loss(logits, labels, 1e-4, 0.0)
            return jnp.mean(losses)

        _, (dx, dw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x, w)
        return fold(x, dx, dw)

    def fused(x, w, labels):
        def loss_fn(x, w):
            losses, _ = fused_linear_cross_entropy(x, w, labels, 1e-4, 0.0)
            return jnp.mean(losses)

        _, (dx, dw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(x, w)
        return fold(x, dx, dw)

    mxu_ms_unfused = 3 * 2 * rows * d * v / 197e12 * 1e3
    mxu_ms_fused = 4 * 2 * rows * d * v / 197e12 * 1e3
    for name, fn, floor in (("unfused", unfused, mxu_ms_unfused),
                            ("fused", fused, mxu_ms_fused)):
        sec = chained_seconds(lambda c, w, l, f=fn: f(c, w, l), x0, w, labels)
        print(json.dumps({"variant": name, "ms": round(sec * 1e3, 3),
                          "mxu_floor_ms": round(floor, 3),
                          "of_floor": round(floor / (sec * 1e3), 3)}),
              flush=True)

    # forward-only (the serving-relevant path)
    def unfused_fwd(x, w, labels):
        logits = jnp.dot(x, w.astype(x.dtype))
        losses, _ = cross_entropy_loss(logits, labels, 1e-4, 0.0)
        return x + losses[:, None].astype(x.dtype) * 1e-30

    def fused_fwd(x, w, labels):
        losses, _ = fused_linear_cross_entropy(x, w, labels, 1e-4, 0.0)
        return x + losses[:, None].astype(x.dtype) * 1e-30

    for name, fn in (("unfused_fwd", unfused_fwd), ("fused_fwd", fused_fwd)):
        sec = chained_seconds(lambda c, w, l, f=fn: f(c, w, l), x0, w, labels)
        print(json.dumps({"variant": name, "ms": round(sec * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
