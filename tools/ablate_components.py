"""In-situ component cost via subtraction: time the encoder/decoder stack
fwd+bwd with a component monkeypatched to a near-free stand-in, and compare
with the unmodified stack (tools/bwd_breakdown.py numbers). The difference is
the component's real in-program cost — immune to the per-dispatch overhead
that makes standalone kernel micro-benches unreliable over the tunnel.

    python tools/ablate_components.py --what attn     # stub attention kernels
    python tools/ablate_components.py --what ff       # stub the FF matmuls
    python tools/ablate_components.py --what norm     # stub rmsnorm

Prints one JSON line per stack. Patches happen at trace time, so each run
compiles fresh programs; gradients still flow through the stand-ins.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def _timeit(fn, args, n):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=["attn", "ff", "norm"], default="attn")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship_config
    from flasht5_tpu.models import t5

    config = _flagship_config()
    on_tpu = jax.default_backend() == "tpu"
    batch = 8
    enc_len, dec_len = (1024, 256) if on_tpu else (128, 64)
    n = args.steps if on_tpu else 2

    if args.what == "attn":
        # identity-ish attention: out = v reshaped — keeps projections and
        # residuals, removes only the flash kernels (and their backward)
        import flasht5_tpu.models.t5 as t5mod

        def stub_rpe(q, k, v, w, **kw):
            if w is not None:
                # keep dW alive so the param tree is unchanged
                v = v + (w.astype(jnp.float32).sum() * 0).astype(v.dtype)
            if q.shape[2] == v.shape[2]:
                return v
            return jnp.broadcast_to(
                v[:, :, :1], q.shape[:3] + (v.shape[3],)).astype(q.dtype)

        import flasht5_tpu.ops.flash_attention_rpe as farpe
        import flasht5_tpu.ops.flash_attention as fa
        farpe.flash_attention_rpe = stub_rpe
        fa.flash_attention = lambda q, k, v, b, **kw: stub_rpe(q, k, v, None)
        # t5.py imports flash_attention at module top; rebind there too
        t5mod.flash_attention = fa.flash_attention
    elif args.what == "ff":
        import flasht5_tpu.models.t5 as t5mod
        orig_ln = t5mod._layer_norm

        def stub_ff(config, params, x, *, rng=None, deterministic=True):
            return x + (params["act"][next(iter(params["act"]))]
                        .astype(jnp.float32).sum() * 0
                        + params["wo"].astype(jnp.float32).sum() * 0
                        + params["layer_norm"]["weight"]
                        .astype(jnp.float32).sum() * 0).astype(x.dtype)

        t5mod._ff = stub_ff
        del orig_ln
    else:
        import flasht5_tpu.models.t5 as t5mod
        t5mod._layer_norm = lambda config, w, x: x + (
            w.astype(jnp.float32).sum() * 0).astype(x.dtype)

    params = jax.jit(lambda r: t5.init_params(r, config))(
        jax.random.PRNGKey(0))
    input_ids = jax.random.randint(jax.random.PRNGKey(1), (batch, enc_len), 0,
                                   config.vocab_size, dtype=jnp.int32)
    dt = jnp.dtype(config.dtype)
    enc_h = jax.random.normal(jax.random.PRNGKey(3),
                              (batch, enc_len, config.d_model), dt)
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch, dec_len), 0,
                                config.vocab_size, dtype=jnp.int32)
    dec_ids = t5.shift_right(config, labels)

    def enc_loss(p, ids):
        h = t5.stack_apply(config, p["encoder"], p["shared"]["embedding"],
                           ids, is_decoder=False)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    def dec_loss(p, ids, enc_hidden):
        h = t5.stack_apply(config, p["decoder"], p["shared"]["embedding"],
                           ids, is_decoder=True,
                           encoder_hidden_states=enc_hidden)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    report = {"what": args.what}
    for name, fn, a in [("enc", enc_loss, (params, input_ids)),
                        ("dec", dec_loss, (params, dec_ids, enc_h))]:
        try:
            fb = jax.jit(jax.grad(fn))
            report[f"{name}_fwd_bwd_ms"] = round(_timeit(fb, a, n), 2)
        except Exception as e:  # noqa: BLE001
            report[f"{name}_error"] = repr(e)[:200]
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
