"""Localize the backward's cost: time enc stack, dec stack, and CE head
fwd vs fwd+bwd separately (remote tracing is unreliable over the axon
tunnel, so this ablates component-by-component like step_breakdown.py).

    python tools/bwd_breakdown.py [--steps 20]

Prints one JSON line of ms per component. Components use the same config,
shapes, and kernels as bench.py (FAT5-small, enc 1024 / dec 256, batch 8).
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
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship_config
    from flasht5_tpu.models import t5
    from flasht5_tpu.ops import cross_entropy

    config = _flagship_config()
    on_tpu = jax.default_backend() == "tpu"
    batch = 8
    enc_len, dec_len = (1024, 256) if on_tpu else (128, 64)
    n = args.steps if on_tpu else 2

    params = jax.jit(lambda r: t5.init_params(r, config))(
        jax.random.PRNGKey(0))
    input_ids = jax.random.randint(jax.random.PRNGKey(1), (batch, enc_len), 0,
                                   config.vocab_size, dtype=jnp.int32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch, dec_len), 0,
                                config.vocab_size, dtype=jnp.int32)

    dt = jnp.dtype(config.dtype)
    enc_h = jax.random.normal(jax.random.PRNGKey(3),
                              (batch, enc_len, config.d_model), dt)
    dec_h = jax.random.normal(jax.random.PRNGKey(4),
                              (batch, dec_len, config.d_model), dt)
    logits_like = jax.random.normal(
        jax.random.PRNGKey(5), (batch, dec_len, config.d_model), dt)

    def enc_loss(p, ids):
        h = t5.stack_apply(config, p["encoder"], p["shared"]["embedding"],
                           ids, is_decoder=False)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    def dec_loss(p, ids, enc_hidden):
        h = t5.stack_apply(config, p["decoder"], p["shared"]["embedding"],
                           ids, is_decoder=True,
                           encoder_hidden_states=enc_hidden)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    def head_loss(p, h, lab):
        lm_logits = jnp.dot(h, p["lm_head"].astype(h.dtype))
        return t5.compute_loss(config, lm_logits, lab)

    dec_ids = t5.shift_right(config, labels)

    comps = {
        "enc": (enc_loss, (params, input_ids)),
        "dec": (dec_loss, (params, dec_ids, enc_h)),
        "head": (head_loss, (params, logits_like, labels)),
    }
    report = {}
    for name, (fn, a) in comps.items():
        try:
            f = jax.jit(fn)
            fb = jax.jit(jax.grad(fn))
            report[f"{name}_fwd_ms"] = round(_timeit(f, a, n), 2)
            report[f"{name}_fwd_bwd_ms"] = round(_timeit(fb, a, n), 2)
        except Exception as e:  # noqa: BLE001 - report and continue
            report[f"{name}_error"] = repr(e)[:200]
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
