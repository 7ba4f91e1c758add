"""Pin down WHY on-chip speculative output can drift from greedy at default
matmul precision (docs/spec_decode.json `agreement` < 1 on random init).

Replays the greedy chain; at every step computes the next-token logits twice
— once through the 1-row `decode_step`, once as row 0 of a Q=4
`decode_window_step` (drafts are garbage; row 0 is mathematically
independent of them) — and tracks max |logit diff| and argmax flips, at
default / float32 / highest matmul precision.

Measured on the v5e chip (round 5, d512/L8 random init, 60 steps):

    default  max|diff| 0.0371   argmax flips: 1
    float32  max|diff| 2.9e-6   argmax flips: 0
    highest  max|diff| 2.9e-6   argmax flips: 0

i.e. the verify window is exact; the default-precision bf16 matmul passes
reduce the 1-row and Q-row cases in different orders and random-init logits
are so flat (expected top-2 gap ~ range/vocab ~ 2.5e-4) that a 1e-2
perturbation flips near-ties. Trained checkpoints with multi-logit top-2
margins do not flip; CPU f32 parity tests are token-exact.
"""

import contextlib
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.inference.kv_cache import (decode_step, decode_window_step,
                                            init_decode_state)
from flasht5_tpu.models import t5

cfg = FlashT5Config(vocab_size=32128, d_model=512, d_kv=64, num_heads=6,
                    d_ff=1024, num_layers=8, dropout_rate=0.0,
                    dtype="float32", pad_token_id=0, max_sequence_length=1024)
params = t5.init_params(jax.random.PRNGKey(0), cfg)
ids = jax.random.randint(jax.random.PRNGKey(1), (1, 256), 2, 32000)


def make_probe():
    @jax.jit
    def probe(ids, params):
        enc = t5.encode(cfg, params, ids)
        st = init_decode_state(cfg, params, enc, 70)
        stw = init_decode_state(cfg, params, enc, 70)
        tok = jnp.zeros((1,), jnp.int32)

        def body(i, carry):
            st, stw, tok, worst, nsplit = carry
            l1, st = decode_step(cfg, params, st, tok)
            w_in = jnp.concatenate(
                [tok[:, None], jnp.full((1, 3), 7, jnp.int32)], axis=1)
            lw, stw_full = decode_window_step(cfg, params, stw, w_in)
            stw = stw_full._replace(t=stw_full.t - 3)  # roll back drafts
            d = jnp.max(jnp.abs(l1 - lw[:, 0]))
            split = jnp.argmax(l1[0]) != jnp.argmax(lw[0, 0])
            tok = jnp.argmax(l1, axis=-1).astype(jnp.int32)
            return (st, stw, tok, jnp.maximum(worst, d),
                    nsplit + split.astype(jnp.int32))

        _, _, _, worst, nsplit = jax.lax.fori_loop(
            0, 60, body, (st, stw, tok, jnp.float32(0), jnp.int32(0)))
        return worst, nsplit
    return probe


if __name__ == "__main__":
    for prec in ("default", "float32", "highest"):
        ctx = (jax.default_matmul_precision(prec) if prec != "default"
               else contextlib.nullcontext())
        with ctx:
            w, n = make_probe()(ids, params)
            print(prec, "max |row0 logit diff| over 60 steps:", float(w),
                  "argmax splits:", int(n))
