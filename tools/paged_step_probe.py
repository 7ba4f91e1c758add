"""Where does the paged engine's dense-settings gap go? (VERDICT r3 #5)

Times the jit'd decode WINDOW function of the slot and paged engines in
isolation (no host scheduling, no prefill) at the SERVING_PAGED settings
(FAT5-small, int8 w+kv, 8 slots, enc 512, sync 64), plus the paged window's
separable pieces. Writes docs/paged_step_probe.json.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _one(fn):
    t0 = time.perf_counter()
    outs = fn()
    _ = float(np.asarray(jax.tree.leaves(outs)[0], np.float32).ravel()[0])
    return time.perf_counter() - t0


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config
    from flasht5_tpu.inference.engine import EngineConfig, InferenceEngine, Request
    from flasht5_tpu.inference.paged_engine import (PagedEngineConfig,
                                                    PagedInferenceEngine)
    from flasht5_tpu.models import t5
    from flasht5_tpu.quantize import quantize_params

    on_tpu = jax.default_backend() == "tpu"
    config = _flagship_config(tiny=not on_tpu).replace(dropout_rate=0.0)
    params = quantize_params(
        jax.jit(lambda r: t5.init_params(r, config))(jax.random.PRNGKey(0)))

    slots, enc_len, max_new, sync = (8, 512, 256, 64) if on_tpu else (3, 16, 8, 4)
    page = 64 if on_tpu else 8
    maxp = -(-(max_new + 2) // page)
    rng = np.random.default_rng(0)
    reqs = [Request(uid=i,
                    input_ids=rng.integers(2, config.vocab_size,
                                           size=(enc_len,)).astype(np.int32),
                    max_new_tokens=max_new) for i in range(slots)]

    fns = {}

    slot_eng = InferenceEngine(config, params, EngineConfig(
        kv_dtype="int8", max_slots=slots, max_decode_len=max_new + 2,
        max_encode_len=enc_len, encode_buckets=(enc_len,),
        steps_per_sync=sync))
    slot_eng.run([Request(uid=r.uid, input_ids=r.input_ids,
                          max_new_tokens=max_new) for r in reqs])
    st_s = slot_eng.state
    rng = jax.random.PRNGKey(0)
    # the engines' own jits DONATE the state buffers; the probe replays a
    # frozen state many times, so re-jit the window fns without donation
    slot_multi = jax.jit(slot_eng._make_multi_step())
    fns["slot"] = lambda: slot_multi(
        slot_eng.params, st_s.layers, st_s.enc_len, st_s.pos, st_s.cur_token,
        st_s.active, st_s.budget, rng)

    def paged_variant(tag, **kw):
        eng = PagedInferenceEngine(config, params, PagedEngineConfig(
            max_slots=slots, page_size=page, num_pages=slots * maxp,
            max_pages_per_slot=maxp, max_encode_len=enc_len,
            encode_buckets=(enc_len,), kv_dtype="int8", steps_per_sync=sync,
            **kw))
        eng.run([Request(uid=r.uid, input_ids=r.input_ids,
                         max_new_tokens=max_new) for r in reqs])
        st = eng.state
        multi = jax.jit(eng._make_multi_step())
        no_rel = jnp.zeros((slots,), jnp.bool_)
        fns[tag] = lambda: multi(
            eng.params, st.layers, st.page_table, no_rel, st.enc_len,
            st.pos, st.cur_token, st.active, st.budget)

    paged_variant("paged_window_staged")                # r4 default
    paged_variant("paged_kernel_read", window_stage_max_bytes=0)
    paged_variant("paged_dense_read", window_stage_max_bytes=0,
                  dense_read_max=100000)
    paged_variant("paged_kernel_no_window", window_stage_max_bytes=0,
                  dense_read_max=0, window_appends=False)

    samples = {t: [] for t in fns}
    for t, fn in fns.items():
        _one(fn)                                 # warm every variant first
    for _ in range(7):                           # interleaved: load drift on
        for t, fn in fns.items():                # the shared chip hits all
            samples[t].append(_one(fn))          # variants alike
    results = {f"{t}_window_ms": round(sorted(s)[len(s) // 2] * 1e3, 2)
               for t, s in samples.items()}
    for t, s in samples.items():
        results[f"{t}_minmax_ms"] = [round(min(s) * 1e3, 2),
                                     round(max(s) * 1e3, 2)]
    results["note"] = (
        f"one jit'd decode window = {sync} steps at slots={slots}, "
        f"enc={enc_len}, int8 w+kv, FAT5-small; INTERLEAVED median of 7 "
        "(shared-chip load drift hits all variants alike); state frozen "
        "mid-generation (committed prefix from a full prior run)")
    print(json.dumps(results), flush=True)
    with open("docs/paged_step_probe.json", "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
