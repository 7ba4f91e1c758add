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


def timed(fn, *a, n=5):
    outs = fn(*a)
    jax.tree.leaves(outs)[0].block_until_ready()
    _ = float(np.asarray(jax.tree.leaves(outs)[0], np.float32).ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        outs = fn(*a)
        _ = float(np.asarray(jax.tree.leaves(outs)[0], np.float32).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


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

    results = {}

    slot_eng = InferenceEngine(config, params, EngineConfig(
        kv_dtype="int8", max_slots=slots, max_decode_len=max_new + 2,
        max_encode_len=enc_len, encode_buckets=(enc_len,),
        steps_per_sync=sync))
    slot_eng.run([Request(uid=r.uid, input_ids=r.input_ids,
                          max_new_tokens=max_new) for r in reqs])
    slot_eng.run([Request(uid=r.uid, input_ids=r.input_ids,
                          max_new_tokens=max_new) for r in reqs])
    st = slot_eng.state
    rng = jax.random.PRNGKey(0)
    results["slot_window_ms"] = round(timed(
        lambda: slot_eng._multi_step_fn(slot_eng.params, st.layers, st.enc_len,
                                        st.pos, st.cur_token, st.active,
                                        st.budget, rng)) * 1e3, 2)

    for wa in (True, False):
        eng = PagedInferenceEngine(config, params, PagedEngineConfig(
            max_slots=slots, page_size=page, num_pages=slots * maxp,
            max_pages_per_slot=maxp, max_encode_len=enc_len,
            encode_buckets=(enc_len,), kv_dtype="int8", steps_per_sync=sync,
            window_appends=wa))
        eng.run([Request(uid=r.uid, input_ids=r.input_ids,
                         max_new_tokens=max_new) for r in reqs])
        eng.run([Request(uid=r.uid, input_ids=r.input_ids,
                         max_new_tokens=max_new) for r in reqs])
        st = eng.state
        tag = "paged_window_ms" if wa else "paged_window_ms_no_window_appends"
        results[tag] = round(timed(
            lambda: eng._multi_step_fn(eng.params, st.layers, st.page_table,
                                       st.enc_len, st.pos, st.cur_token,
                                       st.active, st.budget)) * 1e3, 2)

    results["note"] = (
        f"one jit'd decode window = {sync} steps at slots={slots}, "
        f"enc={enc_len}, int8 w+kv, FAT5-small; median of 5; state frozen "
        "mid-generation (committed prefix from a full prior run)")
    print(json.dumps(results), flush=True)
    with open("docs/paged_step_probe.json", "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
