"""Multi-process (DCN-analog) serving through the mesh-sharded engine.

The north-star serving sentence is "continuous batching of encode+decode
requests ACROSS HOSTS". tests/test_sharded_engine.py proves the sharded
engine on a single-process 8-device mesh; this launcher proves the actual
multi-host wiring: N processes join via `jax.distributed.initialize`, the
("data", "tensor") serving mesh spans processes on the data axis (each
host owns max_slots/N slots — continuous batching across hosts), and every
process runs the SAME host scheduler in lockstep (standard JAX multihost
SPMD: identical requests, identical admission decisions, collective device
steps; token streams leave the device replicated so every host harvests
identical results).

Parity protocol: identical weights + request mix run (a) single process,
4 devices, mesh (2, 2); (b) 2 processes x 2 devices, SAME global mesh
(2, 2) with "data" spanning the processes. Token streams must be
identical per request.

    python tools/multiprocess_serving.py [--json MULTIPROC_SERVING_r05.json]

Worker mode (internal): --worker --process-id I ...
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_worker(coordinator: str, num_processes: int, process_id: int,
               out_path: str, engine_kind: str = "slot") -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)

    if num_processes > 1:
        from flasht5_tpu.parallel.distributed import initialize_multihost
        initialize_multihost(coordinator, num_processes, process_id)
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np

    from flasht5_tpu.config import FlashT5Config
    from flasht5_tpu.inference.engine import EngineConfig, Request
    from flasht5_tpu.inference.sharded_engine import (ShardedEngine,
                                                      make_serving_mesh)
    from flasht5_tpu.models import t5

    config = FlashT5Config(
        vocab_size=256, d_model=64, d_kv=16, num_heads=4, d_ff=128,
        num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        use_glu_mlp=True, use_gelu_act=True, attention_scale=1.0,
        position_encoding_type="t5", attention_type="ref",
        use_fused_crossentropy=False, pad_token_id=0, dtype="float32")

    # identical weights on every process (same seed, replicated init)
    params = t5.init_params(jax.random.PRNGKey(0), config)
    params = jax.tree.map(np.asarray, params)   # host values: multihost-safe

    mesh = make_serving_mesh(data=2, tensor=len(jax.devices()) // 2)
    if engine_kind == "paged":
        from flasht5_tpu.inference.paged_engine import PagedEngineConfig
        from flasht5_tpu.inference.sharded_paged_engine import (
            ShardedPagedEngine)
        engine = ShardedPagedEngine(config, params, PagedEngineConfig(
            max_slots=4, page_size=8, num_pages=12, max_pages_per_slot=3,
            max_encode_len=64, encode_buckets=(16, 32, 64),
            steps_per_sync=4, kv_dtype="int8"), mesh)
    else:
        ecfg = EngineConfig(max_slots=4, max_decode_len=16,
                            max_encode_len=64, encode_buckets=(16, 32, 64),
                            steps_per_sync=4, kv_dtype="int8")
        engine = ShardedEngine(config, params, ecfg, mesh)

    rng = np.random.RandomState(3)
    reqs = []
    for uid in range(6):
        L = int(rng.randint(5, 40))
        ids = rng.randint(2, 250, size=(L,)).astype(np.int32)
        reqs.append(Request(uid=uid, input_ids=ids, max_new_tokens=12))
    done = engine.run(reqs)

    streams = {str(r.uid): [int(t) for t in r.result] for r in done}
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"process_count": num_processes,
                       "global_devices": len(jax.devices()),
                       "streams": streams}, f, indent=2)
            f.write("\n")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(processes: int, devices: int, timeout: int = 600,
           engine: str = "slot") -> dict:
    per_proc = devices // processes
    port = _free_port()
    out_path = tempfile.mktemp(suffix=".json")
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={per_proc}",
    })
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--coordinator", f"127.0.0.1:{port}",
         "--processes", str(processes), "--process-id", str(pid),
         "--engine", engine, "--json", out_path],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(processes)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
        if p.returncode != 0:
            raise RuntimeError(
                f"worker exited {p.returncode}:\n" + "\n---\n".join(outs))
    with open(out_path) as f:
        result = json.load(f)
    os.unlink(out_path)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator")
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--engine", default="slot", choices=("slot", "paged"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.worker:
        run_worker(args.coordinator, args.processes, args.process_id,
                   args.json, args.engine)
        return

    single = launch(1, 4, engine=args.engine)
    multi = launch(2, 4, engine=args.engine)
    match = single["streams"] == multi["streams"]
    result = {
        "engine": args.engine,
        "single_process": single,
        "multi_process": multi,
        "token_streams_identical": match,
        "what": (f"Sharded {args.engine} engine continuous batching across "
                 "2 processes (data axis spans processes), token-exact vs "
                 "the single-process mesh"),
    }
    print(json.dumps({k: v for k, v in result.items()
                      if k != "single_process"}, indent=2)[:2000])
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
    if not match:
        sys.exit(1)


if __name__ == "__main__":
    main()
