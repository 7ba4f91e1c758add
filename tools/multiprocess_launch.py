"""Real multi-process (DCN-analog) data-parallel run on CPU devices.

The reference's distributed story is torchrun DDP over NCCL (SURVEY.md §2.8);
the TPU-native equivalent is `jax.distributed.initialize` joining N host
processes into one global device set, with the data mesh axis spanning hosts.
Multi-chip hardware is not available here, so this launcher validates the
actual multi-process code path (parallel/distributed.py — coordinator
handshake, `host_local_batch_slice` per-host data loading,
`make_array_from_process_local_data` global-array assembly, cross-process
gradient psum) by spawning N CPU processes, each owning
`devices_per_process` virtual CPU devices.

Parity protocol: the same global computation is run as 1 process × D devices
and as N processes × D/N devices — identical global mesh, identical batch —
and per-step losses must agree. That isolates exactly the multi-process
communication layer.

Usage:
    python tools/multiprocess_launch.py [--processes 2] [--devices 4]
        [--steps 3] [--json MULTIPROC_r03.json]

Worker mode (internal): multiprocess_launch.py --worker --process-id I ...
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


# ---------------------------------------------------------------------------
# Worker
# ---------------------------------------------------------------------------

def run_worker(coordinator: str, num_processes: int, process_id: int,
               steps: int, out_path: str) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, REPO)
    from flasht5_tpu.parallel.distributed import (
        host_local_batch_slice,
        initialize_multihost,
        make_multihost_array,
    )

    info = initialize_multihost(coordinator, num_processes, process_id)
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flasht5_tpu.config import FlashT5Config
    from flasht5_tpu.models import t5
    from flasht5_tpu.optim import adamw_scale, no_decay_mask
    from flasht5_tpu.parallel.mesh import make_mesh
    from flasht5_tpu.parallel.train_step import make_train_step

    config = FlashT5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        pad_token_id=0, dtype="float32", param_dtype="float32",
        attention_type="ref", use_fused_crossentropy=False, z_loss=1e-4)

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    params = jax.jit(lambda r: t5.init_params(r, config),
                     out_shardings=repl)(jax.random.PRNGKey(0))
    tx = adamw_scale(1e-3, weight_decay=0.01, mask=no_decay_mask)
    opt_state = jax.jit(tx.init, out_shardings=None)(params)

    # identical global batch on every host; each loads only its local rows
    rng = np.random.default_rng(7)
    global_batch = 8
    input_ids = rng.integers(2, config.vocab_size, size=(global_batch, 16)).astype(np.int32)
    labels = rng.integers(2, config.vocab_size, size=(global_batch, 12)).astype(np.int32)
    sl = host_local_batch_slice(global_batch)
    batch = {
        "input_ids": make_multihost_array(input_ids[sl], data_sh),
        "labels": make_multihost_array(labels[sl], data_sh),
    }

    step = jax.jit(make_train_step(config, tx), donate_argnums=(0, 1))
    losses, gnorms = [], []
    for _ in range(steps):
        params, opt_state, metrics = step(params, opt_state, batch, None)
        losses.append(float(metrics["loss"]))
        gnorms.append(float(metrics["grad_norm"]))

    # timed loop AFTER the parity steps (everything compiled): the same
    # global computation at 1 process vs N processes differs only by the
    # cross-process transport, so t_N - t_1 is the DCN-analog comm cost
    import time
    timed = max(10, steps)
    t0 = time.perf_counter()
    for _ in range(timed):
        params, opt_state, metrics = step(params, opt_state, batch, None)
    float(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / timed * 1e3

    # Per-collective breakdown (VERDICT r4 #10): time ISOLATED all-reduces
    # of the exact gradient pytree and its largest single leaves on the
    # same global mesh — every process executes the same collective, so
    # this decomposes comm_time_fraction into per-collective costs without
    # trace parsing. On CPU transport the numbers are latency-dominated
    # (tiny model) — that latency floor IS the DCN-analog quantity.
    from jax import shard_map

    def timed_allreduce(tree, reps=30):
        specs = jax.tree.map(lambda _: P(), tree)
        fn = jax.jit(shard_map(
            lambda t: jax.tree.map(lambda x: jax.lax.psum(x, "data"), t),
            mesh=mesh, in_specs=(specs,), out_specs=specs,
            check_vma=False))
        out = fn(tree)                       # warm/compile
        jax.tree.leaves(out)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(tree)
        np.asarray(jax.tree.leaves(out)[0])  # real transfer = real barrier
        ms = (time.perf_counter() - t0) / reps * 1e3
        nbytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(tree))
        return {"bytes": int(nbytes), "ms": round(ms, 4)}

    emb = params["shared"]["embedding"]
    flat = jnp.concatenate([jnp.ravel(x).astype(jnp.float32)
                            for x in jax.tree.leaves(params)])
    collectives = {
        "scalar_latency_floor": timed_allreduce(jnp.float32(1.0)),
        "embedding_grad": timed_allreduce(emb),
        # per-leaf pytree vs one flat bucket of the same bytes: the gap is
        # pure per-collective dispatch/latency — the quantity the XLA
        # all-reduce combiner's bucketing removes on real hardware
        "full_grad_pytree_per_leaf": timed_allreduce(params),
        "full_grad_single_bucket": timed_allreduce(flat),
    }

    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({
                "process_count": info["process_count"],
                "local_devices": info["local_devices"],
                "global_devices": len(jax.devices()),
                "losses": losses,
                "grad_norms": gnorms,
                "step_ms": round(step_ms, 3),
                "collectives": collectives,
            }, f, indent=2)
            f.write("\n")


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(processes: int, devices: int, steps: int = 3,
           timeout: int = 600) -> dict:
    """Spawn `processes` workers splitting `devices` CPU devices; return the
    process-0 result dict."""
    assert devices % processes == 0
    per_proc = devices // processes
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_path = tempfile.mktemp(suffix=".json")

    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO,          # drop axon sitecustomize, keep the repo
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={per_proc}",
    })
    procs = []
    for pid in range(processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--coordinator", coordinator,
             "--processes", str(processes), "--process-id", str(pid),
             "--steps", str(steps), "--json", out_path],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
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
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    if args.worker:
        run_worker(args.coordinator, args.processes, args.process_id,
                   args.steps, args.json)
        return

    single = launch(1, args.devices, args.steps)
    multi = launch(args.processes, args.devices, args.steps)
    max_dloss = max(abs(a - b) for a, b in zip(single["losses"],
                                               multi["losses"]))

    def comm_fraction(m):
        # fraction of the multi-process step spent in cross-process
        # transport (same global mesh/batch; only the wiring differs)
        return max(0.0, round(1.0 - single["step_ms"] / m["step_ms"], 4)) \
            if m.get("step_ms") and single.get("step_ms") else None

    result = {
        "single_process": single,
        "multi_process": multi,
        "comm_time_fraction": comm_fraction(multi),
        "max_loss_delta": max_dloss,
        "parity_ok": max_dloss < 1e-5,
    }
    if args.processes != 4 and args.devices % 4 == 0:
        multi4 = launch(4, args.devices, args.steps)
        d4 = max(abs(a - b) for a, b in zip(single["losses"],
                                            multi4["losses"]))
        result["multi_process_4"] = multi4
        result["comm_time_fraction_4"] = comm_fraction(multi4)
        result["parity_ok_4"] = d4 < 1e-5
        result["max_loss_delta_4"] = d4
    print(json.dumps(result, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
