"""Multi-host initialization and host-sharded data utilities.

TPU-native replacement for the reference's torchrun/NCCL process-group setup
(SURVEY.md §2.8): `jax.distributed.initialize` connects the hosts of a pod
slice over DCN; each host then sees the global device set and participates in
the same pjit/shard_map programs. The data axis maps to hosts (DCN), the
tensor axis to intra-host chips (ICI) — see parallel/mesh.py.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed for a multi-host TPU slice.

    On Cloud TPU the arguments auto-detect from the metadata server; on other
    clusters pass them explicitly (or via JAX_COORDINATOR_ADDRESS etc.).
    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}.
    """
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if coordinator_address or num_processes:
        # Probe the distributed runtime state directly: jax.process_count()
        # would initialize the local backend first, after which
        # jax.distributed.initialize can no longer join the job.
        from jax._src import distributed as _distributed
        if _distributed.global_state.client is None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_local_batch_slice(global_batch_size: int) -> slice:
    """The slice of a globally-indexed batch this host should load.

    Per-host data loading (the TPU analog of the reference's DataLoader
    worker split): each host feeds only its local shard of the data axis.
    """
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def make_multihost_array(local_batch: np.ndarray, sharding):
    """Assemble a globally-sharded jax.Array from per-host local data
    (jax.make_array_from_process_local_data wrapper)."""
    return jax.make_array_from_process_local_data(sharding, local_batch)
