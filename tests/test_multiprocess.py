"""Real multi-process data-parallel execution (subprocess-spawned).

Exercises the actual DCN code path — `jax.distributed.initialize` via
parallel/distributed.initialize_multihost, per-host data loading via
host_local_batch_slice, make_array_from_process_local_data assembly, and the
cross-process gradient psum inside the jitted train step — by launching two
OS processes, each owning two virtual CPU devices, and asserting per-step
loss parity with a single-process run over the identical 4-device mesh.

This is the honest substitute for unavailable multi-host hardware: the same
code path on real TPU pods only changes the transport under the coordinator
(DCN instead of localhost gRPC). Reference counterpart: torchrun DDP
(SURVEY.md §2.8), which the reference never tests either.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from multiprocess_launch import launch  # noqa: E402
from multiprocess_serving import launch as serving_launch  # noqa: E402


def test_two_process_data_parallel_matches_single_process():
    single = launch(1, 4, steps=2, timeout=540)
    multi = launch(2, 4, steps=2, timeout=540)

    assert multi["process_count"] == 2
    assert multi["local_devices"] == 2
    assert multi["global_devices"] == 4
    assert single["process_count"] == 1

    # losses decrease and agree across process topologies
    assert multi["losses"][1] < multi["losses"][0]
    for a, b in zip(single["losses"], multi["losses"]):
        assert abs(a - b) < 1e-5
    for a, b in zip(single["grad_norms"], multi["grad_norms"]):
        assert abs(a - b) < 1e-5


def test_two_process_sharded_serving_token_parity():
    """Continuous batching ACROSS PROCESSES (the north-star "across hosts"
    clause): the ShardedEngine's data axis spans two OS processes joined
    via jax.distributed; every host runs the same scheduler in lockstep
    and harvests the replicated token streams. Must be token-exact vs the
    single-process mesh (int8 KV)."""
    single = serving_launch(1, 4, timeout=540)
    multi = serving_launch(2, 4, timeout=540)
    assert multi["process_count"] == 2
    assert single["streams"] == multi["streams"]
    assert all(len(s) >= 1 for s in multi["streams"].values())


def test_two_process_sharded_paged_serving_token_parity():
    """Same, for the PAGED sharded engine: per-shard page pools +
    allocators with the data axis spanning processes — paged continuous
    batching across hosts, token-exact."""
    single = serving_launch(1, 4, timeout=540, engine="paged")
    multi = serving_launch(2, 4, timeout=540, engine="paged")
    assert multi["process_count"] == 2
    assert single["streams"] == multi["streams"]
    assert all(len(s) >= 1 for s in multi["streams"].values())
