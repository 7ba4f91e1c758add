"""Multi-host helpers (single-process semantics on the CPU mesh)."""

import numpy as np

from flasht5_tpu.parallel.distributed import (
    host_local_batch_slice,
    initialize_multihost,
)


def test_initialize_single_process_noop():
    info = initialize_multihost()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["global_devices"] == 8


def test_host_local_batch_slice():
    s = host_local_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)  # single host owns everything
    data = np.arange(32)
    assert len(data[s]) == 32
