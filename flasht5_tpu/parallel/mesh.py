"""Device-mesh construction.

Axis convention: ("data", "tensor") — the data axis maps to DCN (hosts /
pod-slice replicas), the tensor axis to ICI neighbors so tensor-parallel
collectives ride the fast interconnect (SURVEY.md §2.8 TPU-native column).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, tensor: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, tensor) mesh from the first data*tensor devices.

    On real multi-host slices, jax.devices() is already ordered so that
    ICI-adjacent chips are contiguous; keeping `tensor` innermost puts
    tensor-parallel partners on ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = data * tensor
    if len(devices) < n:
        raise ValueError(f"mesh {data}x{tensor} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, tensor)
    return Mesh(arr, ("data", "tensor"))
