"""Distributed execution: device meshes, sharding rules, sharded training.

TPU-native replacement for the reference's torch.distributed/DDP layer
(SURVEY.md §2.8): a `jax.sharding.Mesh` with ("data", "tensor") axes —
data-parallel over DCN/hosts, tensor-parallel over ICI — with XLA inserting
the collectives (psum/all-gather/reduce-scatter) from sharding annotations.
"""

from flasht5_tpu.parallel.mesh import make_mesh
from flasht5_tpu.parallel.sharding import param_pspecs, param_shardings
from flasht5_tpu.parallel.train_step import make_train_step, sharded_train_step

__all__ = [
    "make_mesh",
    "param_pspecs",
    "param_shardings",
    "make_train_step",
    "sharded_train_step",
]
