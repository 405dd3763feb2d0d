"""Distribution machinery: device-mesh decomposition and halo exchange.

Replaces the reference's MPI + PETSc DMDA layer (reference
src/poissbox.f90:183-204, halo exchange at 104-105) with
`jax.sharding` meshes, GSPMD auto-partitioning, and explicit
`shard_map` + `ppermute` halo paths for hand-tuned kernels.
"""

from poissbox_tpu.parallel.decomp import decompose_3d, owned_boxes
from poissbox_tpu.parallel.halo import halo_pad_local, halo_exchange_spec

__all__ = ["decompose_3d", "owned_boxes", "halo_pad_local", "halo_exchange_spec"]
