"""Distribution machinery: device-mesh decomposition and halo exchange.

Replaces the reference's MPI + PETSc DMDA layer (reference
src/poissbox.f90:183-204, halo exchange at 104-105) with
`jax.sharding` meshes, GSPMD auto-partitioning, and explicit
`shard_map` + `ppermute` halo paths for hand-tuned kernels.
"""

from poissbox_tpu.parallel.decomp import decompose_3d, dof_distribution, owned_boxes
from poissbox_tpu.parallel.halo import halo_exchange_spec, halo_pad_local
from poissbox_tpu.parallel.dist_stencil import apply_laplacian_sharded
from poissbox_tpu.parallel.pencil import from_pencil, pencil_spec, to_pencil

__all__ = ["decompose_3d", "dof_distribution", "owned_boxes",
           "halo_pad_local", "halo_exchange_spec", "apply_laplacian_sharded",
           "pencil_spec", "to_pencil", "from_pencil"]
