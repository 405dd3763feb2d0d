"""Explicitly distributed stencil application — shard_map + ppermute halos.

The production path lets GSPMD partition `jnp.roll` stencils automatically
(:mod:`poissbox_tpu.ops.stencil`). This module is the *explicit* halo-exchange
formulation — the direct analogue of the reference's
`DMGetLocalVector` + `DMGlobalToLocal` + owned-box loop
(reference src/poissbox.f90:104-126): each device pads its local block with
neighbor planes via `lax.ppermute` over the mesh (ICI), then applies the
stencil to the padded block. Used where manual scheduling beats GSPMD
(halo/compute overlap, per-device Pallas kernels) and as an independent
implementation for cross-checking, the way the reference demo cross-checks
its matrix-free and assembled operators (reference src/example.f90:235-261).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

from poissbox_tpu.ops.stencil import laplacian_local
from poissbox_tpu.parallel.halo import halo_pad_local


def _local_axis_names(grid) -> tuple:
    """Mesh axis name sharding each array dim (None where unsharded)."""
    spec = grid.spec
    names = list(spec) + [None] * (3 - len(spec))
    return tuple(names)


def apply_laplacian_sharded(u: jax.Array, grid) -> jax.Array:
    """Periodic 7-point Laplacian of a sharded field via explicit halos.

    Requires `grid.mesh`. Each shard exchanges width-1 boundary planes with
    its (periodic) mesh neighbors and applies the star to the padded local
    block — one neighbor collective per sharded dim, no global reshuffle.
    """
    if grid.mesh is None:
        return laplacian_local(jnp.pad(u, 1, mode="wrap"), grid.deltas)
    names = _local_axis_names(grid)
    spec = grid.spec

    @partial(jax.shard_map, mesh=grid.mesh, in_specs=spec, out_specs=spec)
    def _apply(block):
        padded = halo_pad_local(block, grid.mesh, names, width=1)
        return laplacian_local(padded, grid.deltas)

    return _apply(u)
