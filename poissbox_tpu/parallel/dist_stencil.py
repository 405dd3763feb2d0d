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
from jax import lax
from jax.sharding import PartitionSpec

from poissbox_tpu.ops.stencil import laplacian_local
from poissbox_tpu.parallel.halo import halo_pad_local


def _local_axis_names(grid) -> tuple:
    """Mesh axis name sharding each array dim (None where unsharded)."""
    spec = grid.spec
    names = list(spec) + [None] * (3 - len(spec))
    return tuple(names)


def apply_laplacian_sharded(u: jax.Array, grid, overlap: bool = False,
                            local_impl: str = "roll") -> jax.Array:
    """Periodic 7-point Laplacian of a sharded field via explicit halos.

    Requires `grid.mesh`. Each shard exchanges width-1 boundary planes with
    its (periodic) mesh neighbors and applies the star to the padded local
    block — one neighbor collective per sharded dim, no global reshuffle.

    overlap=True uses the correction formulation instead of padding: the
    dense *local-periodic* stencil (which depends only on the local block)
    is computed while the ppermutes are in flight, then the sharded faces
    are patched with `inv_d^2 * (halo_plane - wrapped_plane)`. XLA can
    schedule the collectives concurrently with the bulk compute — the
    halo/compute overlap of SURVEY.md §7 step 6. `local_impl='pallas'`
    runs the bulk pass through the per-device Pallas kernel.
    """
    if grid.mesh is None:
        return laplacian_local(jnp.pad(u, 1, mode="wrap"), grid.deltas)
    names = _local_axis_names(grid)
    spec = grid.spec
    mesh = grid.mesh
    deltas = grid.deltas

    if not overlap:
        @partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
        def _apply(block):
            padded = halo_pad_local(block, mesh, names, width=1)
            return laplacian_local(padded, deltas)

        return _apply(u)

    from poissbox_tpu.ops.stencil import apply_laplacian
    from poissbox_tpu.parallel.halo import _shift_perms

    @partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec)
    def _apply_overlap(block):
        # 1. issue the neighbor exchanges first (independent of the bulk)
        halos = {}
        for d in range(3):
            name = names[d]
            if name is None or mesh.shape[name] == 1:
                continue
            n = block.shape[d]
            lo = lax.slice_in_dim(block, 0, 1, axis=d)
            hi = lax.slice_in_dim(block, n - 1, n, axis=d)
            fwd, bwd = _shift_perms(mesh.shape[name])
            halos[d] = (lax.ppermute(hi, name, fwd),   # neighbor's last plane
                        lax.ppermute(lo, name, bwd))   # neighbor's first plane

        # 2. bulk: local-periodic stencil, overlappable with the permutes
        if local_impl == "pallas":
            from poissbox_tpu.ops.stencil_pallas import apply_laplacian_pallas
            out = apply_laplacian_pallas(block, deltas)
        else:
            out = apply_laplacian(block, deltas)

        # 3. patch the sharded faces: swap the wrapped plane for the halo
        for d, (left, right) in halos.items():
            inv = 1.0 / float(deltas[d]) ** 2
            n = block.shape[d]
            lo_idx = tuple(slice(0, 1) if i == d else slice(None) for i in range(3))
            hi_idx = tuple(slice(n - 1, n) if i == d else slice(None) for i in range(3))
            wrapped_last = lax.slice_in_dim(block, n - 1, n, axis=d)
            wrapped_first = lax.slice_in_dim(block, 0, 1, axis=d)
            out = out.at[lo_idx].add(inv * (left - wrapped_last))
            out = out.at[hi_idx].add(inv * (right - wrapped_first))
        return out

    return _apply_overlap(u)
