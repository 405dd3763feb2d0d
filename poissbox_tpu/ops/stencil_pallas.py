"""Pallas 7-point Laplacian — the explicitly tiled TPU stencil kernel.

The reference's hot loop applies the 7-point star per grid point inside KSP
(reference src/poissbox.f90:112-148). The GSPMD path (`ops.stencil.
apply_laplacian`) leaves fusion to XLA; this kernel pins the schedule:

  * grid over x-slabs of `tile_x` planes; each program reads its slab plus
    one neighbor plane on each side, fetched through two extra BlockSpecs
    whose index maps wrap periodically — the in-chip analogue of the halo
    exchange (reference src/poissbox.f90:104-105);
  * each block spans the full (y, z) extent, so y/z neighbor access is an
    in-VMEM `pltpu.roll` that IS the periodic boundary — no extra traffic;
  * z is innermost (lane axis, 128-wide), y the sublane axis; all seven
    taps fuse into one VMEM-resident pass: ~(tile_x + 2)/tile_x read
    amplification vs the speed-of-light single pass.

Requires the full (y, z) plane of the *local shard* to fit VMEM; for f32
that's comfortable up to 512x512 planes with tile_x >= 4.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lapl_kernel(prev_ref, cur_ref, next_ref, out_ref, *, invs):
    ivx, ivy, ivz = invs
    c = cur_ref[:]
    # x-neighbors: shift within the slab, boundary planes from the
    # periodic neighbor blocks
    xm = jnp.concatenate([prev_ref[:], c[:-1]], axis=0)
    xp = jnp.concatenate([c[1:], next_ref[:]], axis=0)
    # y/z-neighbors: block covers the full axis, so a circular roll is the
    # periodic boundary condition itself
    ym = pltpu.roll(c, 1, 1)
    yp = pltpu.roll(c, c.shape[1] - 1, 1)  # pltpu.roll wants shift >= 0
    zm = pltpu.roll(c, 1, 2)
    zp = pltpu.roll(c, c.shape[2] - 1, 2)
    out_ref[:] = (
        (xm + xp) * ivx
        + (ym + yp) * ivy
        + (zm + zp) * ivz
        - (2.0 * (ivx + ivy + ivz)) * c
    )


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x"))
def _apply(u: jax.Array, deltas, tile_x: int) -> jax.Array:
    nx, ny, nz = u.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    nblk = nx // tile_x
    kernel = functools.partial(_lapl_kernel, invs=invs)
    flops = 9 * nx * ny * nz
    bytes_acc = 2 * u.size * u.dtype.itemsize
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(nblk,),
        in_specs=[
            # single plane below the slab, periodic
            pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x - 1) % nx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # single plane above the slab, periodic
            pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x + tile_x) % nx, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=0),
    )(u, u, u)


def apply_laplacian_pallas(u: jax.Array, deltas: Sequence[float],
                           tile_x: int = 8) -> jax.Array:
    """Periodic 7-point Laplacian via the tiled Pallas kernel.

    Falls back tile size to a divisor of nx. Semantics identical to
    `ops.stencil.apply_laplacian` (cross-checked by tests the way the
    reference demo cross-checks its two operator paths,
    reference src/example.f90:235-261).
    """
    nx = u.shape[0]
    while nx % tile_x:
        tile_x //= 2
    return _apply(u, tuple(float(d) for d in deltas), max(tile_x, 1))
