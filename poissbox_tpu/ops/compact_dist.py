"""Distributed compact-scheme operators — pencil-transposed sweeps.

Same numerics as :mod:`poissbox_tpu.ops.compact` (6th-order staggered
periodic schemes, reference src/compact_schemes.f90), with each directional
sweep executed in the pencil layout that makes its tridiagonal lines
device-local (parallel.pencil — the 2decomp transpose method, this
framework's sequence-parallel path). Sweep orders follow the reference
(`grad` Z->Y->X, src/compact_schemes.f90:42-88; `div` X->Y->Z, :207-257),
which is exactly one pencil transpose per sweep; outputs are restored to
the grid's home sharding.

On an unsharded grid every transpose is the identity and these functions
reduce to the serial operators (tests assert bit-equality of the two paths
on a multi-device mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from poissbox_tpu.ops import compact
from poissbox_tpu.parallel.pencil import from_pencil, to_pencil

Array = jax.Array


def grad(f: Array, grid) -> Array:
    """Distributed staggered gradient tensor (nx, ny, nz, 3) of a
    cell-centered sharded field."""
    dx, dy, dz = grid.deltas
    # Z sweep (Z-pencils)
    fz = to_pencil(f, grid, 2)
    fz_i = compact.interp_1d(fz, axis=2)
    fz_d = compact.grad_1d(fz, dz, axis=2)
    # Y sweep (Y-pencils)
    fz_i = to_pencil(fz_i, grid, 1)
    fz_d = to_pencil(fz_d, grid, 1)
    c1 = compact.interp_1d(fz_i, axis=1)
    c2 = compact.grad_1d(fz_i, dy, axis=1)
    c3 = compact.interp_1d(fz_d, axis=1)
    # X sweep (X-pencils)
    c1, c2, c3 = (to_pencil(c, grid, 0) for c in (c1, c2, c3))
    g1 = compact.grad_1d(c1, dx, axis=0)
    g2 = compact.interp_1d(c2, axis=0)
    g3 = compact.interp_1d(c3, axis=0)
    return jnp.stack([from_pencil(g, grid) for g in (g1, g2, g3)], axis=-1)


def div(F: Array, grid) -> Array:
    """Distributed divergence of a vertex-located (nx, ny, nz, 3) field."""
    dx, dy, dz = grid.deltas
    # X sweep (X-pencils)
    e1 = compact.div_1d(to_pencil(F[..., 0], grid, 0), dx, axis=0)
    e2 = compact.interp_1d_div(to_pencil(F[..., 1], grid, 0), axis=0)
    e3 = compact.interp_1d_div(to_pencil(F[..., 2], grid, 0), axis=0)
    # Y sweep (Y-pencils)
    f1 = compact.interp_1d_div(to_pencil(e1, grid, 1), axis=1)
    f2 = compact.div_1d(to_pencil(e2, grid, 1), dy, axis=1)
    f3 = compact.interp_1d_div(to_pencil(e3, grid, 1), axis=1)
    # Z sweep (Z-pencils)
    s12 = to_pencil(f1 + f2, grid, 2)
    f3 = to_pencil(f3, grid, 2)
    out = compact.interp_1d_div(s12, axis=2) + compact.div_1d(f3, dz, axis=2)
    return from_pencil(out, grid)


def lapl(f: Array, grid) -> Array:
    """Distributed 6th-order compact Laplacian div(grad(f))
    (reference src/compact_schemes.f90:17-37)."""
    return div(grad(f, grid), grid)


def interp(f: Array, grid, stagger: int = -1) -> Array:
    """Distributed tri-directional interpolation, Z->Y->X (reference
    src/compact_schemes.f90:93-142)."""
    out = compact.interp_1d(to_pencil(f, grid, 2), stagger=stagger, axis=2)
    out = compact.interp_1d(to_pencil(out, grid, 1), stagger=stagger, axis=1)
    out = compact.interp_1d(to_pencil(out, grid, 0), stagger=stagger, axis=0)
    return from_pencil(out, grid)
