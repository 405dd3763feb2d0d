"""Pencil repartitioning for distributed line solves — the transpose method.

The compact schemes couple a whole grid line through a periodic tridiagonal
solve (reference src/compact_schemes.f90:197,312); the reference only ever
runs them on unsharded whole-domain arrays, serially over the n^2 pencils
(reference src/compact_schemes.f90:60-66). Distributing them is this
framework's "sequence parallelism" analogue (SURVEY.md §5.7), and the
namesake idea of the 2decomp/3decomp family the reference belongs to:
keep each solve line *device-local* by repartitioning the field between
sweeps — X-pencils -> Y-pencils -> Z-pencils — instead of parallelizing the
recurrence across devices.

TPU-native formulation: a pencil layout is just a `PartitionSpec` with the
solve dimension unsharded; the transpose is
`jax.lax.with_sharding_constraint` to that spec, which XLA lowers to the
minimal all-to-all over ICI. Mesh axes displaced from the solve dimension
ride along on the other dims, so total parallelism is conserved (a (px, py)
mesh keeps px*py-way sharding in every pencil orientation, exactly like
2decomp's 2-D processor grid).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec


def pencil_spec(grid, local_dim: int) -> PartitionSpec:
    """PartitionSpec with `local_dim` unsharded and every mesh axis kept.

    Mesh axes whose home dim is `local_dim` are appended to the next dim
    (cyclically), so e.g. a ('x','y') mesh over dims (0,1) gives
    X-pencils (local_dim=0) the spec (None, ('y','x'), None).
    """
    if grid.mesh is None:
        return PartitionSpec()
    home = list(grid.spec) + [None] * (3 - len(grid.spec))
    out: list[list[str]] = [[] for _ in range(3)]
    for d in range(3):
        entry = home[d]
        if entry is None:
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        target = d if d != local_dim else (d + 1) % 3
        if target == local_dim:  # single-dim corner case
            target = (d + 2) % 3
        out[target].extend(names)
    return PartitionSpec(*(
        None if not names else (names[0] if len(names) == 1 else tuple(names))
        for names in out
    ))


def to_pencil(f: jax.Array, grid, local_dim: int) -> jax.Array:
    """Repartition so lines along `local_dim` are device-local (the
    2decomp transpose; an all-to-all under GSPMD)."""
    if grid.mesh is None:
        return f
    spec = pencil_spec(grid, local_dim)
    return jax.lax.with_sharding_constraint(
        f, NamedSharding(grid.mesh, spec))


def from_pencil(f: jax.Array, grid) -> jax.Array:
    """Restore the grid's home sharding."""
    if grid.mesh is None:
        return f
    return jax.lax.with_sharding_constraint(
        f, NamedSharding(grid.mesh, grid.spec))


def apply_along_axis(op, f: jax.Array, grid, axis: int) -> jax.Array:
    """Run a line operator `op(f, axis=...)` with its axis device-local:
    transpose in, solve locally (pencils batched on the VPU), stay in
    pencil layout for the caller to chain further sweeps."""
    fp = to_pencil(f, grid, axis)
    return op(fp, axis)
