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


def _star_into(out_ref, prev_ref, cur_ref, next_ref, invs):
    """Accumulate the 7-point star into out_ref, one neighbor pair per
    statement so Mosaic can retire each shifted temporary before the next —
    peak VMEM stays ~(slab + 2 temps) instead of 7 simultaneous copies
    (which blows the budget at 512^2 plane sizes)."""
    ivx, ivy, ivz = invs
    c = cur_ref[:]
    # x-neighbors: shift within the slab, boundary planes from the
    # periodic neighbor blocks (single-plane slabs use the halos directly —
    # zero-size concat operands are rejected by Mosaic)
    if c.shape[0] > 1:
        xm = jnp.concatenate([prev_ref[:], c[:-1]], axis=0)
        xp = jnp.concatenate([c[1:], next_ref[:]], axis=0)
    else:
        xm, xp = prev_ref[:], next_ref[:]
    out_ref[:] = (xm + xp) * ivx
    # y/z-neighbors: block covers the full axis, so a circular roll is the
    # periodic boundary condition itself (pltpu.roll wants shift >= 0)
    out_ref[:] = out_ref[:] + (
        pltpu.roll(c, 1, 1) + pltpu.roll(c, c.shape[1] - 1, 1)) * ivy
    out_ref[:] = out_ref[:] + (
        pltpu.roll(c, 1, 2) + pltpu.roll(c, c.shape[2] - 1, 2)) * ivz
    out_ref[:] = out_ref[:] - (2.0 * (ivx + ivy + ivz)) * c


def _lapl_kernel(prev_ref, cur_ref, next_ref, out_ref, *, invs):
    _star_into(out_ref, prev_ref, cur_ref, next_ref, invs)


def _residual_kernel(prev_ref, cur_ref, next_ref, b_ref, out_ref, *, invs):
    """out = b - A x, one fused pass."""
    _star_into(out_ref, prev_ref, cur_ref, next_ref, invs)
    out_ref[:] = b_ref[:] - out_ref[:]


def _jacobi_kernel(prev_ref, cur_ref, next_ref, b_ref, out_ref, *,
                   invs, winv_diag):
    """Damped Jacobi sweep: out = x + (w/diag) * (b - A x), fused."""
    _star_into(out_ref, prev_ref, cur_ref, next_ref, invs)
    out_ref[:] = cur_ref[:] + winv_diag * (b_ref[:] - out_ref[:])


def _sor_kernel(prev_ref, cur_ref, next_ref, b_ref, out_ref, *,
                invs, winv_diag, color, tile_x):
    """One red-black SOR color update, fused: out = x + mask*(w/diag)*r
    with mask = [(i + j + k) % 2 == color], i global."""
    shape = cur_ref.shape
    _star_into(out_ref, prev_ref, cur_ref, next_ref, invs)
    out_ref[:] = winv_diag * (b_ref[:] - out_ref[:])
    i0 = pl.program_id(0) * tile_x
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i0
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    mask = ((ii + jj + kk) % 2) == color
    out_ref[:] = cur_ref[:] + jnp.where(mask, out_ref[:], 0.0)


def _sor_rb_kernel(prev2_ref, cur_ref, next2_ref, bp_ref, b_ref, bn_ref,
                   out_ref, *, invs, winv_diag, colors, tile_x):
    """Both red-black colors in ONE pass via the wide-halo trick: the block
    carries 2 x-halo planes per side, the first color is updated on the
    extended region (T+2 planes, redundantly recomputing the halo planes
    the neighbor block also owns), and the second color then has the
    updated first-color values it needs entirely in VMEM. Traffic
    ~(3T+6)/T planes vs 6T for two separate color kernels."""
    ivx, ivy, ivz = invs
    T = cur_ref.shape[0]
    ny, nz = cur_ref.shape[1], cur_ref.shape[2]

    def star(xe):
        # xe: (m+2) planes -> star on the m interior planes
        c = xe[1:-1]
        s = (xe[:-2] + xe[2:]) * ivx
        s = s + (pltpu.roll(c, 1, 1) + pltpu.roll(c, ny - 1, 1)) * ivy
        s = s + (pltpu.roll(c, 1, 2) + pltpu.roll(c, nz - 1, 2)) * ivz
        return s - (2.0 * (ivx + ivy + ivz)) * c

    def parity_mask(nplanes, i_start):
        ii = jax.lax.broadcasted_iota(jnp.int32, (nplanes, ny, nz), 0) + i_start
        jj = jax.lax.broadcasted_iota(jnp.int32, (nplanes, ny, nz), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (nplanes, ny, nz), 2)
        return (ii + jj + kk) % 2

    i0 = pl.program_id(0) * tile_x
    xe = jnp.concatenate([prev2_ref[:], cur_ref[:], next2_ref[:]], axis=0)
    be = jnp.concatenate([bp_ref[:], b_ref[:], bn_ref[:]], axis=0)

    # first color on the extended region: planes i0-1 .. i0+T (T+2 of them)
    r1 = be - star(xe)
    m1 = (parity_mask(T + 2, i0 - 1) == colors[0]).astype(xe.dtype)
    x1 = xe[1:-1] + (winv_diag * m1) * r1

    # second color on the interior T planes
    r2 = b_ref[:] - star(x1)
    m2 = (parity_mask(T, i0) == colors[1]).astype(xe.dtype)
    out_ref[:] = x1[1:-1] + (winv_diag * m2) * r2


def _launch(kernel, u: jax.Array, tile_x: int, extra=()):
    """Launch a halo-extended slab kernel: inputs are (prev-plane, slab,
    next-plane) views of u plus optional same-slab extras (e.g. b)."""
    nx, ny, nz = u.shape
    slab = lambda: pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    plane = lambda off: pl.BlockSpec(
        (1, ny, nz), lambda i: ((i * tile_x + off) % nx, 0, 0),
        memory_space=pltpu.VMEM)
    n_in = 3 + len(extra)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(nx // tile_x,),
        in_specs=[plane(-1), slab(), plane(tile_x)] + [slab()] * len(extra),
        out_specs=slab(),
        cost_estimate=pl.CostEstimate(
            flops=9 * u.size, bytes_accessed=n_in * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(u, u, u, *extra)


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x"))
def _apply(u: jax.Array, deltas, tile_x: int) -> jax.Array:
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    return _launch(functools.partial(_lapl_kernel, invs=invs), u, tile_x)


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x"))
def _residual(u, b, deltas, tile_x):
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    return _launch(functools.partial(_residual_kernel, invs=invs), u, tile_x,
                   extra=(b,))


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x", "weight"))
def _jacobi(u, b, deltas, weight, tile_x):
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    return _launch(
        functools.partial(_jacobi_kernel, invs=invs, winv_diag=winv),
        u, tile_x, extra=(b,))


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x", "weight",
                                             "reverse"))
def _sor_rb(u, b, deltas, weight, reverse, tile_x):
    """One full red-black sweep (both colors) in a single kernel pass."""
    nx, ny, nz = u.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    colors = (1, 0) if reverse else (0, 1)
    kernel = functools.partial(_sor_rb_kernel, invs=invs, winv_diag=winv,
                               colors=colors, tile_x=tile_x)
    vm = pltpu.VMEM
    half = tile_x // 2
    nxb = nx // 2  # block-index space for 2-plane blocks
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(nx // tile_x,),
        in_specs=[
            # x, with two halo planes each side (2-plane block units)
            pl.BlockSpec((2, ny, nz), lambda i: ((i * half - 1) % nxb, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((2, ny, nz), lambda i: (((i + 1) * half) % nxb, 0, 0),
                         memory_space=vm),
            # b, with one halo plane each side
            pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x - 1) % nx, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x + tile_x) % nx, 0, 0),
                         memory_space=vm),
        ],
        out_specs=pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                               memory_space=vm),
        cost_estimate=pl.CostEstimate(
            flops=20 * u.size, bytes_accessed=3 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(u, u, u, b, b, b)


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x", "weight",
                                             "color"))
def _sor(u, b, deltas, weight, color, tile_x):
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    return _launch(
        functools.partial(_sor_kernel, invs=invs, winv_diag=winv,
                          color=color, tile_x=tile_x),
        u, tile_x, extra=(b,))


def _pick_tile(u: jax.Array, tile_x: int) -> int:
    nx, ny, nz = u.shape
    while nx % tile_x:
        tile_x //= 2
    # Empirical VMEM rule (Mosaic's real peak is dominated by the
    # halo-extended input block plus its shifted temporaries, all double-
    # buffered): (tile+2) planes must stay under ~3 MB. Anchors: 256^3 f32
    # tile 8 fits / tile 16 OOMs; 512^3 tile 2 OOMs.
    plane = ny * nz * u.dtype.itemsize
    while tile_x > 1 and (tile_x + 2) * plane > 3 * 2**20:
        tile_x //= 2
    return max(tile_x, 1)


def apply_laplacian_pallas(u: jax.Array, deltas: Sequence[float],
                           tile_x: int = 8) -> jax.Array:
    """Periodic 7-point Laplacian via the tiled Pallas kernel.

    Falls back tile size to a divisor of nx. Semantics identical to
    `ops.stencil.apply_laplacian` (cross-checked by tests the way the
    reference demo cross-checks its two operator paths,
    reference src/example.f90:235-261).
    """
    return _apply(u, tuple(float(d) for d in deltas), _pick_tile(u, tile_x))


def residual_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                    tile_x: int = 8) -> jax.Array:
    """Fused residual r = b - A u (3 HBM passes instead of 5)."""
    return _residual(u, b, tuple(float(d) for d in deltas),
                     _pick_tile(u, tile_x))


def jacobi_sweep_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                        weight: float, tile_x: int = 8) -> jax.Array:
    """Fused damped-Jacobi smoother sweep u + (w/diag)(b - A u) — the MG
    level smoother as one memory pass over (u, b, out)."""
    return _jacobi(u, b, tuple(float(d) for d in deltas), float(weight),
                   _pick_tile(u, tile_x))


def sor_sweep_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                     weight: float, color: int, tile_x: int = 8) -> jax.Array:
    """Fused red-black SOR color update (color 0 = red, (i+j+k) even)."""
    return _sor(u, b, tuple(float(d) for d in deltas), float(weight),
                int(color), _pick_tile(u, tile_x))


def sor_rb_sweep_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                        weight: float, reverse: bool = False,
                        tile_x: int = 8) -> jax.Array:
    """One complete red-black SOR sweep (both colors, reversed order when
    `reverse`) as a single wide-halo kernel pass — ~half the HBM traffic of
    two color updates. Requires an even slab tile; falls back to two color
    kernels when the tile degenerates to 1 plane (large-plane grids)."""
    # This kernel holds x (T+4 planes), b (T+2) and several extended
    # temporaries at once — budget much tighter than the plain stencil's:
    # (T+4) planes <= 2 MB (anchor: T=8 at 256^2 planes OOMs at 19 MB).
    nx, ny, nz = u.shape
    plane = ny * nz * u.dtype.itemsize
    t = tile_x
    while t > 1 and ((t + 4) * plane > 2 * 2**20 or nx % t):
        t //= 2
    if t < 2:
        first, second = (1, 0) if reverse else (0, 1)
        u = sor_sweep_pallas(u, b, deltas, weight, first, tile_x)
        return sor_sweep_pallas(u, b, deltas, weight, second, tile_x)
    return _sor_rb(u, b, tuple(float(d) for d in deltas), float(weight),
                   bool(reverse), t)
