"""Pallas 7-point Laplacian — the explicitly tiled TPU stencil kernels.

The reference's hot loop applies the 7-point star per grid point inside KSP
(reference src/poissbox.f90:112-148). The GSPMD path (`ops.stencil.
apply_laplacian`) leaves fusion to XLA; these kernels pin the schedule:

  * 2-D grid over (x-slab, y-panel) blocks of (TX, TY, nz); periodic x and
    y neighbor planes/rows arrive through extra BlockSpecs whose index maps
    wrap — the in-chip analogue of the halo exchange (reference
    src/poissbox.f90:104-105); z neighbors are in-VMEM rolls (blocks span
    the full z extent);
  * z is innermost (lane axis), y the sublane axis; all seven taps plus the
    optional residual/smoother update fuse into one VMEM-resident pass with
    read amplification ~(1 + 2/TX + 2/TY);
  * block sizes adapt to the plane size so 512^2+ planes tile on y instead
    of degrading to single-plane x-slabs.

The smoother kernels additionally fuse the Jacobi / red-black-SOR update,
and `_sor_rb_kernel` runs both colors in one pass via the wide-halo trick.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _pm1_sum(c, axis):
    """c shifted +1 plus c shifted -1 with periodic wrap along `axis`
    (the y/z neighbor-pair sum of the 7-point star, computed in-VMEM).

    pltpu.roll lowers to tpu.dynamic_rotate, which Mosaic implements only
    for 32-bit element types; bf16 cycle sweeps take the slice+concat form
    instead (same values, marginally more VMEM movement).
    """
    if c.dtype.itemsize == 4:
        n = c.shape[axis]
        return (pltpu.roll(c, jnp.int32(1), axis)
                + pltpu.roll(c, jnp.int32(n - 1), axis))
    last = [slice(None)] * c.ndim
    last[axis] = slice(-1, None)
    head = [slice(None)] * c.ndim
    head[axis] = slice(None, -1)
    plus = jnp.concatenate([c[tuple(last)], c[tuple(head)]], axis=axis)
    first = [slice(None)] * c.ndim
    first[axis] = slice(None, 1)
    tail = [slice(None)] * c.ndim
    tail[axis] = slice(1, None)
    minus = jnp.concatenate([c[tuple(tail)], c[tuple(first)]], axis=axis)
    return plus + minus


def _star_ext(xe, invs):
    """7-point star on the interior planes of a halo-extended slab
    (1 x-halo plane each side; y/z periodic via in-VMEM rotates — the
    block spans the full y, z axes)."""
    ivx, ivy, ivz = invs
    c = xe[1:-1]
    if ivx == ivy == ivz:
        # cubic cells (the common case): scale the 6-neighbor sum once —
        # two fewer field-wide multiplies matters because the RB smoother
        # kernels are VPU-bound, not bandwidth-bound, at 512^3
        s = (xe[:-2] + xe[2:]) + _pm1_sum(c, 1) + _pm1_sum(c, 2)
        return s * ivx - (6.0 * ivx) * c
    s = (xe[:-2] + xe[2:]) * ivx
    s = s + _pm1_sum(c, 1) * ivy
    s = s + _pm1_sum(c, 2) * ivz
    return s - (2.0 * (ivx + ivy + ivz)) * c


def _star_into(out_ref, cur_ref, invs, xm_ref, xp_ref,
               ym_ref=None, yp_ref=None):
    """Accumulate the 7-point star into out_ref, one neighbor pair per
    statement so Mosaic can retire each shifted temporary before the next
    (peak VMEM ~ slab + 2 temps, not 7 simultaneous copies).

    ym_ref/yp_ref None => the block spans the full y axis and an in-VMEM
    roll IS the periodic boundary; otherwise they are 8-row halo slabs
    (TPU sublane blocks must be multiples of 8) whose boundary row is used.
    """
    ivx, ivy, ivz = invs
    c = cur_ref[:]
    # x-neighbors: shift within the slab + boundary planes from the
    # periodic neighbor blocks (zero-size concat operands are rejected by
    # Mosaic, hence the single-plane guards)
    if c.shape[0] > 1:
        xm = jnp.concatenate([xm_ref[:], c[:-1]], axis=0)
        xp = jnp.concatenate([c[1:], xp_ref[:]], axis=0)
    else:
        xm, xp = xm_ref[:], xp_ref[:]
    acc = (xm + xp) * ivx
    if ym_ref is None:
        acc = acc + _pm1_sum(c, 1) * ivy
    else:
        if c.shape[1] > 1:
            ym = jnp.concatenate([ym_ref[:, -1:], c[:, :-1]], axis=1)
            yp = jnp.concatenate([c[:, 1:], yp_ref[:, :1]], axis=1)
        else:
            ym, yp = ym_ref[:, -1:], yp_ref[:, :1]
        acc = acc + (ym + yp) * ivy
    # z-neighbors: block covers the full axis — a circular roll IS the
    # periodic boundary
    acc = acc + _pm1_sum(c, 2) * ivz
    out_ref[:] = acc - (2.0 * (ivx + ivy + ivz)) * c


def _parity(shape, i0, j0):
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i0
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + j0
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return (ii + jj + kk) % 2


def _color_weight(par, color, winv, dtype):
    """Masked per-color weight field winv * (parity == color).

    f32 uses the obvious select. Narrow dtypes use the arithmetic form
    1 - (par + color) % 2 converted as a VALUE: Mosaic cannot relayout an
    i1 mask from the 32-bit (8, 128) tiling of the iota compare to the
    (16, 128) tiling a bf16 select needs ("Invalid relayout ... i1"),
    while an i32->bf16 convert is a plain supported cast."""
    dt = jnp.dtype(dtype)
    if dt.itemsize == 4:
        return jnp.where(par == color, dt.type(winv), dt.type(0.0))
    sel = 1 - ((par + color) % 2)
    return sel.astype(dt) * dt.type(winv)


def _rb_halfstep(xe, be_c, w, invs):
    """One masked SOR half-step on the interior planes of a halo-extended
    slab: c + w * (be_c - star(xe)), where `w` is the per-color masked
    weight field winv*(parity==color) — precomputed once per slab so the
    per-step compare+convert+scale disappears. For isotropic cells the
    star's scalar factors fold into the residual (one fewer field-wide
    mul+sub); these RB kernels are VPU-bound, not bandwidth-bound."""
    ivx, ivy, ivz = invs
    c = xe[1:-1]
    if ivx == ivy == ivz:
        s = (xe[:-2] + xe[2:]) + _pm1_sum(c, 1) + _pm1_sum(c, 2)
        return c + w * ((be_c - ivx * s) + (6.0 * ivx) * c)
    return c + w * (be_c - _star_ext(xe, invs))


def _make_kernel(update, full_y, **kw):
    """Build a pallas kernel: star evaluation (full-y 3-input or paneled
    5-input halo scheme) followed by `update(out_ref, cur_ref, extras)`."""
    if full_y:
        def kernel(xm, cur, xp, *rest):
            *extras, out_ref = rest
            _star_into(out_ref, cur, kw["invs"], xm, xp)
            update(out_ref, cur, extras, kw)
    else:
        def kernel(xm, ym, cur, yp, xp, *rest):
            *extras, out_ref = rest
            _star_into(out_ref, cur, kw["invs"], xm, xp, ym, yp)
            update(out_ref, cur, extras, kw)
    return kernel


def _upd_lapl(out_ref, cur, extras, kw):
    pass


def _upd_residual(out_ref, cur, extras, kw):
    out_ref[:] = extras[0][:] - out_ref[:]


def _upd_jacobi(out_ref, cur, extras, kw):
    out_ref[:] = cur[:] + kw["winv_diag"] * (extras[0][:] - out_ref[:])


def _upd_sor(out_ref, cur, extras, kw):
    out_ref[:] = kw["winv_diag"] * (extras[0][:] - out_ref[:])
    mask = _parity(cur.shape, pl.program_id(0) * kw["tx"],
                   pl.program_id(1) * kw["ty"]) == kw["color"]
    out_ref[:] = cur[:] + jnp.where(mask, out_ref[:], 0.0)


def _sor_rb_kernel(prev2_ref, cur_ref, next2_ref, bp_ref, b_ref, bn_ref,
                   out_ref, *part_refs, invs, winv_diag, colors, tile_x):
    """Both red-black colors in ONE pass via the wide-halo trick (x-slab
    scheme, full (y, z) planes): the block carries 2 x-halo planes per
    side, the first color is updated on the extended region (T+2 planes,
    redundantly recomputing the halo planes the neighbor block also owns),
    and the second color then has the updated first-color values it needs
    entirely in VMEM. Traffic ~(3T+6)/T planes vs 6T for two separate
    color kernels."""
    T = cur_ref.shape[0]
    ny, nz = cur_ref.shape[1], cur_ref.shape[2]
    i0 = pl.program_id(0) * tile_x
    xe = jnp.concatenate([prev2_ref[:], cur_ref[:], next2_ref[:]], axis=0)
    be = jnp.concatenate([bp_ref[:], b_ref[:], bn_ref[:]], axis=0)

    # first color on the extended region: planes i0-1 .. i0+T (T+2 of
    # them); the masked per-color weights are computed once and sliced for
    # the second color (per-step iota+mod+compare+convert was a measurable
    # VPU cost)
    par = _parity((T + 2, ny, nz), i0 - 1, 0)
    dt = xe.dtype.type
    w1 = _color_weight(par, colors[0], winv_diag, xe.dtype)
    x1 = _rb_halfstep(xe, be, w1, invs)

    # second color on the interior T planes
    out_ref[:] = _rb_halfstep(x1, b_ref[:], (dt(winv_diag) - w1)[1:-1], invs)
    if part_refs:
        # coupling-reduction partials <x_out, b>, sum(x_out) per block —
        # the dots variant (used as the V-cycle's final post-smooth)
        _part00(part_refs[0], jnp.sum(out_ref[:] * b_ref[:]))
        _part00(part_refs[1], jnp.sum(out_ref[:]))


# ---------------------------------------------------------------------------
# launchers
# ---------------------------------------------------------------------------

def _pick_tiles(u: jax.Array, prefer4: bool = True) -> tuple[int, int]:
    """(TX, TY) for the stencil/smoother kernels.

    Prefer the full-y (3-input, y-rolls) scheme — cheapest halo traffic —
    while the halo-extended block (TX+2)*ny*nz fits its budget (anchors,
    f32: 256^3 (8, full) fits; (16, full) OOMs; 512^3 (2, full) OOMs).
    For the read-dominated kernels (plain apply, matvec+dot) TX=4 beats
    TX=8 despite the higher nominal read amplification (measured 256^3:
    89.5 vs 84.2 GDoF/s apply, 0.184 vs 0.207 ms matvec+dot — the smaller
    block double-buffers better against the 2.8 MB budget); the 3-stream
    jacobi sweep measured 7% the other way, so it passes prefer4=False.
    Otherwise tile y into panels with 8-row halo slabs under a tighter
    budget (anchor: 512^3 (8, 64) fits)."""
    nx, ny, nz = u.shape
    row = nz * u.dtype.itemsize
    tx = 8
    while tx > 1 and nx % tx:
        tx //= 2
    # full-y scheme
    full_budget = int(2.8 * 2**20)
    if prefer4 and (4 + 2) * ny * row <= full_budget and nx % 4 == 0:
        return 4, ny
    if (tx + 2) * ny * row <= full_budget:
        return tx, ny
    # paneled scheme; panel height floor = the sublane slab size
    slab = 16 if u.dtype.itemsize < 4 else 8
    ty = ny
    while (tx + 2) * (ty + 2) * row > 2 * 2**20:
        if ty > slab:
            ty //= 2
            while ny % ty and ty > 1:
                ty //= 2
        elif tx > 1:
            tx //= 2
        else:
            break
    return max(tx, 1), max(ty, slab if ny % slab == 0 else 1)


def _scoped_vmem(in_specs, out_specs, itemsize: int,
                 factor: float = 6.0, est_factor: float = 2.25) -> dict:
    """Tightest-sufficient `compiler_params` for a kernel's VMEM stack.

    The scoped-vmem limit is a reservation carved out of the same physical
    VMEM the automatic pipeline uses for its prefetch buffers, so an
    oversized limit starves the pipeline: a blanket 100 MB measurably
    halved the plain stencil kernel (0.20 -> 0.45 ms per 256^3 apply).
    Policy: stay at the 16 MB default whenever an `est_factor`x stack
    estimate of the single-step block bytes fits (measured stack/block
    ratios: 1.46x for the fused residual+restrict at 256^3, 2.0-3.6x for
    the zero-guess RB, which keeps halo-extended temporaries live);
    otherwise reserve a deliberately roomy `factor` (capped at 100 MB),
    because Mosaic's scheduler *inflates* its stack toward whatever limit
    it is given (observed 36.0M at a 28.8M limit, 63.6M at 40.5M, 40.5M
    at 36M across these kernels), so near-fit limits always fail."""
    specs = list(in_specs) + list(out_specs)
    bb = sum(int(np.prod(s.block_shape)) for s in specs
             if s.block_shape is not None) * itemsize
    if itemsize < 4:
        # narrow dtypes shift via slice+concat (tpu.dynamic_rotate is
        # 32-bit-only), which keeps full-size temporaries live that the
        # rotate form doesn't — the bf16 stencil stack measures ~2x the
        # f32 estimate (observed: 22.4M on a 16M limit at 320^3 bf16)
        est_factor *= 2.0
        factor *= 2.0
    if int(est_factor * bb) <= 16 * 2**20:  # stack estimate fits the default
        return {}
    need = min(int(factor * bb), 100 * 2**20)
    return {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=need)}


def _launch(update, u: jax.Array, tiles, invs, extra=(), vmem_est=2.25,
            **kw):
    """Launch a stencil kernel over (x-slab, y-panel) blocks; full-y tiles
    use the cheaper 3-input scheme with in-VMEM y rolls. `vmem_est` is the
    stack/block ratio handed to _scoped_vmem (the masked SOR update keeps
    a parity+weight temporary pair live and measured 16.32M of stack on
    15.x M of blocks at 320^3 panels — it passes a higher estimate)."""
    nx, ny, nz = u.shape
    tx, ty = tiles
    full_y = ty == ny
    vm = pltpu.VMEM
    kernel = _make_kernel(update, full_y, invs=invs, tx=tx, ty=ty, **kw)
    blk = lambda: pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                               memory_space=vm)
    xplane = lambda off: pl.BlockSpec(
        (1, ty, nz), lambda i, j: ((i * tx + off) % nx, j, 0),
        memory_space=vm)
    if full_y:
        in_specs = [xplane(-1), blk(), xplane(tx)]
        args = (u, u, u)
    else:
        # y-halo slabs sized to the sublane multiple (8 rows for 4-byte
        # dtypes, 16 for bf16); only the boundary row of the slab is used
        slab = 16 if u.dtype.itemsize < 4 else 8
        nyb, tyb = ny // slab, ty // slab
        ym_spec = pl.BlockSpec((tx, slab, nz),
                               lambda i, j: (i, (j * tyb - 1) % nyb, 0),
                               memory_space=vm)
        yp_spec = pl.BlockSpec((tx, slab, nz),
                               lambda i, j: (i, ((j + 1) * tyb) % nyb, 0),
                               memory_space=vm)
        in_specs = [xplane(-1), ym_spec, blk(), yp_spec, xplane(tx)]
        args = (u, u, u, u, u)
    n_in = len(in_specs) + len(extra)
    all_in = in_specs + [blk()] * len(extra)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(nx // tx, ny // ty),
        in_specs=all_in,
        out_specs=blk(),
        cost_estimate=pl.CostEstimate(
            flops=9 * u.size, bytes_accessed=n_in * u.size * u.dtype.itemsize,
            transcendentals=0),
        **_scoped_vmem(all_in, [blk()], u.dtype.itemsize,
                       est_factor=vmem_est),
        interpret=jax.default_backend() != "tpu",
    )(*args, *extra)


@functools.partial(jax.jit, static_argnames=("deltas", "tiles"))
def _apply(u: jax.Array, deltas, tiles) -> jax.Array:
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    return _launch(_upd_lapl, u, tiles, invs)


def _lapl_dot_kernel_fy(xm, cur, xp, out_ref, part_ref, *, invs):
    """Fused matvec + partial dot: out = A u, part = sum(u * A u) over the
    block. Each program owns an (8, 128) partials tile (the minimum VMEM
    block — SMEM scalar grid-outputs are rejected by the TPU lowering)
    with the partial in slot [0, 0]; the caller sums the tiny array —
    dot(p, Ap) costs no extra HBM pass over the fields."""
    _star_into(out_ref, cur, invs, xm, xp)
    p = jnp.sum(cur[:] * out_ref[:])
    # place the scalar in slot [0, 0] via a mask (in-kernel .at[].set lowers
    # to an unsupported scatter)
    ii = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape, 1)
    part_ref[:] = jnp.where((ii == 0) & (jj == 0), p, 0.0).astype(part_ref.dtype)


@functools.partial(jax.jit, static_argnames=("deltas", "tiles"))
def _apply_dot(u, deltas, tiles):
    nx, ny, nz = u.shape
    tx, ty = tiles
    gi, gj = nx // tx, ny // ty
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    vm = pltpu.VMEM
    blk = pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0), memory_space=vm)
    xplane = lambda off: pl.BlockSpec(
        (1, ty, nz), lambda i, j: ((i * tx + off) % nx, j, 0),
        memory_space=vm)
    out, parts = pl.pallas_call(
        functools.partial(_lapl_dot_kernel_fy, invs=invs),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((gi * 8, gj * 128), u.dtype)),
        grid=(gi, gj),
        in_specs=[xplane(-1), blk, xplane(tx)],
        out_specs=(blk, pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                     memory_space=vm)),
        **_scoped_vmem([xplane(-1), blk, xplane(tx)], [blk],
                       u.dtype.itemsize),
        cost_estimate=pl.CostEstimate(
            flops=11 * u.size, bytes_accessed=2 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(u, u, u)
    return out, jnp.sum(parts)


def _lapl_dot_kernel_pan(xm, ym, cur, yp, xp, out_ref, part_ref, *, invs):
    """Paneled-scheme variant of the fused matvec + partial dot (y tiled
    with 8-row halo slabs; large-plane grids where full-y blocks exceed
    VMEM)."""
    _star_into(out_ref, cur, invs, xm, xp, ym, yp)
    p = jnp.sum(cur[:] * out_ref[:])
    ii = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape, 1)
    part_ref[:] = jnp.where((ii == 0) & (jj == 0), p, 0.0).astype(part_ref.dtype)


@functools.partial(jax.jit, static_argnames=("deltas", "tiles"))
def _apply_dot_pan(u, deltas, tiles):
    nx, ny, nz = u.shape
    tx, ty = tiles
    gi, gj = nx // tx, ny // ty
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    vm = pltpu.VMEM
    blk = pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0), memory_space=vm)
    xplane = lambda off: pl.BlockSpec(
        (1, ty, nz), lambda i, j: ((i * tx + off) % nx, j, 0),
        memory_space=vm)
    slab = 16 if u.dtype.itemsize < 4 else 8
    nyb, tyb = ny // slab, ty // slab
    ym_spec = pl.BlockSpec((tx, slab, nz),
                           lambda i, j: (i, (j * tyb - 1) % nyb, 0),
                           memory_space=vm)
    yp_spec = pl.BlockSpec((tx, slab, nz),
                           lambda i, j: (i, ((j + 1) * tyb) % nyb, 0),
                           memory_space=vm)
    out, parts = pl.pallas_call(
        functools.partial(_lapl_dot_kernel_pan, invs=invs),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((gi * 8, gj * 128), u.dtype)),
        grid=(gi, gj),
        in_specs=[xplane(-1), ym_spec, blk, yp_spec, xplane(tx)],
        out_specs=(blk, pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                     memory_space=vm)),
        cost_estimate=pl.CostEstimate(
            flops=11 * u.size, bytes_accessed=2 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(u, u, u, u, u)
    return out, jnp.sum(parts)


def _part00(part_ref, val):
    """Place a block-scalar into slot [0, 0] of an (8, 128) partials tile
    (in-kernel .at[].set lowers to an unsupported scatter)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, part_ref.shape, 1)
    part_ref[:] = jnp.where((ii == 0) & (jj == 0), val,
                            0.0).astype(part_ref.dtype)


def _pupd_lapl_dot_kernel_fy(sc, vm_, vc, vp_, pm_, pc_, pp_,
                             pnew_ref, out_ref, part_ref, *, invs):
    """Fused CG search-direction update + matvec + partial dot (full-y
    scheme): p' = (v - zshift) + beta*p formed in-VMEM on the
    halo-extended slab, then Ap' and the <p', Ap'> partial in the same
    pass — the separate 3-stream p-update pass disappears (its read of v
    and p ride the matvec's own halo-extended fetches)."""
    beta = sc[0]
    zs = sc[1]
    pe_m = (vm_[:] - zs) + beta * pm_[:]
    pe_c = (vc[:] - zs) + beta * pc_[:]
    pe_p = (vp_[:] - zs) + beta * pp_[:]
    pnew_ref[:] = pe_c
    # _star_into slices its operands with [:], which arrays also support
    _star_into(out_ref, pe_c, invs, pe_m, pe_p)
    _part00(part_ref, jnp.sum(pe_c * out_ref[:]))


@functools.partial(jax.jit, static_argnames=("deltas", "tiles"))
def _pupd_dot(v, p, sc, deltas, tiles):
    nx, ny, nz = v.shape
    tx, ty = tiles
    gi, gj = nx // tx, ny // ty
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    vm = pltpu.VMEM
    blk = pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0), memory_space=vm)
    xplane = lambda off: pl.BlockSpec(
        (1, ty, nz), lambda i, j: ((i * tx + off) % nx, j, 0),
        memory_space=vm)
    pnew, out, parts = pl.pallas_call(
        functools.partial(_pupd_lapl_dot_kernel_fy, invs=invs),
        out_shape=(jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct((gi * 8, gj * 128), v.dtype)),
        grid=(gi, gj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  xplane(-1), blk, xplane(tx),
                  xplane(-1), blk, xplane(tx)],
        out_specs=(blk, blk, pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                          memory_space=vm)),
        cost_estimate=pl.CostEstimate(
            flops=17 * v.size, bytes_accessed=4 * v.size * v.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(sc, v, v, v, p, p, p)
    return pnew, out, jnp.sum(parts)


def _pupd_lapl_dot_kernel_pan(sc, vxm, vym, vc, vyp, vxp,
                              pxm, pym, pc_, pyp, pxp,
                              pnew_ref, out_ref, part_ref, *, invs):
    """Paneled-scheme variant (y tiled with 8-row halo slabs)."""
    beta = sc[0]
    zs = sc[1]
    upd = lambda a, b_: (a[:] - zs) + beta * b_[:]
    pe_c = upd(vc, pc_)
    pnew_ref[:] = pe_c
    _star_into(out_ref, pe_c, invs, upd(vxm, pxm), upd(vxp, pxp),
               upd(vym, pym), upd(vyp, pyp))
    _part00(part_ref, jnp.sum(pe_c * out_ref[:]))


@functools.partial(jax.jit, static_argnames=("deltas", "tiles"))
def _pupd_dot_pan(v, p, sc, deltas, tiles):
    nx, ny, nz = v.shape
    tx, ty = tiles
    gi, gj = nx // tx, ny // ty
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    vm = pltpu.VMEM
    blk = pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0), memory_space=vm)
    xplane = lambda off: pl.BlockSpec(
        (1, ty, nz), lambda i, j: ((i * tx + off) % nx, j, 0),
        memory_space=vm)
    slab = 16 if v.dtype.itemsize < 4 else 8
    nyb, tyb = ny // slab, ty // slab
    ym_spec = lambda: pl.BlockSpec((tx, slab, nz),
                                   lambda i, j: (i, (j * tyb - 1) % nyb, 0),
                                   memory_space=vm)
    yp_spec = lambda: pl.BlockSpec((tx, slab, nz),
                                   lambda i, j: (i, ((j + 1) * tyb) % nyb, 0),
                                   memory_space=vm)
    pnew, out, parts = pl.pallas_call(
        functools.partial(_pupd_lapl_dot_kernel_pan, invs=invs),
        out_shape=(jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype),
                   jax.ShapeDtypeStruct((gi * 8, gj * 128), v.dtype)),
        grid=(gi, gj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  xplane(-1), ym_spec(), blk, yp_spec(), xplane(tx),
                  xplane(-1), ym_spec(), blk, yp_spec(), xplane(tx)],
        out_specs=(blk, blk, pl.BlockSpec((8, 128), lambda i, j: (i, j),
                                          memory_space=vm)),
        cost_estimate=pl.CostEstimate(
            flops=17 * v.size, bytes_accessed=4 * v.size * v.dtype.itemsize,
            transcendentals=0),
        **_scoped_vmem(
            [blk, blk, blk], [blk, blk], v.dtype.itemsize),
        interpret=jax.default_backend() != "tpu",
    )(sc, v, v, v, v, v, p, p, p, p, p)
    return pnew, out, jnp.sum(parts)


def pupdate_lapl_dot_pallas(v: jax.Array, p_old: jax.Array, beta, zshift,
                            deltas: Sequence[float]):
    """(p', A p', <p', A p'>) where p' = (v - zshift) + beta * p_old —
    the CG search-direction update fused into the matvec+dot kernel.

    Saves the separate 3-stream p-update pass of every CG iteration: the
    reads of v and p_old ride the stencil kernel's own halo-extended
    fetches. Single-device only (the sharded path patches faces after the
    kernel, which would need p' materialized first).
    """
    tiles = _pick_tiles(v)
    d = tuple(float(x) for x in deltas)
    dt = v.dtype
    sc = jnp.stack([jnp.asarray(beta, dt), jnp.asarray(zshift, dt)])
    if tiles[1] != v.shape[1]:
        slab = 16 if dt.itemsize < 4 else 8
        if tiles[1] % slab:
            pn = (v - jnp.asarray(zshift, dt)) + jnp.asarray(beta, dt) * p_old
            out, dot = apply_laplacian_dot_pallas(pn, d)
            return pn, out, dot
        return _pupd_dot_pan(v, p_old, sc, d, tiles)
    return _pupd_dot(v, p_old, sc, d, tiles)


def _cg_update_kernel(al_ref, x_ref, p_ref, r_ref, ap_ref,
                      xo_ref, ro_ref, rr_ref, sr_ref):
    """Fused CG iterate update: x' = x + alpha*p, r' = r - alpha*Ap, with
    the ||r'||^2 and sum(r') partials computed in the same pass — and x/r
    written through their own buffers (write range == read range per
    block). Replaces ~3 XLA elementwise kernels + a reduction pass."""
    a = al_ref[0]
    xo_ref[:] = x_ref[:] + a * p_ref[:]
    rn = r_ref[:] - a * ap_ref[:]
    ro_ref[:] = rn
    ii = jax.lax.broadcasted_iota(jnp.int32, rr_ref.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, rr_ref.shape, 1)
    at00 = (ii == 0) & (jj == 0)
    rr_ref[:] = jnp.where(at00, jnp.sum(rn * rn), 0.0).astype(rr_ref.dtype)
    sr_ref[:] = jnp.where(at00, jnp.sum(rn), 0.0).astype(sr_ref.dtype)


@jax.jit
def cg_fused_update(alpha, x, p, r, ap):
    """(x + alpha*p, r - alpha*Ap, ||r'||^2, sum(r')) in one memory pass
    over the four fields. Single-device only (pallas_call cannot be
    auto-partitioned)."""
    nx, ny, nz = x.shape
    plane = ny * nz * x.dtype.itemsize
    T = 8
    while T > 1 and (nx % T or 12 * T * plane > 48 * 2**20):
        T //= 2
    gi = nx // T
    vm = pltpu.VMEM
    blk = pl.BlockSpec((T, ny, nz), lambda i: (i, 0, 0), memory_space=vm)
    part = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=vm)
    xo, ro, rr, sr = pl.pallas_call(
        _cg_update_kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((gi * 8, 128), x.dtype),
                   jax.ShapeDtypeStruct((gi * 8, 128), x.dtype)),
        grid=(gi,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk, blk, blk, blk],
        out_specs=(blk, blk, part, part),
        input_output_aliases={1: 0, 3: 1},
        **_scoped_vmem([blk] * 4, [blk, blk, part, part], x.dtype.itemsize),
        cost_estimate=pl.CostEstimate(
            flops=6 * x.size,
            bytes_accessed=6 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(jnp.reshape(alpha, (1,)).astype(x.dtype), x, p, r, ap)
    return xo, ro, jnp.sum(rr), jnp.sum(sr)


def apply_laplacian_dot_pallas(u: jax.Array, deltas: Sequence[float]):
    """(A u, <u, A u>) in one fused pass — the CG matvec + pAp dot without
    the extra read of u and A u, in both the full-y and the paneled tiling
    schemes."""
    tiles = _pick_tiles(u)
    d = tuple(float(x) for x in deltas)
    if tiles[1] != u.shape[1]:
        big = _big_slab_tiles(u)
        if big is not None:
            return _apply_dot(u, d, big)
        slab = 16 if u.dtype.itemsize < 4 else 8
        if tiles[1] % slab:
            out = apply_laplacian_pallas(u, deltas)
            return out, jnp.sum(u * out)
        return _apply_dot_pan(u, d, tiles)
    return _apply_dot(u, d, tiles)


@functools.partial(jax.jit, static_argnames=("deltas", "tiles"))
def _residual(u, b, deltas, tiles):
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    return _launch(_upd_residual, u, tiles, invs, extra=(b,))


@functools.partial(jax.jit, static_argnames=("deltas", "tiles", "weight"))
def _jacobi(u, b, deltas, weight, tiles):
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    return _launch(_upd_jacobi, u, tiles, invs, extra=(b,), winv_diag=winv)


@functools.partial(jax.jit, static_argnames=("deltas", "tiles", "weight",
                                             "color"))
def _sor(u, b, deltas, weight, color, tiles):
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    return _launch(_upd_sor, u, tiles, invs, extra=(b,), winv_diag=winv,
                   color=color, vmem_est=3.3)


def _sor_rb_zero_kernel(bp_ref, b_ref, bn_ref, out_ref, *, invs, winv_diag,
                        colors, tile_x):
    """One full red-black sweep from a ZERO initial guess: star(0) = 0, so
    the first color is just winv*mask*b (no u read at all) and the second
    color completes in the same pass — 2 HBM passes (read b, write x)
    instead of the generic kernel's 3 plus a wasted x = 0 stream."""
    T = b_ref.shape[0]
    ny, nz = b_ref.shape[1], b_ref.shape[2]

    i0 = pl.program_id(0) * tile_x
    be = jnp.concatenate([bp_ref[:], b_ref[:], bn_ref[:]], axis=0)  # T+2
    par = _parity((T + 2, ny, nz), i0 - 1, 0)
    dt = be.dtype.type
    w1 = _color_weight(par, colors[0], winv_diag, be.dtype)
    x1 = w1 * be
    out_ref[:] = _rb_halfstep(x1, b_ref[:], (dt(winv_diag) - w1)[1:-1], invs)


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x", "weight",
                                             "reverse"))
def _sor_rb_zero(b, deltas, weight, reverse, tile_x):
    shape, dtype = b.shape, b.dtype
    nx, ny, nz = shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    colors = (1, 0) if reverse else (0, 1)
    kernel = functools.partial(_sor_rb_zero_kernel, invs=invs,
                               winv_diag=winv, colors=colors, tile_x=tile_x)
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x - 1) % nx, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, ny, nz),
                     lambda i: ((i * tile_x + tile_x) % nx, 0, 0),
                     memory_space=vm),
    ]
    out_spec = pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                            memory_space=vm)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        grid=(nx // tile_x,),
        in_specs=in_specs,
        out_specs=out_spec,
        # measured 3.6x stack ratio (16.08M over 4.5M of blocks at 256^3)
        # and boundary flakiness at near-fit limits: always give this
        # kernel the roomy reservation
        **_scoped_vmem(in_specs, [out_spec], jnp.dtype(dtype).itemsize,
                       factor=22.0, est_factor=4.0),
        cost_estimate=pl.CostEstimate(
            flops=12 * nx * ny * nz,
            bytes_accessed=2 * nx * ny * nz * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(b, b, b)


def _sor_rb_zero_upd_kernel(sc, rp, rc, rn, app, apc, apn,
                            bout_ref, xout_ref, rr_ref, sr_ref, *,
                            invs, winv_diag, colors, tile_x):
    """Zero-guess RB sweep with the CG residual update fused in: the
    sweep's RHS b = r - alpha*Ap forms on the fly from the previous
    residual and the matvec output (each fetched with the same 1-plane
    halos b needed), is written out as the V-cycle's materialized RHS,
    and the ||b||^2 / sum(b) reductions CG needs next land as per-block
    partials — the separate r-update's read-modify-write of r and its
    reductions disappear into this kernel's streams."""
    a = sc[0]
    T = rc.shape[0]
    ny, nz = rc.shape[1], rc.shape[2]
    i0 = pl.program_id(0) * tile_x
    be = (jnp.concatenate([rp[:], rc[:], rn[:]], axis=0)
          - a * jnp.concatenate([app[:], apc[:], apn[:]], axis=0))
    bc = be[1:-1]
    bout_ref[:] = bc
    par = _parity((T + 2, ny, nz), i0 - 1, 0)
    dt = be.dtype.type
    w1 = _color_weight(par, colors[0], winv_diag, be.dtype)
    x1 = w1 * be
    xout_ref[:] = _rb_halfstep(x1, bc, (dt(winv_diag) - w1)[1:-1], invs)
    _part00(rr_ref, jnp.sum(bc * bc))
    _part00(sr_ref, jnp.sum(bc))


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x", "weight",
                                             "reverse"))
def _sor_rb_zero_upd(r, ap, sc, deltas, weight, reverse, tile_x):
    shape, dtype = r.shape, r.dtype
    nx, ny, nz = shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    colors = (1, 0) if reverse else (0, 1)
    kernel = functools.partial(_sor_rb_zero_upd_kernel, invs=invs,
                               winv_diag=winv, colors=colors, tile_x=tile_x)
    vm = pltpu.VMEM
    gi = nx // tile_x
    halo_m = pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x - 1) % nx, 0, 0),
                          memory_space=vm)
    blk = pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                       memory_space=vm)
    halo_p = pl.BlockSpec((1, ny, nz),
                          lambda i: ((i * tile_x + tile_x) % nx, 0, 0),
                          memory_space=vm)
    part = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=vm)
    pshape = jax.ShapeDtypeStruct((gi * 8, 128), dtype)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                halo_m, blk, halo_p, halo_m, blk, halo_p]
    out_specs = (blk, blk, part, part)
    b_new, x1, rrp, srp = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(shape, dtype),
                   jax.ShapeDtypeStruct(shape, dtype), pshape, pshape),
        grid=(gi,),
        in_specs=in_specs,
        out_specs=out_specs,
        **_scoped_vmem(in_specs[1:], [blk, blk], jnp.dtype(dtype).itemsize,
                       factor=22.0, est_factor=4.0),
        cost_estimate=pl.CostEstimate(
            flops=16 * r.size,
            bytes_accessed=4 * r.size * jnp.dtype(dtype).itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(sc, r, r, r, ap, ap, ap)
    return b_new, x1, jnp.sum(rrp), jnp.sum(srp)


def sor_rb_zero_update_pallas(r: jax.Array, ap: jax.Array, alpha,
                              deltas: Sequence[float], weight: float,
                              reverse: bool = False, tile_x: int = 8,
                              out_dtype=None):
    """(b, x1, ||b||^2, sum(b)) where b = r - alpha*Ap and x1 is the
    zero-guess RB sweep for A x = b — CG's residual update fused into the
    V-cycle's first kernel.

    512^3-class grids take the ALIASED streaming form (b through r's
    buffer, x1 through Ap's — both die at this point of the CG iteration,
    so all four streams run in the fast same-buffer HBM regime: measured
    4.20 vs 5.18 ms at 512^3, bench/exp_ledger512.py round 4).

    `out_dtype` narrows x1 (MGConfig.pre_dtype composed with the fused
    M-side path): half the x1 write bytes, and the fused downward-leg
    kernels read it narrow."""
    from poissbox_tpu.ops import stencil_inplace
    if stencil_inplace.stream2_ok(r.shape, r.dtype):
        return stencil_inplace.sor_rb_zero_update_stream(
            r, ap, alpha, deltas, weight, reverse, out_dtype=out_dtype)
    if out_dtype is not None and jnp.dtype(out_dtype) != r.dtype:
        b_new, x1, rr, sr = sor_rb_zero_update_pallas(
            r, ap, alpha, deltas, weight, reverse, tile_x)
        return b_new, x1.astype(out_dtype), rr, sr
    plane = r.shape[1] * r.shape[2] * r.dtype.itemsize
    tx = tile_x
    # 4 block streams of (tx+2) planes, double-buffered by the pipeline,
    # must leave stack headroom in the 128 MB VMEM (640^3-class planes
    # blew past it at tx=8; 512^3 keeps its measured tx=8 configuration)
    while tx > 1 and (r.shape[0] % tx or 8 * (tx + 2) * plane > 88 * 2**20):
        tx //= 2
    sc = jnp.reshape(jnp.asarray(alpha, r.dtype), (1,))
    return _sor_rb_zero_upd(r, ap, sc, tuple(float(d) for d in deltas),
                            float(weight), bool(reverse), tx)


def sor_rb_zero_sweep_pallas(b: jax.Array, deltas: Sequence[float],
                             weight: float, reverse: bool = False,
                             tile_x: int = 8) -> jax.Array:
    """Full red-black sweep starting from x = 0 (the V-cycle pre-smooth
    entry), fused into one 2-pass kernel."""
    tx = tile_x
    while tx > 1 and b.shape[0] % tx:
        tx //= 2
    return _sor_rb_zero(b, tuple(float(d) for d in deltas), float(weight),
                        bool(reverse), tx)


@functools.partial(jax.jit, static_argnames=("deltas", "tile_x", "weight",
                                             "reverse", "dots"))
def _sor_rb(u, b, deltas, weight, reverse, tile_x, dots=False):
    """One full red-black sweep (both colors) in a single kernel pass.
    `dots=True` adds the (<x_out, b>, sum(x_out)) coupling reductions as
    per-block partials computed in the same pass (the V-cycle's final
    post-smooth feeds CG's <r, M r> / sum(M r) without another read)."""
    nx, ny, nz = u.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    colors = (1, 0) if reverse else (0, 1)
    kernel = functools.partial(_sor_rb_kernel, invs=invs, winv_diag=winv,
                               colors=colors, tile_x=tile_x)
    vm = pltpu.VMEM
    half = tile_x // 2
    nxb = nx // 2  # block-index space for 2-plane blocks
    gi = nx // tile_x
    blk = pl.BlockSpec((tile_x, ny, nz), lambda i: (i, 0, 0),
                       memory_space=vm)
    out_shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
    out_specs = blk
    if dots:
        part = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=vm)
        pshape = jax.ShapeDtypeStruct((gi * 8, 128), u.dtype)
        out_shape = (out_shape, pshape, pshape)
        out_specs = (out_specs, part, part)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(gi,),
        in_specs=[
            # x, with two halo planes each side (2-plane block units)
            pl.BlockSpec((2, ny, nz), lambda i: ((i * half - 1) % nxb, 0, 0),
                         memory_space=vm),
            blk,
            pl.BlockSpec((2, ny, nz), lambda i: (((i + 1) * half) % nxb, 0, 0),
                         memory_space=vm),
            # b, with one halo plane each side
            pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x - 1) % nx, 0, 0),
                         memory_space=vm),
            blk,
            pl.BlockSpec((1, ny, nz), lambda i: ((i * tile_x + tile_x) % nx, 0, 0),
                         memory_space=vm),
        ],
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=20 * u.size, bytes_accessed=3 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(u, u, u, b, b, b)
    if dots:
        x, rvp, svp = out
        return x, jnp.sum(rvp), jnp.sum(svp)
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _big_slab_tiles(u: jax.Array):
    """Full-y x-slab tiles for the 1-2-stream read-dominated kernels on
    large-plane grids where _pick_tiles falls to the paneled scheme:
    measured faster at 512^3 (apply 3.32 vs 3.52 ms, exp_apply512_r4) —
    the y-halo slabs' read amplification costs more than the bigger
    blocks' scheduling. None when the plane is too large even for this
    (the explicit reservation covers ~3 block streams only)."""
    nx, ny, nz = u.shape
    row = nz * u.dtype.itemsize
    for t in (8, 4, 2):
        if nx % t == 0 and (t + 2) * ny * row <= 24 * 2**20:
            return t, ny
    return None


def apply_laplacian_pallas(u: jax.Array, deltas: Sequence[float],
                           tile_x: int = 8) -> jax.Array:
    """Periodic 7-point Laplacian via the tiled Pallas kernel.

    Semantics identical to `ops.stencil.apply_laplacian` (cross-checked by
    tests the way the reference demo cross-checks its two operator paths,
    reference src/example.f90:235-261). `tile_x` caps the x-slab size; the
    y-panel adapts to the VMEM budget.
    """
    tiles = _pick_tiles(u)
    if tiles[1] != u.shape[1]:
        big = _big_slab_tiles(u)
        if big is not None:
            tiles = big
    return _apply(u, tuple(float(d) for d in deltas),
                  (min(tiles[0], tile_x), tiles[1]))


def _resid_xrestrict_kernel(up_ref, uc_ref, un_ref, bp_ref, bc_ref, bn_ref,
                            out_ref, *, invs):
    """Fused MG downward leg along x: residual r = b - A u on 2*Tc fine
    planes (+1 halo each side) immediately x-restricted to Tc coarse
    planes — the full-size residual array never touches HBM. The y/z
    restriction runs on the half-size output via the MXU banded form
    (solvers.mg.restrict_mm axes=(1, 2)). A narrower u (the bf16
    pre-smooth iterate, MGConfig.pre_dtype) upcasts in-VMEM: the residual
    math and output stay in b's precision."""
    star = functools.partial(_star_ext, invs=invs)

    xe = jnp.concatenate([up_ref[:], uc_ref[:], un_ref[:]],
                         axis=0).astype(bc_ref.dtype)
    be = jnp.concatenate([bp_ref[:], bc_ref[:], bn_ref[:]], axis=0)
    r = be - star(xe)                      # 2*Tc+2 fine planes
    r0 = r[1:-1]
    tc = out_ref.shape[0]
    ny, nz = r0.shape[1], r0.shape[2]
    pairs = r0.reshape(tc, 2, ny, nz)      # leading-dim split only
    even, odd = pairs[:, 0], pairs[:, 1]   # r_{2I}, r_{2I+1}
    if tc > 1:
        up = jnp.concatenate([even[1:], r[-1:]], axis=0)   # r_{2I+2}
        dn = jnp.concatenate([r[:1], odd[:-1]], axis=0)    # r_{2I-1}
    else:
        # single-coarse-plane block: zero-size concat operands are
        # rejected by Mosaic (hit at 768^3, where the VMEM budget forces
        # tc = 1); the neighbors come entirely from the halo planes
        up, dn = r[-1:], r[:1]
    out_ref[:] = (3.0 * (even + odd) + up + dn) * 0.125


@functools.partial(jax.jit, static_argnames=("deltas", "tc"))
def _resid_xrestrict(u, b, deltas, tc):
    nx, ny, nz = u.shape
    nxc = nx // 2
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    vm = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_resid_xrestrict_kernel, invs=invs),
        out_shape=jax.ShapeDtypeStruct((nxc, ny, nz), b.dtype),
        grid=(nxc // tc,),
        in_specs=(rx_in := [
            # u: 2*tc fine planes + 2-plane halos (2-plane block units)
            pl.BlockSpec((2, ny, nz), lambda i: ((i * tc - 1) % nxc, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((2 * tc, ny, nz), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((2, ny, nz), lambda i: (((i + 1) * tc) % nxc, 0, 0),
                         memory_space=vm),
            # b: 1-plane halos
            pl.BlockSpec((1, ny, nz), lambda i: ((2 * i * tc - 1) % nx, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((2 * tc, ny, nz), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, ny, nz),
                         lambda i: ((2 * (i + 1) * tc) % nx, 0, 0),
                         memory_space=vm),
        ]),
        out_specs=(rx_out := pl.BlockSpec((tc, ny, nz), lambda i: (i, 0, 0),
                                          memory_space=vm)),
        **_scoped_vmem(rx_in, [rx_out], b.dtype.itemsize),
        cost_estimate=pl.CostEstimate(
            flops=12 * u.size,
            bytes_accessed=(2 * u.size + u.size // 2) * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(u, u, u, b, b, b)


def residual_xrestrict_pallas(u: jax.Array, b: jax.Array,
                              deltas: Sequence[float]) -> jax.Array:
    """(b - A u) restricted along x to (nx/2, ny, nz), one fused pass."""
    nx, ny, nz = u.shape
    # size tiles by the WIDE dtype: a narrow (bf16 pre_dtype) u upcasts
    # in-VMEM, so its stack cost is b-sized regardless of its HBM width
    plane = ny * nz * b.dtype.itemsize
    tc = 8
    while tc > 1 and ((nx // 2) % tc or (10 * tc + 10) * plane > 48 * 2**20):
        tc //= 2
    return _resid_xrestrict(u, b, tuple(float(d) for d in deltas), tc)


def _xprolong_add_kernel(em_ref, ec_ref, ep_ref, u_ref, out_ref):
    """Fused MG upward leg along x: trilinear x-prolongation of the
    (already y/z-prolonged) coarse correction, added straight into u —
    the full-size prolonged array never touches HBM. Aliasing u -> out is
    safe: each block writes exactly the planes it read (no u halos)."""
    e = ec_ref[:]
    if e.shape[0] > 1:
        e_m = jnp.concatenate([em_ref[:], e[:-1]], axis=0)   # e_{I-1}
        e_p = jnp.concatenate([e[1:], ep_ref[:]], axis=0)    # e_{I+1}
    else:
        # tc = 1 block (VMEM-forced at 768^3-class planes): zero-size
        # concat operands are rejected by Mosaic
        e_m, e_p = em_ref[:], ep_ref[:]
    even = 0.75 * e + 0.25 * e_m                          # fine 2I
    odd = 0.75 * e + 0.25 * e_p                           # fine 2I+1
    tc, ny, nz = e.shape
    corr = jnp.stack([even, odd], axis=1).reshape(2 * tc, ny, nz)
    # a narrower u (bf16 pre-smooth iterate) upcasts in-VMEM; the
    # corrected iterate is written in the correction's precision
    out_ref[:] = u_ref[:].astype(corr.dtype) + corr


@functools.partial(jax.jit, static_argnames=("tc",))
def _xprolong_add(u, e, tc):
    nx, ny, nz = u.shape
    nxc = nx // 2
    vm = pltpu.VMEM
    return pl.pallas_call(
        _xprolong_add_kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, e.dtype),
        grid=(nxc // tc,),
        in_specs=(px_in := [
            pl.BlockSpec((1, ny, nz), lambda i: ((i * tc - 1) % nxc, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((tc, ny, nz), lambda i: (i, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, ny, nz), lambda i: (((i + 1) * tc) % nxc, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((2 * tc, ny, nz), lambda i: (i, 0, 0),
                         memory_space=vm),
        ]),
        out_specs=(px_out := pl.BlockSpec((2 * tc, ny, nz),
                                          lambda i: (i, 0, 0),
                                          memory_space=vm)),
        input_output_aliases={3: 0} if u.dtype == e.dtype else {},
        **_scoped_vmem(px_in, [px_out], e.dtype.itemsize),
        cost_estimate=pl.CostEstimate(
            flops=5 * u.size,
            bytes_accessed=(2 * u.size + u.size // 2) * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(e, e, e, u)


def xprolong_add_pallas(u: jax.Array, e_yz: jax.Array) -> jax.Array:
    """u + P_x(e_yz) in one pass; e_yz is the y/z-prolonged coarse
    correction at shape (nx/2, ny, nz)."""
    nx, ny, nz = u.shape
    # size tiles by the WIDE dtype (bf16 u upcasts in-VMEM)
    plane = ny * nz * e_yz.dtype.itemsize
    tc = 8
    while tc > 1 and ((nx // 2) % tc or (8 * tc + 6) * plane > 48 * 2**20):
        tc //= 2
    return _xprolong_add(u, e_yz, tc)


def residual_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                    tile_x: int = 8) -> jax.Array:
    """Fused residual r = b - A u (3 HBM passes instead of 5)."""
    tiles = _pick_tiles(u)
    if tiles[1] != u.shape[1]:
        big = _big_slab_tiles(u)
        if big is not None:
            tiles = big
    return _residual(u, b, tuple(float(d) for d in deltas),
                     (min(tiles[0], tile_x), tiles[1]))


def jacobi_sweep_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                        weight: float, tile_x: int = 8) -> jax.Array:
    """Fused damped-Jacobi smoother sweep u + (w/diag)(b - A u) — the MG
    level smoother as one memory pass over (u, b, out). Grids too large
    for VMEM residency take the in-place aliased kernel (see
    ops.stencil_inplace for the measured two-stream HBM wall)."""
    from poissbox_tpu.ops import stencil_inplace
    if stencil_inplace.available(u.shape, u.dtype):
        return stencil_inplace.jacobi_sweep_inplace(u, b, deltas, weight)
    tiles = _pick_tiles(u, prefer4=False)
    return _jacobi(u, b, tuple(float(d) for d in deltas), float(weight),
                   (min(tiles[0], tile_x), tiles[1]))


def sor_sweep_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                     weight: float, color: int, tile_x: int = 8) -> jax.Array:
    """Fused red-black SOR color update (color 0 = red, (i+j+k) even)."""
    tiles = _pick_tiles(u, prefer4=False)
    return _sor(u, b, tuple(float(d) for d in deltas), float(weight),
                int(color), (min(tiles[0], tile_x), tiles[1]))


def sor_rb_multisweep_pallas(u: jax.Array, b: jax.Array,
                             deltas: Sequence[float], weight: float,
                             nsweeps: int, reverse: bool = False,
                             dots: bool = False):
    """`nsweeps` complete red-black sweeps.

    Deliberately NOT temporally blocked: the fused k-sweep in-place kernel
    (ops.stencil_inplace._sor_rb_multi_inplace, halo H = 2k) was measured
    SLOWER at 512^3 — VMEM limits force the slab down to T = 4 at H = 4,
    so halo amplification (T+2H)/T = 3x eats the saved memory passes
    (5.8 ms/sweep fused vs 4.5 single). Full-plane slabs leave no VMEM
    headroom for temporal blocking; it would need y-paneling first.

    `dots=True` also returns (<x_out, b>, sum(x_out)): the in-place kernel
    accumulates them during its final sweep for free; other paths compute
    them explicitly (same cost as the caller doing it — correctness
    parity, no penalty)."""
    from poissbox_tpu.ops import stencil_inplace
    inplace = stencil_inplace.available(u.shape, u.dtype)
    for k in range(nsweeps):
        last = k == nsweeps - 1
        if inplace:
            out = stencil_inplace.sor_rb_sweep_inplace(
                u, b, deltas, weight, reverse, dots=dots and last)
        else:
            out = sor_rb_sweep_pallas(u, b, deltas, weight, reverse,
                                      dots=dots and last)
        if dots and last:
            return out
        u = out
    if dots:
        # nsweeps == 0 degenerate case only
        return u, jnp.sum(u * b), jnp.sum(u)
    return u


def sor_rb_sweep_pallas(u: jax.Array, b: jax.Array, deltas: Sequence[float],
                        weight: float, reverse: bool = False,
                        tile_x: int = 8, dots: bool = False):
    """One complete red-black SOR sweep (both colors, reversed order when
    `reverse`) as a single wide-halo kernel pass — ~half the HBM traffic of
    two color updates. Requires full (y, z) planes in VMEM and an even
    slab; falls back to two color kernels on large-plane grids. Grids too
    large for VMEM residency take the in-place aliased kernel
    (ops.stencil_inplace). `dots=True` also returns the in-kernel
    (<x_out, b>, sum(x_out)) coupling reductions."""
    from poissbox_tpu.ops import stencil_inplace
    if stencil_inplace.available(u.shape, u.dtype):
        return stencil_inplace.sor_rb_sweep_inplace(u, b, deltas, weight,
                                                    reverse, dots=dots)
    nx, ny, nz = u.shape
    plane = ny * nz * u.dtype.itemsize
    t = tile_x
    # x-slab scheme with wide halos: (T+4) full planes must fit the budget
    while t > 1 and ((t + 4) * plane > 2 * 2**20 or nx % t):
        t //= 2
    if t < 2:
        first, second = (1, 0) if reverse else (0, 1)
        u = sor_sweep_pallas(u, b, deltas, weight, first, tile_x)
        x = sor_sweep_pallas(u, b, deltas, weight, second, tile_x)
        return (x, jnp.sum(x * b), jnp.sum(x)) if dots else x
    return _sor_rb(u, b, tuple(float(d) for d in deltas), float(weight),
                   bool(reverse), t, dots=dots)
