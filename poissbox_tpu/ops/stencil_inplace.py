"""In-place (aliased) smoother kernels for grids too large for VMEM
residency — the 512^3-class fast path.

Measured on TPU v5e (bench/exp_bw*.py): two concurrent HBM streams to
*distinct* 512 MB buffers top out near ~350-450 GB/s, while read+write of
the *same* buffer sustains 650-780 GB/s. An out-of-place stencil sweep is
therefore capped near 45% of nominal roofline at 512^3 no matter how it is
tiled. These kernels instead update the field buffer in place
(`input_output_aliases={0: 0}`) with a manually pipelined lagged-write
schedule that keeps the sweep mathematically identical to the out-of-place
kernels (every read sees the OLD field values):

  * the grid is processed as x-slabs of T planes with full (y, z) extent;
  * slab i's halo-extended planes [iT-H, iT+T+H) are double-buffered into
    VMEM by explicit DMAs;
  * the write-back of slab i starts only after slab i+1's fetch has
    completed — the only overlap between write(i) ([iT, iT+T)) and any
    later read is slab i+1's left halo [(i+1)T-H, (i+1)T), so this single
    ordering constraint makes the in-place update race-free;
  * the periodic wrap: slab nb-1's right halo is planes [0, H), which
    slab 0's write-back clobbers long before — they are saved to a VMEM
    scratch in the prologue.

The smoother update semantics mirror ops.stencil_pallas (Jacobi sweep and
the wide-halo red-black double sweep; reference hot-path analogue:
src/poissbox.f90:112-148 under KSPSolve smoothing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poissbox_tpu.ops.stencil_pallas import _star_ext as _star  # noqa: F401
from poissbox_tpu.ops.stencil_pallas import _rb_halfstep


def _parity_x(shape, x0):
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + x0
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return (ii + jj + kk) % 2


def _upd_jacobi(xe, be, i0, *, invs, winv):
    # xe: T+2 planes, be: T planes -> T updated planes
    return xe[1:-1] + winv * (be - _star(xe, invs))


def _make_kernel(nx, ny, nz, T, H, Hb, dtype, update, with_b, dots=False,
                 gate_writes=True):
    """Build the manual-pipeline kernel body. `update(xe, be, x0)` maps the
    halo-extended u slab (T+2H planes) and b slab (T+2Hb planes) to the T
    output planes; x0 is the absolute x index of the first written plane.

    `dots` adds a second (8, 128) output holding, in slots [0, 0] and
    [0, 1], two reductions accumulated slab by slab while everything is
    still VMEM-resident: `"b"` (or True) gives (<x_out, b>, sum(x_out)) —
    the CG coupling reductions <r, M r>, sum(M r) of a final post-smooth;
    `"u"` gives (<x_out, u>, sum(x_out)) — the <A u, u> dot of a fused
    matvec. Either way they cost no extra HBM pass.

    The same pipeline serves the ALIASED in-place kernels (callers set
    input_output_aliases={0: 0}; the lagged write-back makes that
    race-free) and plain OUT-OF-PLACE streaming kernels (no aliasing —
    the write gating is then merely conservative)."""
    nb = nx // T
    P = T + 2 * H
    Pb = T + 2 * Hb

    def kernel(u_hbm, *rest):
        if with_b:
            b_hbm, out_hbm, *dots_out = rest
        else:
            b_hbm = None
            out_hbm, *dots_out = rest
        def body(ub, bb, ob, wrap, sul, sub, sur, sbl, sbb, sbr, so, sw):
            # -- prologue: save the wrap planes [0, H) before any write
            w = pltpu.make_async_copy(u_hbm.at[pl.ds(0, H)], wrap, sw)
            w.start()
            w.wait()

            def u_left(slot, i):
                return pltpu.make_async_copy(
                    u_hbm.at[pl.ds((i * T - H) % nx, H)],
                    ub.at[slot, pl.ds(0, H)], sul.at[slot])

            def u_body(slot, i):
                return pltpu.make_async_copy(
                    u_hbm.at[pl.ds(i * T, T)],
                    ub.at[slot, pl.ds(H, T)], sub.at[slot])

            def u_right(slot, i):
                return pltpu.make_async_copy(
                    u_hbm.at[pl.ds(i * T + T, H)],
                    ub.at[slot, pl.ds(H + T, H)], sur.at[slot])

            def b_left(slot, i):
                return pltpu.make_async_copy(
                    b_hbm.at[pl.ds((i * T - Hb) % nx, Hb)],
                    bb.at[slot, pl.ds(0, Hb)], sbl.at[slot])

            def b_body(slot, i):
                return pltpu.make_async_copy(
                    b_hbm.at[pl.ds(i * T, T)],
                    bb.at[slot, pl.ds(Hb, T)], sbb.at[slot])

            def b_right(slot, i):
                return pltpu.make_async_copy(
                    b_hbm.at[pl.ds((i * T + T) % nx, Hb)],
                    bb.at[slot, pl.ds(Hb + T, Hb)], sbr.at[slot])

            def write(slot, i):
                return pltpu.make_async_copy(
                    ob.at[slot], out_hbm.at[pl.ds(i * T, T)], so.at[slot])

            def fetch(slot, i):
                u_left(slot, i).start()
                u_body(slot, i).start()
                # last slab's right halo comes from the wrap scratch
                @pl.when(i < nb - 1)
                def _():
                    u_right(slot, i).start()
                if with_b:
                    b_body(slot, i).start()
                    if Hb:
                        b_left(slot, i).start()
                        b_right(slot, i).start()

            fetch(0, 0)

            def step(i, carry):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)
                # the fetch for i was started in the previous iteration
                # (or the prologue); under write gating its left-halo DMA
                # was already waited there *except* for i == 0
                if gate_writes:
                    @pl.when(i == 0)
                    def _():
                        u_left(slot, i).wait()
                else:
                    u_left(slot, i).wait()
                u_body(slot, i).wait()
                @pl.when(i < nb - 1)
                def _():
                    u_right(slot, i).wait()
                @pl.when(i == nb - 1)
                def _():
                    ub[slot, H + T:H + T + H] = wrap[...]
                if with_b:
                    b_body(slot, i).wait()
                    if Hb:
                        b_left(slot, i).wait()
                        b_right(slot, i).wait()
                # our output buffer must be free: write(i-2) used this slot
                @pl.when(i >= 2)
                def _():
                    write(slot, i - 2).wait()
                be = bb[slot] if with_b else None
                ob[slot] = update(ub[slot], be, i * T)
                if dots:
                    # slab contribution to the fused reductions while the
                    # written planes are still VMEM-resident
                    xo = ob[slot]
                    src = (ub[slot, H:H + T] if dots == "u"
                           else bb[slot, Hb:Hb + T])
                    rv, sv = carry
                    carry = (rv + jnp.sum(xo * src), sv + jnp.sum(xo))
                # start the next fetch, and (aliased kernels only) gate
                # this slab's write-back on the *left-halo* DMA of slab
                # i+1 — the only later read that overlaps [iT, iT+T).
                # Out-of-place kernels skip the gate: the write conflicts
                # with nothing, and serializing it behind a fetch wait
                # stalls the pipeline for no benefit.
                @pl.when(i + 1 < nb)
                def _():
                    fetch(nxt, i + 1)
                    if gate_writes:
                        u_left(nxt, i + 1).wait()
                write(slot, i).start()
                return carry

            zero = jnp.zeros((), dtype)
            acc = jax.lax.fori_loop(0, nb, step, (zero, zero), unroll=False)
            if dots:
                ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                dots_out[0][...] = jnp.where(
                    (ii == 0) & (jj == 0), acc[0],
                    jnp.where((ii == 0) & (jj == 1), acc[1],
                              jnp.zeros((), dtype))).astype(dtype)
            write(jax.lax.rem(nb - 1, 2), nb - 1).wait()
            @pl.when(nb >= 2)
            def _():
                write(jax.lax.rem(nb - 2, 2), nb - 2).wait()

        pl.run_scoped(
            body,
            ub=pltpu.VMEM((2, P, ny, nz), dtype),
            bb=pltpu.VMEM((2, Pb, ny, nz) if with_b else (1, 1, 1, 1),
                          dtype),
            ob=pltpu.VMEM((2, T, ny, nz), dtype),
            wrap=pltpu.VMEM((H, ny, nz), dtype),
            sul=pltpu.SemaphoreType.DMA((2,)),
            sub=pltpu.SemaphoreType.DMA((2,)),
            sur=pltpu.SemaphoreType.DMA((2,)),
            sbl=pltpu.SemaphoreType.DMA((2,)),
            sbb=pltpu.SemaphoreType.DMA((2,)),
            sbr=pltpu.SemaphoreType.DMA((2,)),
            so=pltpu.SemaphoreType.DMA((2,)),
            sw=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def _pick_T(nx, ny, nz, itemsize, H, Hb, budget=100 * 2**20):
    """Largest power-of-two slab T dividing nx whose scratch fits VMEM.

    Accounts for the explicit buffers (double-buffered u/b/out slabs +
    wrap scratch) plus ~2 halo-extended temporaries the update body keeps
    live (residual + color mask; measured: the H=6 multisweep kernel at
    512^3 with the naive accounting chose T=8 and overflowed VMEM by 47M).
    Narrow dtypes get a halved budget: their slice+concat shift form
    (32-bit-only rotates) spills registers proportional to the slab — a
    bf16 512^3 double sweep at T=8 overflowed VMEM by 8.9M with 82M of
    spill slots."""
    plane = ny * nz * itemsize
    if itemsize < 4:
        budget = budget // 2
    T = 16
    while T > 1:
        need = (2 * (T + 2 * H) + 2 * (T + 2 * Hb) + 2 * T + H
                + 2 * (T + 2 * H)) * plane
        if nx % T == 0 and need <= budget:
            return T
        T //= 2
    return 1


@functools.partial(jax.jit, static_argnames=("deltas", "weight"))
def _jacobi_inplace(u, b, deltas, weight):
    nx, ny, nz = u.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    T = _pick_T(nx, ny, nz, u.dtype.itemsize, 1, 0)

    def update(xe, be, x0):
        return _upd_jacobi(xe, be, x0, invs=invs, winv=winv)

    kernel = _make_kernel(nx, ny, nz, T, 1, 0, u.dtype, update, True)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=11 * u.size,
            bytes_accessed=3 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(u, b)


@functools.partial(jax.jit, static_argnames=("deltas", "weight", "reverse",
                                             "nsweeps", "dots"))
def _sor_rb_multi_inplace(u, b, deltas, weight, reverse, nsweeps,
                          dots=False):
    """`nsweeps` complete red-black sweeps (2*nsweeps color half-steps)
    fused into ONE in-place memory pass — temporal blocking through the
    slab pipeline: the u halo widens to H = 2*nsweeps planes per side and
    each half-step's valid region shrinks by one plane per side, landing
    exactly on the T written planes. Traffic is ~(3T + 4H)/T planes per T
    output planes instead of nsweeps * (3T + 6)/T."""
    nx, ny, nz = u.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = weight / (-2.0 * sum(invs))
    colors = (1, 0) if reverse else (0, 1)
    H = 2 * nsweeps
    Hb = H - 1
    T = _pick_T(nx, ny, nz, u.dtype.itemsize, H, Hb)
    if T < H:
        # the race-free write gating requires the slab to cover the halo;
        # split the fusion instead of running an unsound schedule
        if nsweeps == 1:
            from poissbox_tpu.ops.stencil_pallas import _sor_rb, _pick_tiles
            x = _sor_rb(u, b, deltas, weight, reverse, _pick_tiles(u)[0])
            return (x, jnp.sum(x * b), jnp.sum(x)) if dots else x
        x = _sor_rb_multi_inplace(u, b, deltas, weight, reverse, nsweeps // 2)
        return _sor_rb_multi_inplace(x, b, deltas, weight, reverse,
                                     nsweeps - nsweeps // 2, dots=dots)

    def update(xe, be, x0):
        # xe: T+2H planes at abs x-offset x0-H; be: T+2Hb at x0-Hb.
        # The per-color masked weights winv*(parity==color) are computed
        # ONCE for the widest star region and sliced per half-step
        # (absolute indexing keeps parity correct) — both the per-step
        # iota+mod evaluation and the per-step compare+convert+scale were
        # measurable VPU costs at 512^3 (the kernel is VPU-bound)
        x = xe
        m0 = xe.shape[0] - 2
        par = _parity_x((m0, ny, nz), x0 + (1 - H))
        from poissbox_tpu.ops.stencil_pallas import _color_weight
        w0 = _color_weight(par, colors[0], winv, x.dtype)
        ws = (w0, x.dtype.type(winv) - w0)
        for j in range(2 * nsweeps):
            m = x.shape[0]
            wj = ws[j % 2][j:m0 - j] if j else ws[0]
            x = _rb_halfstep(x, be[j:j + m - 2], wj, invs)
        return x

    kernel = _make_kernel(nx, ny, nz, T, H, Hb, u.dtype, update, True,
                          dots=dots)
    out_shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    if dots:
        out_shape = (out_shape, jax.ShapeDtypeStruct((8, 128), u.dtype))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=22 * nsweeps * u.size,
            bytes_accessed=3 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(u, b)
    if dots:
        x, d = out
        return x, d[0, 0], d[0, 1]
    return out


def _sor_rb_inplace(u, b, deltas, weight, reverse):
    return _sor_rb_multi_inplace(u, b, deltas, weight, reverse, 1)


def jacobi_sweep_inplace(u: jax.Array, b: jax.Array, deltas, weight: float):
    """Damped-Jacobi sweep u + (w/diag)(b - A u), writing through u's
    buffer (XLA copies first if u is still live — pass a dead u)."""
    return _jacobi_inplace(u, b, tuple(float(d) for d in deltas),
                           float(weight))


def sor_rb_sweep_inplace(u: jax.Array, b: jax.Array, deltas, weight: float,
                         reverse: bool = False, dots: bool = False):
    """Full red-black SOR sweep (both colors) through u's buffer.

    `dots=True` additionally returns (<x_out, b>, sum(x_out)) accumulated
    in-kernel — zero extra HBM passes for the CG coupling reductions when
    this is the V-cycle's final post-smooth sweep."""
    return _sor_rb_multi_inplace(u, b, tuple(float(d) for d in deltas),
                                 float(weight), bool(reverse), 1, dots=dots)


def multi_ok(shape, dtype, nsweeps: int) -> bool:
    """Fused `nsweeps`-sweep kernel applies: slab at least as wide as the
    temporal-blocking halo (race-free write gating needs T >= H) and at
    least two slabs in the pipeline."""
    nx, ny, nz = shape
    H = 2 * nsweeps
    T = _pick_T(nx, ny, nz, jnp.dtype(dtype).itemsize, H, H - 1)
    return T >= H and nx // T >= 2


def sor_rb_multisweep_inplace(u: jax.Array, b: jax.Array, deltas,
                              weight: float, nsweeps: int,
                              reverse: bool = False):
    """`nsweeps` fused red-black sweeps in one in-place pass (temporal
    blocking; see _sor_rb_multi_inplace)."""
    return _sor_rb_multi_inplace(u, b, tuple(float(d) for d in deltas),
                                 float(weight), bool(reverse), int(nsweeps))


@functools.partial(jax.jit, static_argnames=("deltas", "dots"))
def _lapl_stream(u, deltas, dots=False):
    """Out-of-place 7-point Laplacian through the manual DMA pipeline.

    The BlockSpec automatic pipeline tops out near ~320 GB/s nominal on
    512^3-class out-of-place stencils (bench/exp_apply512_r4.py) while a
    ping-pong two-stream XLA pass measures 660 GB/s (bench/exp_ledger512);
    this kernel recovers the gap with the same explicit double-buffered
    slab schedule as the in-place smoothers — full (y, z) planes, 1-plane
    halos, no aliasing. `dots=True` also returns <u, A u> and sum(A u)
    accumulated in-VMEM (the CG pAp reduction for free)."""
    nx, ny, nz = u.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    T = _pick_T(nx, ny, nz, u.dtype.itemsize, 1, 0)

    def update(xe, be, x0):
        return _star(xe, invs)

    kernel = _make_kernel(nx, ny, nz, T, 1, 0, u.dtype, update,
                          with_b=False, dots="u" if dots else False,
                          gate_writes=False)
    out_shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    if dots:
        out_shape = (out_shape, jax.ShapeDtypeStruct((8, 128), u.dtype))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=(11 if dots else 9) * u.size,
            bytes_accessed=2 * u.size * u.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(u)
    if dots:
        y, d = out
        return y, d[0, 0]
    return out


def apply_laplacian_stream(u: jax.Array, deltas) -> jax.Array:
    """A u via the manual-pipeline streaming kernel (512^3-class path)."""
    return _lapl_stream(u, tuple(float(d) for d in deltas))


def apply_laplacian_dot_stream(u: jax.Array, deltas):
    """(A u, <u, A u>) via the manual-pipeline streaming kernel."""
    return _lapl_stream(u, tuple(float(d) for d in deltas), dots=True)


# ---------------------------------------------------------------------------
# two-input / two-output aliased pipeline — the CG fusion kernels
#
# The HBM two-stream wall is real for genuinely distinct buffers (~350-450
# GB/s vs 650-780 same-buffer, bench/exp_bw*.py; the round-4 ledger's first
# "two-stream" probe accidentally re-measured the same-buffer case through
# XLA's donated loop carry). The CG iteration's 4-stream fused kernels can
# dodge the wall entirely: at the moment they run, both of their inputs are
# DEAD (v and p_old die forming p' and A p'; r and Ap die forming the new
# RHS and the pre-smooth iterate), so each output aliases an input and all
# four streams run in the fast same-buffer regime. The lagged-write slab
# schedule of _make_kernel makes the aliased read-write race-free.
# ---------------------------------------------------------------------------

def _make_kernel2(nx, ny, nz, T, H, dtype, update, dots=False,
                  out_dtypes=None):
    """Manual pipeline with TWO halo-extended inputs and TWO slab outputs,
    each output aliased onto the same-index input (callers pass
    input_output_aliases={1: 0, 2: 1}; input 0 is an SMEM scalar vector).

    `update(ae, be, sc, x0) -> (outA, outB)` maps the two extended slabs
    (T+2H planes each) to the T output planes written through a's and b's
    buffers respectively. `dots(outA, outB, ae, be) -> (s0, s1)` optionally
    accumulates two reductions into an (8, 128) extra output."""
    nb = nx // T
    P = T + 2 * H

    def kernel(sc_ref, a_hbm, b_hbm, oa_hbm, ob_hbm, *dots_out):
        def body(ab, bb, oa, ob2, wrapa, wrapb, sal, sab, sar,
                 sbl, sbb2, sbr, soa, sob, swa, swb):
            # prologue: save both inputs' wrap planes [0, H) before any
            # aliased write-back can clobber them
            wa = pltpu.make_async_copy(a_hbm.at[pl.ds(0, H)], wrapa, swa)
            wb = pltpu.make_async_copy(b_hbm.at[pl.ds(0, H)], wrapb, swb)
            wa.start()
            wb.start()
            wa.wait()
            wb.wait()

            def left(hbm, buf, sem, slot, i):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds((i * T - H) % nx, H)],
                    buf.at[slot, pl.ds(0, H)], sem.at[slot])

            def mid(hbm, buf, sem, slot, i):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(i * T, T)],
                    buf.at[slot, pl.ds(H, T)], sem.at[slot])

            def right(hbm, buf, sem, slot, i):
                return pltpu.make_async_copy(
                    hbm.at[pl.ds(i * T + T, H)],
                    buf.at[slot, pl.ds(H + T, H)], sem.at[slot])

            def write(hbm, buf, sem, slot, i):
                return pltpu.make_async_copy(
                    buf.at[slot], hbm.at[pl.ds(i * T, T)], sem.at[slot])

            def fetch(slot, i):
                left(a_hbm, ab, sal, slot, i).start()
                mid(a_hbm, ab, sab, slot, i).start()
                left(b_hbm, bb, sbl, slot, i).start()
                mid(b_hbm, bb, sbb2, slot, i).start()
                @pl.when(i < nb - 1)
                def _():
                    right(a_hbm, ab, sar, slot, i).start()
                    right(b_hbm, bb, sbr, slot, i).start()

            fetch(0, 0)

            def step(i, carry):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)
                @pl.when(i == 0)
                def _():
                    left(a_hbm, ab, sal, slot, i).wait()
                    left(b_hbm, bb, sbl, slot, i).wait()
                mid(a_hbm, ab, sab, slot, i).wait()
                mid(b_hbm, bb, sbb2, slot, i).wait()
                @pl.when(i < nb - 1)
                def _():
                    right(a_hbm, ab, sar, slot, i).wait()
                    right(b_hbm, bb, sbr, slot, i).wait()
                @pl.when(i == nb - 1)
                def _():
                    ab[slot, H + T:H + T + H] = wrapa[...]
                    bb[slot, H + T:H + T + H] = wrapb[...]
                @pl.when(i >= 2)
                def _():
                    write(oa_hbm, oa, soa, slot, i - 2).wait()
                    write(ob_hbm, ob2, sob, slot, i - 2).wait()
                outA, outB = update(ab[slot], bb[slot], sc_ref, i * T)
                oa[slot] = outA
                ob2[slot] = outB
                if dots:
                    s0, s1 = carry
                    d0, d1 = dots(oa[slot], ob2[slot], ab[slot], bb[slot])
                    carry = (s0 + d0, s1 + d1)
                # the only later reads overlapping [iT, iT+T) are slab
                # i+1's left halos — fetch them, then release both writes
                @pl.when(i + 1 < nb)
                def _():
                    fetch(nxt, i + 1)
                    left(a_hbm, ab, sal, nxt, i + 1).wait()
                    left(b_hbm, bb, sbl, nxt, i + 1).wait()
                write(oa_hbm, oa, soa, slot, i).start()
                write(ob_hbm, ob2, sob, slot, i).start()
                return carry

            zero = jnp.zeros((), dtype)
            acc = jax.lax.fori_loop(0, nb, step, (zero, zero), unroll=False)
            if dots:
                ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                dots_out[0][...] = jnp.where(
                    (ii == 0) & (jj == 0), acc[0],
                    jnp.where((ii == 0) & (jj == 1), acc[1],
                              jnp.zeros((), dtype))).astype(dtype)
            for hbm, buf, sem in ((oa_hbm, oa, soa), (ob_hbm, ob2, sob)):
                write(hbm, buf, sem, jax.lax.rem(nb - 1, 2), nb - 1).wait()
                @pl.when(nb >= 2)
                def _():
                    write(hbm, buf, sem, jax.lax.rem(nb - 2, 2),
                          nb - 2).wait()

        pl.run_scoped(
            body,
            ab=pltpu.VMEM((2, P, ny, nz), dtype),
            bb=pltpu.VMEM((2, P, ny, nz), dtype),
            oa=pltpu.VMEM((2, T, ny, nz),
                          (out_dtypes or (dtype, dtype))[0]),
            ob2=pltpu.VMEM((2, T, ny, nz),
                           (out_dtypes or (dtype, dtype))[1]),
            wrapa=pltpu.VMEM((H, ny, nz), dtype),
            wrapb=pltpu.VMEM((H, ny, nz), dtype),
            sal=pltpu.SemaphoreType.DMA((2,)),
            sab=pltpu.SemaphoreType.DMA((2,)),
            sar=pltpu.SemaphoreType.DMA((2,)),
            sbl=pltpu.SemaphoreType.DMA((2,)),
            sbb2=pltpu.SemaphoreType.DMA((2,)),
            sbr=pltpu.SemaphoreType.DMA((2,)),
            soa=pltpu.SemaphoreType.DMA((2,)),
            sob=pltpu.SemaphoreType.DMA((2,)),
            swa=pltpu.SemaphoreType.DMA(()),
            swb=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def _pick_T2(nx, ny, nz, itemsize, H, budget=100 * 2**20):
    """Largest power-of-two slab for the two-in/two-out pipeline: explicit
    buffers (2 double-buffered extended inputs + 2 outputs + 2 wraps) plus
    ~2 extended temporaries the update keeps live."""
    plane = ny * nz * itemsize
    T = 16
    while T > 1:
        need = (4 * (T + 2 * H) + 4 * T + 2 * H + 2 * (T + 2 * H)) * plane
        if nx % T == 0 and need <= budget:
            return T
        T //= 2
    return 1


def _launch2(kernel, a, b, sc, dots: bool, out_dtypes=None):
    """out_dtypes: per-output dtypes (default both a.dtype). An output only
    aliases its same-index input when the dtypes match (a narrower second
    output — the bf16 pre-smooth iterate — streams unaliased at half the
    bytes instead)."""
    dts = out_dtypes or (a.dtype, a.dtype)
    out_shape = [jax.ShapeDtypeStruct(a.shape, dts[0]),
                 jax.ShapeDtypeStruct(a.shape, dts[1])]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    if dots:
        out_shape.append(jax.ShapeDtypeStruct((8, 128), a.dtype))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    aliases = {}
    if jnp.dtype(dts[0]) == a.dtype:
        aliases[1] = 0
    if jnp.dtype(dts[1]) == b.dtype:
        aliases[2] = 1
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=20 * a.size,
            bytes_accessed=4 * a.size * a.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(sc, a, b)


@functools.partial(jax.jit, static_argnames=("deltas",))
def _pupd_matvec_stream(v, p, sc, deltas):
    """(A p', <p', A p'>, p') where p' = (v - zshift) + beta * p — CG's
    search-direction update fused into the matvec, with A p' written
    through v's buffer and p' through p's (both die here in CG). Streams:
    2 same-buffer pairs instead of the separate p-update's 3 streams plus
    the matvec's 2."""
    nx, ny, nz = v.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    T = _pick_T2(nx, ny, nz, v.dtype.itemsize, 1)

    def update(ve, pe_old, sc_ref, x0):
        beta = sc_ref[0]
        zs = sc_ref[1]
        pe = (ve - zs) + beta * pe_old          # T+2 extended planes
        return _star(pe, invs), pe[1:-1]        # (A p' -> v buf, p' -> p buf)

    def dotsfn(ap, pnew, ve, pe_old):
        return jnp.sum(ap * pnew), jnp.zeros((), ap.dtype)

    kernel = _make_kernel2(nx, ny, nz, T, 1, v.dtype, update, dots=dotsfn)
    ap, pnew, d = _launch2(kernel, v, p, sc, dots=True)
    return ap, d[0, 0], pnew


def pupdate_matvec_stream(v: jax.Array, p_old: jax.Array, beta, zshift,
                          deltas):
    """(p', A p', <p', A p'>) with p' = (v - zshift) + beta * p_old —
    the aliased streaming form (LinearOperator.pupdate_apply_dot order)."""
    sc = jnp.stack([jnp.asarray(beta, v.dtype),
                    jnp.asarray(zshift, v.dtype)])
    ap, pap, pnew = _pupd_matvec_stream(v, p_old, sc,
                                        tuple(float(d) for d in deltas))
    return pnew, ap, pap


@functools.partial(jax.jit, static_argnames=("deltas", "weight", "reverse",
                                             "out_dtype"))
def _zero_upd_stream(r, ap, sc, deltas, weight, reverse, out_dtype=None):
    """(b, x1, ||b||^2, sum(b)) with b = r - alpha*Ap and x1 the zero-guess
    red-black sweep for A x = b — the V-cycle's first kernel with CG's
    residual update fused in, b written through r's buffer and x1 through
    Ap's (both die here in CG).

    `out_dtype` (e.g. bfloat16) narrows x1 — the MGConfig.pre_dtype
    composition: the pre-smooth iterate's rounding is absorbed by the
    full-precision residual that follows, so x1's write (and its reads in
    the fused downward leg) cost half the bytes while b stays exact."""
    nx, ny, nz = r.shape
    invs = tuple(1.0 / float(d) ** 2 for d in deltas)
    winv = float(weight) / (-2.0 * sum(invs))
    colors = (1, 0) if reverse else (0, 1)
    T = _pick_T2(nx, ny, nz, r.dtype.itemsize, 1)
    xdt = jnp.dtype(out_dtype) if out_dtype else r.dtype

    def update(re, ape, sc_ref, x0):
        a = sc_ref[0]
        be = re - a * ape                       # T+2 extended planes
        par = _parity_x((T + 2, ny, nz), x0 - 1)
        # narrow x1: the whole sweep computes in the narrow dtype (bf16
        # VPU math; a single trailing cast trips a Mosaic mask-relayout),
        # b stays exact in r's precision
        bes = be if xdt == be.dtype else be.astype(xdt)
        dt = bes.dtype.type
        from poissbox_tpu.ops.stencil_pallas import _color_weight
        w1 = _color_weight(par, colors[0], winv, bes.dtype)
        x1 = _rb_halfstep(w1 * bes, bes[1:-1], (dt(winv) - w1)[1:-1], invs)
        return be[1:-1], x1                     # (b -> r buf, x1)

    def dotsfn(b_new, x1, re, ape):
        return jnp.sum(b_new * b_new), jnp.sum(b_new)

    kernel = _make_kernel2(nx, ny, nz, T, 1, r.dtype, update, dots=dotsfn,
                           out_dtypes=(r.dtype, xdt))
    b_new, x1, d = _launch2(kernel, r, ap, sc, dots=True,
                            out_dtypes=(r.dtype, xdt))
    return b_new, x1, d[0, 0], d[0, 1]


def sor_rb_zero_update_stream(r: jax.Array, ap: jax.Array, alpha, deltas,
                              weight: float, reverse: bool = False,
                              out_dtype=None):
    """Aliased streaming form of sor_rb_zero_update_pallas (same returns)."""
    sc = jnp.reshape(jnp.asarray(alpha, r.dtype), (1,))
    return _zero_upd_stream(r, ap, sc, tuple(float(d) for d in deltas),
                            float(weight), bool(reverse),
                            jnp.dtype(out_dtype).name if out_dtype else None)


def stream2_ok(shape, dtype) -> bool:
    """True when the aliased two-in/two-out pipeline applies (big enough
    to be HBM-bound, slab math valid)."""
    nx, ny, nz = shape
    if jax.default_backend() != "tpu":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if nx * ny * nz * itemsize < 256 * 2**20:
        return False
    T = _pick_T2(nx, ny, nz, itemsize, 1)
    return T >= 2 and nx // T >= 4


def available(shape, dtype) -> bool:
    """True when the in-place scheme applies: big enough that VMEM
    residency can't hide the two-stream wall, slab math valid."""
    nx, ny, nz = shape
    if jax.default_backend() != "tpu":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if nx * ny * nz * itemsize < 256 * 2**20:
        return False
    T = _pick_T(nx, ny, nz, itemsize, 2, 1)
    return T >= 4 and nx // T >= 4
