"""Pallas batched tridiagonal solver — the TPU-native Thomas kernel.

The XLA paths in :mod:`poissbox_tpu.ops.tridiag` evaluate the Thomas
recurrences with `lax.scan` (2n dependent steps, carry round-trips through
HBM) or `lax.associative_scan` (log n full-array passes). Both are
bandwidth-wasteful: a tridiagonal solve is 2 passes of data at
speed-of-light. This kernel gets there by keeping whole *lines* resident in
VMEM:

  * layout: lines along axis 0 (major), batch tiled over (y, z) =
    (sublane, lane) — each grid step owns an (n, TY, TZ) block;
  * the RHS-independent factorization (w, 1/bmod, c — precomputed once per
    coefficient set, as in ops.tridiag.TridiagFactor) sits in SMEM and is
    read scalar-by-scalar while both sweeps run as n-step `fori_loop`s of
    (TY, TZ) VPU ops entirely in VMEM;
  * the periodic (Sherman–Morrison) variant applies the rank-1 correction
    in the same kernel from the precomputed auxiliary solution
    (reference algorithm: src/tridsol.f90:34-74).

HBM traffic: read d + write x = the 2-pass minimum.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poissbox_tpu.ops.tridiag import _factor_1d

Array = jax.Array


def _bwd_and_corr(binv_ref, cb_ref, corr_ref, out_ref, n):
    """Back substitution + periodic correction in place on out_ref (which
    must hold the forward-eliminated RHS).

    SMEM scalars per row i: binv[i] = 1/bmod[i], cb[i] = c[i]/bmod[i]
    (zeroed at i = n-1). corr_ref holds the periodic correction:
    corr[0] = alpha_ratio, corr[1] = 1/denom, corr[2 + i] = usol[i];
    corr[1] = 0 disables it.
    """
    # backward sweep: x_i = binv_i * dmod_i - cb_i * x_{i+1}
    out_ref[n - 1] = out_ref[n - 1] * binv_ref[n - 1]

    def bwd(k, _):
        i = n - 2 - k
        out_ref[i] = out_ref[i] * binv_ref[i] - cb_ref[i] * out_ref[i + 1]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)

    # periodic rank-1 correction: x -= usol * (x_0 + ar*x_{n-1}) / denom
    @pl.when(corr_ref[1] != 0.0)
    def _():
        factor = (out_ref[0] + corr_ref[0] * out_ref[n - 1]) * corr_ref[1]

        def corr(i, _):
            out_ref[i] = out_ref[i] - corr_ref[2 + i] * factor
            return 0

        jax.lax.fori_loop(0, n, corr, 0)


def _thomas_kernel(w_ref, binv_ref, cb_ref, corr_ref, d_ref, out_ref):
    """Solve against a plain RHS block."""
    n = d_ref.shape[0]
    out_ref[0] = d_ref[0]

    # forward sweep: dmod_i = d_i - w_i * dmod_{i-1}
    def fwd(i, _):
        out_ref[i] = d_ref[i] - w_ref[i] * out_ref[i - 1]
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)
    _bwd_and_corr(binv_ref, cb_ref, corr_ref, out_ref, n)


def _babe_kernel(wv_ref, binv_ref, ca_ref, corr_ref, d_ref, out_ref, *, m):
    """Twisted (burn-at-both-ends) factorization solve: the sub-diagonal is
    eliminated downward on rows 0..m and the super-diagonal upward on rows
    n-1..m+1, meeting at row m — each fori_loop step advances BOTH
    recurrences (independent rows), halving the sequential depth that makes
    the row-at-a-time Thomas sweep VPU-latency-bound.

    SMEM layout (length n each):
      wv:   w_i for i <= m, v_i for i > m      (elimination multipliers)
      binv: 1/bd_i for i < m, 1/bmid at m, 1/bu_i for i > m
      ca:   c_i for i < m, a_i for i > m, 0 at m (back-substitution taps)
    corr: periodic rank-1 correction as in _bwd_and_corr, with the extra
    middle coupling vm stored at corr[n + 2].
    """
    n = d_ref.shape[0]
    out_ref[0] = d_ref[0]
    out_ref[n - 1] = d_ref[n - 1]

    kd, ku = m, n - 2 - m
    kc = min(kd, ku)

    def elim(k, _):
        i = 1 + k
        j = n - 2 - k
        out_ref[i] = d_ref[i] - wv_ref[i] * out_ref[i - 1]
        out_ref[j] = d_ref[j] - wv_ref[j] * out_ref[j + 1]
        return 0

    jax.lax.fori_loop(0, kc, elim, 0)
    for k in range(kc, kd):  # static tail (<= 1 step)
        i = 1 + k
        out_ref[i] = d_ref[i] - wv_ref[i] * out_ref[i - 1]
    for k in range(kc, ku):
        j = n - 2 - k
        out_ref[j] = d_ref[j] - wv_ref[j] * out_ref[j + 1]

    # middle row couples both sweeps: x_m = (dd_m - vm*du_{m+1}) / bmid
    out_ref[m] = (out_ref[m] - corr_ref[n + 2] * out_ref[m + 1]) * binv_ref[m]

    bd_, bu_ = m, n - 1 - m
    bc = min(bd_, bu_)

    def back(k, _):
        i = m - 1 - k
        j = m + 1 + k
        out_ref[i] = (out_ref[i] - ca_ref[i] * out_ref[i + 1]) * binv_ref[i]
        out_ref[j] = (out_ref[j] - ca_ref[j] * out_ref[j - 1]) * binv_ref[j]
        return 0

    jax.lax.fori_loop(0, bc, back, 0)
    for k in range(bc, bd_):
        i = m - 1 - k
        out_ref[i] = (out_ref[i] - ca_ref[i] * out_ref[i + 1]) * binv_ref[i]
    for k in range(bc, bu_):
        j = m + 1 + k
        out_ref[j] = (out_ref[j] - ca_ref[j] * out_ref[j - 1]) * binv_ref[j]

    @pl.when(corr_ref[1] != 0.0)
    def _():
        factor = (out_ref[0] + corr_ref[0] * out_ref[n - 1]) * corr_ref[1]

        def corr(i, _):
            out_ref[i] = out_ref[i] - corr_ref[2 + i] * factor
            return 0

        jax.lax.fori_loop(0, n, corr, 0)


def _compact_thomas_kernel(w_ref, binv_ref, cb_ref, corr_ref, f_ref, out_ref,
                           *, a, b, opsign, shift):
    """Fused compact-scheme apply: the staggered RHS
    (reference eval_1d_rhs, src/compact_schemes.f90:332-372) is evaluated
    plane-at-a-time *inside* the forward sweep — lines are axis 0 and fully
    block-resident, so rhs_i reads its four periodic taps directly from the
    field block with no materialized shift copies (whole-block rolls would
    blow the VMEM budget). HBM traffic: read f + write x, the 2-pass
    minimum (the unfused path pays ~6 passes materializing the RHS)."""
    n = f_ref.shape[0]
    s = float(opsign)

    def rhs_at(i):
        return (a * (f_ref[(i + shift) % n] + s * f_ref[(i + shift - 1) % n])
                + b * (f_ref[(i + shift + 1) % n]
                       + s * f_ref[(i + shift - 2) % n]))

    out_ref[0] = rhs_at(0)

    # forward sweep fused with RHS evaluation
    def fwd(i, _):
        out_ref[i] = rhs_at(i) - w_ref[i] * out_ref[i - 1]
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)
    _bwd_and_corr(binv_ref, cb_ref, corr_ref, out_ref, n)


def _rhs_taps(f_at, n, a, b, opsign, shift):
    """Staggered compact RHS row evaluator from a tap accessor
    f_at(row) (reference eval_1d_rhs, src/compact_schemes.f90:332-372)."""
    s = float(opsign)

    def rhs(i):
        return (a * (f_at((i + shift) % n) + s * f_at((i + shift - 1) % n))
                + b * (f_at((i + shift + 1) % n)
                       + s * f_at((i + shift - 2) % n)))

    return rhs


def _compact_thomas2_kernel(w1, binv1, cb1, corr1, w2, binv2, cb2, corr2,
                            f_ref, out1_ref, out2_ref, *, spec1, spec2):
    """Dual fused compact apply: TWO operators (different coefficient sets
    AND factorizations — e.g. grad_1d + interp_1d of the same sweep,
    reference src/compact_schemes.f90:60-66) from ONE resident read of the
    field block. Both forward recurrences advance in the same loop step
    (independent), so the per-row loop overhead is amortized 2x and HBM
    traffic is 3 passes (read f, write 2) instead of 4."""
    n = f_ref.shape[0]
    rhs1 = _rhs_taps(lambda i: f_ref[i], n, *spec1)
    rhs2 = _rhs_taps(lambda i: f_ref[i], n, *spec2)
    out1_ref[0] = rhs1(0)
    out2_ref[0] = rhs2(0)

    def fwd(i, _):
        out1_ref[i] = rhs1(i) - w1[i] * out1_ref[i - 1]
        out2_ref[i] = rhs2(i) - w2[i] * out2_ref[i - 1]
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)
    _bwd_and_corr(binv1, cb1, corr1, out1_ref, n)
    _bwd_and_corr(binv2, cb2, corr2, out2_ref, n)


def _compact_chain_kernel(w1, binv1, cb1, corr1, w2, binv2, cb2, corr2,
                          f_ref, out_ref, mid_ref, *, spec1, spec2):
    """Chained fused compact apply: op2(op1(f)) along the SAME axis — the
    grad_x -> div_x (and interp -> interp') pairs of the compact Laplacian
    (reference src/compact_schemes.f90:32-33 composes div(grad)). The
    intermediate line lives in VMEM scratch; HBM traffic is the 2-pass
    minimum (read f, write out) instead of 4."""
    n = f_ref.shape[0]
    rhs1 = _rhs_taps(lambda i: f_ref[i], n, *spec1)
    mid_ref[0] = rhs1(0)

    def fwd1(i, _):
        mid_ref[i] = rhs1(i) - w1[i] * mid_ref[i - 1]
        return 0

    jax.lax.fori_loop(1, n, fwd1, 0)
    _bwd_and_corr(binv1, cb1, corr1, mid_ref, n)

    rhs2 = _rhs_taps(lambda i: mid_ref[i], n, *spec2)
    out_ref[0] = rhs2(0)

    def fwd2(i, _):
        out_ref[i] = rhs2(i) - w2[i] * out_ref[i - 1]
        return 0

    jax.lax.fori_loop(1, n, fwd2, 0)
    _bwd_and_corr(binv2, cb2, corr2, out_ref, n)


def _compact_sum_kernel(w1, binv1, cb1, corr1, w2, binv2, cb2, corr2,
                        fa_ref, fb_ref, f3_ref, out_ref, acc_ref,
                        *, spec1, spec2):
    """Final-sweep fusion of the compact divergence (reference
    src/compact_schemes.f90:247-252): out = op1(fa + fb) + op2(f3) in one
    kernel — the summed RHS uses linearity (rhs(fa+fb) = taps of fa + fb
    read per row), both solves run fused, and the two results add in VMEM.
    HBM: 3 reads + 1 write instead of ~9 passes for the unfused chain."""
    n = fa_ref.shape[0]
    rhs1 = _rhs_taps(lambda i: fa_ref[i] + fb_ref[i], n, *spec1)
    rhs2 = _rhs_taps(lambda i: f3_ref[i], n, *spec2)
    acc_ref[0] = rhs1(0)
    out_ref[0] = rhs2(0)

    def fwd(i, _):
        acc_ref[i] = rhs1(i) - w1[i] * acc_ref[i - 1]
        out_ref[i] = rhs2(i) - w2[i] * out_ref[i - 1]
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)
    _bwd_and_corr(binv1, cb1, corr1, acc_ref, n)
    _bwd_and_corr(binv2, cb2, corr2, out_ref, n)
    out_ref[:] = out_ref[:] + acc_ref[:]


def _launch_tridiag(kernel, w, binv, cb, corr, d, ty: int, tz: int) -> Array:
    n, ny, nz = d.shape
    smem = lambda length: pl.BlockSpec(
        (length,), lambda j, k: (0,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(d.shape, d.dtype),
        grid=(ny // ty, nz // tz),
        in_specs=[
            smem(n), smem(n), smem(n), smem(corr.shape[0]),
            pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=5 * d.size, bytes_accessed=2 * d.size * d.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(w, binv, cb, corr, d)


@functools.partial(jax.jit, static_argnames=("ty", "tz"))
def _solve_blocks(w, binv, cb, corr, d, ty: int, tz: int) -> Array:
    return _launch_tridiag(_thomas_kernel, w, binv, cb, corr, d, ty, tz)


def _pcr_kernel(d_ref, out_ref, *, sched, scale):
    from poissbox_tpu.ops.compact_pcr import _vpcr
    out_ref[:] = _vpcr(d_ref[:] * scale, 0, sched, pallas=True)


@functools.partial(jax.jit, static_argnames=("ty", "tz", "sched", "scale"))
def _solve_pcr_blocks(d, ty: int, tz: int, sched, scale: float) -> Array:
    """Circulant-PCR solve along axis 0 — no SMEM factors, no recurrence;
    one read + one write per line (see ops.compact_pcr docstring for the
    scalar-coefficient schedule)."""
    n, ny, nz = d.shape
    blk = pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                       memory_space=pltpu.VMEM)
    nsteps = len(sched[0])
    return pl.pallas_call(
        functools.partial(_pcr_kernel, sched=sched, scale=scale),
        out_shape=jax.ShapeDtypeStruct(d.shape, d.dtype),
        grid=(ny // ty, nz // tz),
        in_specs=[blk],
        out_specs=blk,
        # write range == read range per block (no halos), so solving
        # through d's buffer is safe — and beyond-VMEM batches then run at
        # the same-buffer HBM rate instead of the two-stream wall
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=(3 * nsteps + 2) * d.size,
            bytes_accessed=2 * d.size * d.dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",  # CPU tests
    )(d)


@functools.partial(jax.jit, static_argnames=("ty", "tz", "m"))
def _solve_babe_blocks(wv, binv, ca, corr, d, ty: int, tz: int,
                       m: int) -> Array:
    kernel = functools.partial(_babe_kernel, m=m)
    return _launch_tridiag(kernel, wv, binv, ca, corr, d, ty, tz)


def _babe_factor_np(a, b, c):
    """Twisted-factorization setup (numpy, once): downward elimination on
    rows 0..m, upward on n-1..m+1, coupled at the middle row m."""
    import numpy as np

    n = len(b)
    m = (n - 2) // 2
    w = np.zeros(n)
    bd = np.array(b, dtype=np.float64)
    for i in range(1, m + 1):
        w[i] = a[i] / bd[i - 1]
        bd[i] = b[i] - w[i] * c[i - 1]
    v = np.zeros(n)
    bu = np.array(b, dtype=np.float64)
    for i in range(n - 2, m, -1):
        v[i] = c[i] / bu[i + 1]
        bu[i] = b[i] - v[i] * a[i + 1]
    vm = c[m] / bu[m + 1]
    bmid = bd[m] - vm * a[m + 1]
    return w, bd, v, bu, vm, bmid, m


def _babe_solve_np(a, b, c, d):
    """Host reference solve with the twisted factorization (setup only)."""
    import numpy as np

    n = len(b)
    w, bd, v, bu, vm, bmid, m = _babe_factor_np(a, b, c)
    dd = np.array(d, dtype=np.float64)
    for i in range(1, m + 1):
        dd[i] = d[i] - w[i] * dd[i - 1]
    du = np.array(d, dtype=np.float64)
    for i in range(n - 2, m, -1):
        du[i] = d[i] - v[i] * du[i + 1]
    x = np.zeros(n)
    x[m] = (dd[m] - vm * du[m + 1]) / bmid
    for i in range(m - 1, -1, -1):
        x[i] = (dd[i] - c[i] * x[i + 1]) / bd[i]
    for i in range(m + 1, n):
        x[i] = (du[i] - a[i] * x[i - 1]) / bu[i]
    return x


@functools.partial(jax.jit, static_argnames=("ty", "tz", "a", "b", "opsign",
                                             "shift"))
def _solve_compact_blocks(w, binv, cb, corr, f, ty: int, tz: int,
                          a: float, b: float, opsign: int, shift: int) -> Array:
    kernel = functools.partial(_compact_thomas_kernel, a=a, b=b,
                               opsign=opsign, shift=shift)
    return _launch_tridiag(kernel, w, binv, cb, corr, f, ty, tz)


def _fused_tiles(n: int, ny: int, nz: int, itemsize: int,
                 nblocks: int) -> tuple[int, int]:
    """(ty, tz) for the multi-block fused kernels: `nblocks` counts
    double-buffered VMEM blocks of (n, ty, tz) in flight."""
    budget = 17 * 1024 * 1024
    tz = min(nz, 256)
    while nz % tz:
        tz //= 2
    ty = min(ny, 16)
    while ny % ty:
        ty //= 2
    # Mosaic requires the (sublane, lane) dims of a 3-D block to be
    # multiples of (8, 128) unless they span the whole axis: shrink tz
    # toward 128 first, then ty, never below the hardware tile.
    slab = 16 if itemsize < 4 else 8   # bf16 sublane tile is 16 rows
    ty_min = slab if ny >= slab and ny % slab == 0 else ty
    tz_min = 128 if nz >= 128 and nz % 128 == 0 else tz
    while nblocks * n * ty * tz * itemsize > budget:
        if tz > tz_min:
            tz //= 2
        elif ty > ty_min:
            ty //= 2
        else:
            break
    return max(ty, 1), max(tz, 1)


def _factor_smem_args(fac) -> tuple:
    ensure = getattr(fac, "_ensure_thomas", None)
    if ensure is not None:
        ensure()
    return tuple(jnp.asarray(v) for v in (fac.w, fac.binv, fac.cb, fac.corr))


def _launch_fused(kernel, smem_lens, vmem_in, n_out, scratch, args,
                  ty: int, tz: int):
    n, ny, nz = vmem_in[0].shape
    dtype = vmem_in[0].dtype
    smem = lambda length: pl.BlockSpec(
        (length,), lambda j, k: (0,), memory_space=pltpu.SMEM)
    vblk = pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                        memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct(vmem_in[0].shape, dtype)
                      for _ in range(n_out))
    passes = len(vmem_in) + n_out
    # scoped-vmem reservation (same policy as stencil_pallas._scoped_vmem):
    # large-plane grids (640^3-class: n*ty*tz blocks of 2.6 MB) overflow
    # the 16 MB default stack (observed 22.5M at 640^3)
    nblk = len(vmem_in) + n_out + scratch
    bb = nblk * n * ty * tz * dtype.itemsize
    params = {}
    if int(2.25 * bb) > 16 * 2**20:
        params = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=min(6 * bb, 100 * 2**20))}
    return pl.pallas_call(
        kernel,
        out_shape=out_shape[0] if n_out == 1 else out_shape,
        grid=(ny // ty, nz // tz),
        in_specs=[smem(le) for le in smem_lens] + [vblk] * len(vmem_in),
        out_specs=vblk if n_out == 1 else (vblk,) * n_out,
        scratch_shapes=[pltpu.VMEM((n, ty, tz), dtype)] * scratch,
        **params,
        cost_estimate=pl.CostEstimate(
            flops=5 * passes * vmem_in[0].size,
            bytes_accessed=passes * vmem_in[0].size * dtype.itemsize,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(*args, *vmem_in)


@functools.partial(jax.jit, static_argnames=("spec1", "spec2", "ty", "tz"))
def _dual_blocks(s1, s2, f, spec1, spec2, ty, tz):
    kernel = functools.partial(_compact_thomas2_kernel, spec1=spec1,
                               spec2=spec2)
    lens = (len(s1[0]), len(s1[1]), len(s1[2]), len(s1[3])) * 2
    return _launch_fused(kernel, lens, [f], 2, 0, s1 + s2, ty, tz)


@functools.partial(jax.jit, static_argnames=("spec1", "spec2", "ty", "tz"))
def _chain_blocks(s1, s2, f, spec1, spec2, ty, tz):
    kernel = functools.partial(_compact_chain_kernel, spec1=spec1,
                               spec2=spec2)
    lens = (len(s1[0]), len(s1[1]), len(s1[2]), len(s1[3])) * 2
    return _launch_fused(kernel, lens, [f], 1, 1, s1 + s2, ty, tz)


@functools.partial(jax.jit, static_argnames=("spec1", "spec2", "ty", "tz"))
def _sum_blocks(s1, s2, fa, fb, f3, spec1, spec2, ty, tz):
    kernel = functools.partial(_compact_sum_kernel, spec1=spec1, spec2=spec2)
    lens = (len(s1[0]), len(s1[1]), len(s1[2]), len(s1[3])) * 2
    return _launch_fused(kernel, lens, [fa, fb, f3], 1, 1, s1 + s2, ty, tz)


def compact_dual(f: Array, fac1, spec1, fac2, spec2) -> tuple[Array, Array]:
    """(op1(f), op2(f)) along axis 0 of a lines-major 3-D field — one fused
    kernel pass (3 HBM passes for two operators). spec = (a, b, opsign,
    shift) of the staggered compact RHS; fac = the operator's
    PallasTridiagFactor."""
    n, ny, nz = f.shape
    ty, tz = _fused_tiles(n, ny, nz, f.dtype.itemsize, 6)
    return _dual_blocks(_factor_smem_args(fac1), _factor_smem_args(fac2),
                        f, tuple(spec1), tuple(spec2), ty, tz)


def compact_chain(f: Array, fac1, spec1, fac2, spec2) -> Array:
    """op2(op1(f)) along axis 0 — both solves in one kernel with the
    intermediate line in VMEM scratch (2 HBM passes total)."""
    n, ny, nz = f.shape
    ty, tz = _fused_tiles(n, ny, nz, f.dtype.itemsize, 5)
    return _chain_blocks(_factor_smem_args(fac1), _factor_smem_args(fac2),
                         f, tuple(spec1), tuple(spec2), ty, tz)


def compact_sum(fa: Array, fb: Array, f3: Array, fac1, spec1,
                fac2, spec2) -> Array:
    """op1(fa + fb) + op2(f3) along axis 0 in one kernel (4 HBM passes)."""
    n, ny, nz = fa.shape
    ty, tz = _fused_tiles(n, ny, nz, fa.dtype.itemsize, 9)
    return _sum_blocks(_factor_smem_args(fac1), _factor_smem_args(fac2),
                       fa, fb, f3, tuple(spec1), tuple(spec2), ty, tz)


class PallasTridiagFactor:
    """Drop-in analogue of ops.tridiag.TridiagFactor backed by the Pallas
    kernel. Solves along axis 0 natively; other axes are moved to the front
    (XLA transpose) — callers wanting zero-copy should present lines-major
    data (the pencil layout of parallel.pencil)."""

    def __init__(self, a, b, c, periodic: bool, algorithm: str = "auto"):
        a = jnp.asarray(a)
        b = jnp.asarray(b)
        c = jnp.asarray(c)
        a, b, c = jnp.broadcast_arrays(a, b, c)
        n = b.shape[0]
        self.n = n
        self.dtype = b.dtype
        if algorithm == "auto":
            # circulant constant symmetric systems (the compact-scheme
            # case) take the scan-free PCR kernel; everything else Thomas
            algorithm = ("pcr" if self._pcr_eligible(a, b, c, periodic)
                         else "thomas")
        self.algorithm = algorithm
        if algorithm not in ("thomas", "babe", "pcr"):
            raise ValueError(f"unknown tridiag algorithm {algorithm!r}")
        if algorithm == "pcr":
            import numpy as np
            if not self._pcr_eligible(a, b, c, periodic):
                raise ValueError(
                    "pcr needs a periodic constant symmetric diagonally "
                    "dominant system of power-of-two size")
            from poissbox_tpu.ops.compact_pcr import pcr_schedule
            av = float(np.asarray(a)[0])
            bv = float(np.asarray(b)[0])
            rtol = float(jnp.finfo(self.dtype).eps) * 0.25
            self.pcr_sched = pcr_schedule(av / bv, n, rtol)
            self.pcr_scale = 1.0 / bv
        # The Thomas factorization (incl. the scan-based periodic aux
        # solve) is only needed by the thomas/babe kernels and the fused
        # compact entry points — build it lazily for pcr instances
        self._abc = (a, b, c, periodic)
        if algorithm != "pcr":
            self._thomas_setup()

    def _thomas_setup(self) -> None:
        a, b, c, periodic = self._abc
        n = self.n
        if not periodic:
            w, bmod = _factor_1d(a, b, c)
            corr = jnp.zeros((n + 2,), b.dtype)
        else:
            gamma = -b[0]
            bmod0 = b.at[0].add(-gamma).at[n - 1].add(-(c[n - 1] * a[0] / gamma))
            w, bmod = _factor_1d(a, bmod0, c)
            u = jnp.zeros_like(b).at[0].set(gamma).at[n - 1].set(c[n - 1])
            # auxiliary solve (host-side, once) against the same factorization
            usol = self._solve_ref(w, bmod, c, u[:, None, None])[:, 0, 0]
            ar = a[0] / gamma
            denom = 1.0 + usol[0] + ar * usol[n - 1]
            corr = jnp.concatenate([jnp.stack([ar, 1.0 / denom]), usol])
        self.w = w
        self.binv = 1.0 / bmod
        self.cb = (c * self.binv).at[-1].set(0.0)
        self.corr = corr
        if self.algorithm == "babe":
            import numpy as np
            self._babe_setup(np.asarray(a, np.float64),
                             np.asarray(b, np.float64),
                             np.asarray(c, np.float64), periodic)

    def _ensure_thomas(self) -> None:
        if not hasattr(self, "w"):
            self._thomas_setup()

    def _babe_setup(self, a, b, c, periodic: bool) -> None:
        """Precompute the twisted-factorization SMEM operands (numpy,
        setup time); periodic systems use the same Sherman-Morrison
        reduction as the Thomas path but with the twisted aux solve."""
        import numpy as np

        n = self.n
        corr = np.zeros(n + 3)
        bmod = np.array(b, dtype=np.float64)
        if periodic:
            gamma = -b[0]
            bmod[0] -= gamma
            bmod[n - 1] -= c[n - 1] * a[0] / gamma
            u = np.zeros(n)
            u[0] = gamma
            u[n - 1] = c[n - 1]
            usol = _babe_solve_np(a, bmod, c, u)
            ar = a[0] / gamma
            denom = 1.0 + usol[0] + ar * usol[n - 1]
            corr[0] = ar
            corr[1] = 1.0 / denom
            corr[2:n + 2] = usol
        w, bd, v, bu, vm, bmid, m = _babe_factor_np(a, bmod, c)
        idx = np.arange(n)
        wv = np.where(idx <= m, w, v)
        binv = np.zeros(n)
        binv[:m] = 1.0 / bd[:m]
        binv[m] = 1.0 / bmid
        binv[m + 1:] = 1.0 / bu[m + 1:]
        ca = np.where(idx < m, c, a)
        ca[m] = 0.0
        corr[n + 2] = vm
        self.babe_m = m
        self.babe_wv = jnp.asarray(wv, self.dtype)
        self.babe_binv = jnp.asarray(binv, self.dtype)
        self.babe_ca = jnp.asarray(ca, self.dtype)
        self.babe_corr = jnp.asarray(corr, self.dtype)

    @staticmethod
    def _solve_ref(w, bmod, c, d):
        """XLA reference solve used only at setup time."""
        from poissbox_tpu.ops.tridiag import _apply_bwd, _apply_fwd
        return _apply_bwd(bmod, c, _apply_fwd(w, d, 0, "seq"), 0, "seq")

    def _tiles(self, ny: int, nz: int, itemsize: int) -> tuple[int, int]:
        """Largest (ty, tz) tile dividing (ny, nz) that keeps the
        double-buffered in+out blocks under the VMEM budget. Measured
        optimum at 256^3 f32 is (16, 256) — 63% of HBM bandwidth."""
        # (16, 256) at n = 256 compiles and is the measured optimum
        # (0.26 ms, 63% BW); the nominal 4*blocks accounting slightly
        # overestimates what Mosaic actually allocates, so the budget sits
        # just above it. (32, 256) at n = 256 genuinely OOMs VMEM.
        budget = 17 * 1024 * 1024
        tz = min(nz, 256)
        while nz % tz:
            tz //= 2
        ty = min(ny, 16)
        while ny % ty:
            ty //= 2
        while ty > 1 and 4 * self.n * ty * tz * itemsize > budget:
            ty //= 2
        return max(ty, 1), max(tz, 1)

    def _run(self, d: Array, axis: int, ty, tz, block_call) -> Array:
        """Shared layout plumbing: move `axis` to the front, batch-factor
        into lane-friendly (ny, nz), run `block_call`, restore."""
        axis = axis % d.ndim
        orig_shape = d.shape
        moved = d.ndim != 3 or axis != 0
        if moved:
            d = jnp.moveaxis(d, axis, 0).reshape(self.n, -1)
            flat = d.shape[1]
            # factor the batch into (ny, nz) with nz a multiple of 128 when
            # possible (lane-friendly), padding the remainder
            nz = 128 if flat >= 128 else flat
            pad = (-flat) % nz
            if pad:
                d = jnp.pad(d, ((0, 0), (0, pad)))
            d = d.reshape(self.n, -1, nz)
        n, ny, nz = d.shape
        ty_, tz_ = (ty, tz) if ty and tz else self._tiles(ny, nz,
                                                          d.dtype.itemsize)
        x = block_call(d.astype(self.dtype), ty_, tz_)
        if moved:
            flat = 1
            for i, s in enumerate(orig_shape):
                if i != axis:
                    flat *= s
            x = x.reshape(self.n, -1)[:, :flat]
            x = x.reshape((self.n,) + tuple(
                s for i, s in enumerate(orig_shape) if i != axis))
            x = jnp.moveaxis(x, 0, axis)
        return x

    @staticmethod
    def _pcr_eligible(a, b, c, periodic: bool) -> bool:
        # tile-safe n (power of two or multiple of 128): the truncated PCR
        # schedule is n-agnostic (circulant elimination is exact operator
        # algebra for any stride mod n; see compact_pcr.pcr_schedule), so
        # sizes like 640 = 5*128 take the same scan-free path instead of
        # cliffing onto Thomas — but Mosaic's roll lowering hangs compiles
        # at unaligned extents (compact_pcr._tile_ok), which fall back.
        import numpy as np

        from poissbox_tpu.ops.compact_pcr import _tile_ok
        n = b.shape[0]
        if (not periodic or not _tile_ok(n)
                or jnp.dtype(b.dtype).itemsize > 4):
            return False
        an, bn, cn = (np.asarray(v) for v in (a, b, c))
        const = (np.all(an == an[0]) and np.all(bn == bn[0])
                 and np.all(cn == cn[0]) and an[0] == cn[0])
        return bool(const and 2.0 * abs(an[0]) < abs(bn[0]))

    def solve(self, d: Array, axis: int = 0,
              ty: Optional[int] = None, tz: Optional[int] = None) -> Array:
        """Solve along `axis` of a 3-D (or 1-D/2-D, auto-expanded) RHS."""
        if self.algorithm == "pcr":
            def run_pcr(d3, ty_, tz_):
                # the PCR body keeps ~3 rolled temporaries live per block
                # on top of in+out, so halve the Thomas-sized tile until
                # ~6 double-buffered blocks fit the 16M VMEM budget
                n = d3.shape[0]
                item = d3.dtype.itemsize
                while ty_ > 8 and 12 * n * ty_ * tz_ * item > 15 * 2**20:
                    ty_ //= 2
                while tz_ > 128 and 12 * n * ty_ * tz_ * item > 15 * 2**20:
                    tz_ //= 2
                return _solve_pcr_blocks(d3, ty_, tz_, self.pcr_sched,
                                         self.pcr_scale)
            return self._run(d, axis, ty, tz, run_pcr)
        if self.algorithm == "babe":
            return self._run(
                d, axis, ty, tz,
                lambda d3, ty_, tz_: _solve_babe_blocks(
                    self.babe_wv, self.babe_binv, self.babe_ca,
                    self.babe_corr, d3, ty_, tz_, self.babe_m))
        self._ensure_thomas()
        return self._run(
            d, axis, ty, tz,
            lambda d3, ty_, tz_: _solve_blocks(
                self.w, self.binv, self.cb, self.corr, d3, ty_, tz_))

    def solve_compact(self, f: Array, a: float, b: float, opsign: int,
                      shift: int, axis: int = 0,
                      ty: Optional[int] = None, tz: Optional[int] = None) -> Array:
        """Fused compact-scheme application: staggered-RHS evaluation + solve
        in one kernel pass over the raw field.

        NOTE: valid only when `axis` lines are contiguous in the kernel
        block, i.e. the field is 3-D with axis == 0, or 1-D — the periodic
        RHS shifts happen along axis 0 of the block. Other layouts must use
        the unfused path (RHS built in XLA, then .solve)."""
        if f.ndim == 3 and axis % 3 == 0:
            self._ensure_thomas()
            return self._run(
                f, 0, ty, tz,
                lambda f3, ty_, tz_: _solve_compact_blocks(
                    self.w, self.binv, self.cb, self.corr, f3, ty_, tz_,
                    float(a), float(b), int(opsign), int(shift)))
        raise ValueError("solve_compact requires a 3-D field with axis=0; "
                         "move the axis first or use the unfused path")
