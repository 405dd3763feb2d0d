"""Experiment: batched-tridiagonal kernel tiling/algorithm sweep (round-1
VERDICT item 8: kernel at 61% of the 2-pass HBM bound; target >=70%).

Variants:
  * tile sweep (ty, tz) on the current row-at-a-time Thomas kernel;
  * input/output aliasing (halves VMEM -> bigger tiles);
  * BABE (burn-at-both-ends / twisted) factorization — forward-eliminate
    from both line ends simultaneously, meeting in the middle: half the
    sequential steps, two independent VPU updates per step.

Run: python bench/exp_tridiag.py [--n 256]
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from poissbox_tpu.ops.tridiag_pallas import PallasTridiagFactor  # noqa: E402
from poissbox_tpu.utils.profiling import kernel_time  # noqa: E402

HBM = 819.0


def time_solve(fac, u, ty, tz, alias=False):
    from poissbox_tpu.ops.tridiag_pallas import _thomas_kernel

    n = u.shape[0]
    smem = lambda length: pl.BlockSpec(
        (length,), lambda j, k: (0,), memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        _thomas_kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(u.shape[1] // ty, u.shape[2] // tz),
        in_specs=[smem(n), smem(n), smem(n), smem(n + 2),
                  pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=5 * u.size, bytes_accessed=2 * u.size * u.dtype.itemsize,
            transcendentals=0),
        input_output_aliases={4: 0} if alias else {},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )
    w = jnp.asarray(fac.w)
    binv = jnp.asarray(fac.binv)
    cb = jnp.asarray(fac.cb)
    corr = jnp.asarray(fac.corr)
    fn = lambda v: call(w, binv, cb, corr, v)
    return kernel_time(fn, u, lo=10, hi=40)


# ---------------------------------------------------------------------------
# BABE (twisted) factorization prototype
# ---------------------------------------------------------------------------
# Non-periodic twisted factorization: eliminate the sub-diagonal downward on
# rows 0..m and the super-diagonal upward on rows n-1..m, meeting at row m:
#   down:  i = 1..m:      w_i = a_i/bd_{i-1};  bd_i = b_i - w_i*c_{i-1}
#   up:    i = n-2..m:    v_i = c_i/bu_{i+1};  bu_i = b_i - v_i*a_{i+1}
#   row m couples both: bm = b_m - w_m*c_{m-1} - v_m*a_{m+1} (adjusting)
# Substitution: d-sweeps mirror, then x_m = dm/bm and back-substitute
# outward in both directions simultaneously.


def babe_factor(a, b, c):
    n = b.shape[0]
    m = (n - 2) // 2  # balances down (m) and up (n-2-m) elimination steps
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
    # middle row m: eliminated from below (w[m]) and couples to m+1 above
    vm = c[m] / bu[m + 1]
    bmid = bd[m] - vm * a[m + 1]
    return w, bd, v, bu, vm, bmid, m


def babe_solve_ref(a, b, c, d):
    """Host reference for correctness."""
    n = len(b)
    w, bd, v, bu, vm, bmid, m = babe_factor(a, b, c)
    dd = np.array(d, dtype=np.float64)
    du = np.array(d, dtype=np.float64)
    for i in range(1, m + 1):
        dd[i] = d[i] - w[i] * dd[i - 1]
    for i in range(n - 2, m, -1):
        du[i] = d[i] - v[i] * du[i + 1]
    x = np.zeros(n)
    x[m] = (dd[m] - vm * du[m + 1]) / bmid
    for i in range(m - 1, -1, -1):
        x[i] = (dd[i] - c[i] * x[i + 1]) / bd[i]
    for i in range(m + 1, n):
        x[i] = (du[i] - a[i] * x[i - 1]) / bu[i]
    return x


def _babe_kernel(wv_ref, binv_ref, ca_ref, corr_ref, d_ref, out_ref, *, m):
    """Twisted Thomas: both recurrences advance in the same fori_loop step.

    SMEM layout (length n each):
      wv:   w_i for i<=m, v_i for i>m
      binv: 1/bd_i for i<=m (1/bmid at m), 1/bu_i for i>m
      ca:   c_i for i<m (back-sub down), a_i for i>m (back-sub up)
    corr: periodic rank-1 correction as in the production kernel.
    """
    n = d_ref.shape[0]
    out_ref[0] = d_ref[0]
    out_ref[n - 1] = d_ref[n - 1]

    # elimination: down i = 1..m, up j = n-2..m+1 — one loop step advances
    # both (independent rows; they never collide since m < n-1-k range)
    kd, ku = m, n - 2 - m
    kc = min(kd, ku)

    def step(k, _):
        i = 1 + k
        j = n - 2 - k
        out_ref[i] = d_ref[i] - wv_ref[i] * out_ref[i - 1]
        out_ref[j] = d_ref[j] - wv_ref[j] * out_ref[j + 1]
        return 0

    jax.lax.fori_loop(0, kc, step, 0)
    for k in range(kc, kd):  # static tail (<= 1 step)
        i = 1 + k
        out_ref[i] = d_ref[i] - wv_ref[i] * out_ref[i - 1]
    for k in range(kc, ku):
        j = n - 2 - k
        out_ref[j] = d_ref[j] - wv_ref[j] * out_ref[j + 1]

    # middle: x_m = (dd_m - vm*du_{m+1}) * 1/bmid ; vm stored at corr[n+2]
    out_ref[m] = (out_ref[m] - corr_ref[n + 2] * out_ref[m + 1]) * binv_ref[m]

    # back substitution outward in both directions
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

    # periodic Sherman–Morrison correction (same contract as production)
    @pl.when(corr_ref[1] != 0.0)
    def _():
        factor = (out_ref[0] + corr_ref[0] * out_ref[n - 1]) * corr_ref[1]

        def corr_loop(i, _):
            out_ref[i] = out_ref[i] - corr_ref[2 + i] * factor
            return 0

        jax.lax.fori_loop(0, n, corr_loop, 0)


def babe_arrays(alpha, n, periodic=True):
    """Build the SMEM operands for the BABE kernel of the periodic
    (alpha,1,alpha) system via Sherman–Morrison (same reduction as the
    production kernel: modified diagonal + rank-1 correction)."""
    a = np.full(n, alpha)
    b = np.ones(n)
    c = np.full(n, alpha)
    corr = np.zeros(n + 3)
    if periodic:
        gamma = -b[0]
        bm = b.copy()
        bm[0] -= gamma
        bm[n - 1] -= c[n - 1] * a[0] / gamma
        u = np.zeros(n)
        u[0] = gamma
        u[n - 1] = c[n - 1]
        usol = babe_solve_ref(a, bm, c, u)
        ar = a[0] / gamma
        denom = 1.0 + usol[0] + ar * usol[n - 1]
        corr[0] = ar
        corr[1] = 1.0 / denom
        corr[2:n + 2] = usol
        b = bm
    w, bd, v, bu, vm, bmid, m = babe_factor(a, b, c)
    wv = np.where(np.arange(n) <= m, w, v)
    binv = np.zeros(n)
    binv[:m] = 1.0 / bd[:m]
    binv[m] = 1.0 / bmid
    binv[m + 1:] = 1.0 / bu[m + 1:]
    ca = np.where(np.arange(n) < m, c, a)  # c_i below m, a_i above
    ca[m] = 0.0
    corr[n + 2] = vm
    return wv, binv, ca, corr, m


def time_babe(alpha, u, ty, tz, alias=False):
    n = u.shape[0]
    wv, binv, ca, corr, m = babe_arrays(alpha, n)
    kernel = functools.partial(_babe_kernel, m=m)
    smem = lambda length: pl.BlockSpec(
        (length,), lambda j, k: (0,), memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(u.shape[1] // ty, u.shape[2] // tz),
        in_specs=[smem(n), smem(n), smem(n), smem(n + 3),
                  pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, ty, tz), lambda j, k: (0, j, k),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=5 * u.size, bytes_accessed=2 * u.size * u.dtype.itemsize,
            transcendentals=0),
        input_output_aliases={4: 0} if alias else {},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )
    args = tuple(jnp.asarray(x, u.dtype) for x in (wv, binv, ca, corr))
    fn = lambda v: call(*args, v)
    # correctness first
    x = fn(u)
    ref = PallasTridiagFactor(jnp.full((n,), alpha), jnp.ones((n,)),
                              jnp.full((n,), alpha), periodic=True)
    want = ref.solve(u, axis=0)
    err = float(jnp.max(jnp.abs(x - want))) / float(jnp.max(jnp.abs(want)))
    t = kernel_time(fn, u, lo=10, hi=40)
    return t, err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    args = ap.parse_args()
    n = args.n
    alpha = 9.0 / 62.0
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    fac = PallasTridiagFactor(jnp.full((n,), alpha), jnp.ones((n,)),
                              jnp.full((n,), alpha), periodic=True)
    bound = 2 * u.size * 4 / HBM / 1e9  # 2-pass time

    for ty, tz in [(16, 256), (8, 256), (32, 256), (16, 512), (32, 128),
                   (64, 256), (8, 512)]:
        if n % ty or n % tz or tz > n or ty > n:
            continue
        for alias in (False, True):
            tag = f"thomas ({ty:3d},{tz:3d}) alias={int(alias)}"
            try:
                t = time_solve(fac, u, ty, tz, alias)
                print(f"{tag:34s} {t*1e3:7.3f} ms  {bound/t*100:5.1f}% BW",
                      flush=True)
            except Exception as e:
                print(f"{tag:34s} FAIL {str(e).splitlines()[0][:80]}",
                      flush=True)

    for ty, tz in [(16, 256), (32, 256), (16, 512), (64, 256), (32, 512)]:
        if n % ty or n % tz or tz > n or ty > n:
            continue
        for alias in (False, True):
            tag = f"babe   ({ty:3d},{tz:3d}) alias={int(alias)}"
            try:
                t, err = time_babe(alpha, u, ty, tz, alias)
                print(f"{tag:34s} {t*1e3:7.3f} ms  {bound/t*100:5.1f}% BW "
                      f"err={err:.2e}", flush=True)
            except Exception as e:
                print(f"{tag:34s} FAIL {str(e).splitlines()[0][:80]}",
                      flush=True)


if __name__ == "__main__":
    main()


def robust_time(fn, u, iters=200, reps=5):
    """Single long device loop; tunnel overhead amortized to <1%."""
    import time
    f = jax.jit(lambda v: jnp.sum(
        jax.lax.fori_loop(0, iters, lambda _, w: fn(w), v)))
    float(f(u))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(u))
        best = min(best, time.perf_counter() - t0)
    return best / iters
