"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: 7-point stencil (matrix-free Laplacian matvec) throughput in
GDoF/s per chip on the 256^3 grid — the hot kernel of every CG iteration
(reference hot path: src/poissbox.f90:112-148 inside KSPSolve). Also runs
the 256^3 MG-CG solve (BASELINE.md config #4 single-chip) and reports its
time/iterations in the same JSON object.

The reference publishes no timings (BASELINE.md), so `vs_baseline` is a
roofline fraction: measured GDoF/s / speed-of-light GDoF/s, where
speed-of-light = HBM_BW / 8 bytes-per-DoF (one f32 read + one f32 write per
point for a perfectly fused stencil pass). Two variants are measured:
`stencil_gdofs` chains applications u <- A u (the CG-iteration usage, where
recently written blocks may still be VMEM-resident), and
`stencil_gdofs_cold` ping-pongs two buffers so every input block was
written two applications earlier and is guaranteed evicted. `vs_baseline`
reports the *cold* fraction, so it is conservative by construction and
cannot exceed 1.0 by residency effects.

Usage: python bench.py [--n 256] [--dtype float32] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


# HBM bandwidth per chip, GB/s (decimal), used only to normalize vs roofline.
HBM_GBPS = {
    "TPU v5 lite": 819.0,   # v5e
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,  # v6e
}


def _hbm_gbps() -> float:
    kind = jax.devices()[0].device_kind
    for key, bw in HBM_GBPS.items():
        if kind.startswith(key):
            return bw
    return 819.0  # conservative default


def bench_stencil(n: int, dtype, lo: int = 25, hi: int = 100) -> dict:
    """Stencil GDoF/s via differenced device-side loops: (t_hi - t_lo) /
    (hi - lo) cancels host-device roundtrip latency."""
    from poissbox_tpu.ops.stencil import apply_laplacian

    shape = (n, n, n)
    deltas = (1.0 / n,) * 3
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, shape, dtype)

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        from poissbox_tpu.ops.stencil_pallas import apply_laplacian_pallas
        fn = lambda v: apply_laplacian_pallas(v, deltas)
    else:
        fn = lambda v: apply_laplacian(v, deltas)

    from poissbox_tpu.utils.profiling import kernel_time
    per_apply = max(kernel_time(fn, u, lo=lo, hi=hi), 1e-9)

    # cold variant: ping-pong two buffers; the block read at application k
    # was written at application k-2, with two full array passes of traffic
    # in between — guaranteed evicted from VMEM for any n
    def cold_loop(iters: int) -> float:
        def body(_, vw):
            v, w = vw
            return (w, fn(v))
        f = jax.jit(lambda v, w: jnp.sum(
            jax.lax.fori_loop(0, iters, body, (v, w))[1]))
        w0 = fn(u)
        float(f(u, w0))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(u, w0))
            best = min(best, time.perf_counter() - t0)
        return best

    # adaptive count growth: small grids otherwise difference to jitter
    t_lo, t_hi = cold_loop(lo), cold_loop(hi)
    while hi < 20000 and (t_hi - t_lo) <= max(0.5 * t_lo, 0.020):
        hi *= 4
        t_hi = cold_loop(hi)
    per_cold = max((t_hi - t_lo) / (hi - lo), 1e-9)
    gdofs = n**3 / per_apply / 1e9
    gdofs_cold = n**3 / per_cold / 1e9

    # MEASURED same-access-pattern ceiling (the tridiag metric's round-3
    # honesty fix, extended to the stencil in round 4): the apply reads one
    # buffer and writes a DIFFERENT one, so its wall is the two-stream HBM
    # rate — measurably below the spec sheet at 512^3-class (~450-660 vs
    # 819 GB/s) — not the same-buffer rate a donated XLA loop carry shows.
    # The probe keeps the read buffer LIVE across the loop (output lands in
    # the dead carry's buffer; the 1e-30 carry tap defeats hoisting), which
    # is exactly the fastest any out-of-place 2-pass kernel could run. If
    # the probe still implies faster-than-spec streaming (VMEM residency at
    # small n), the ceiling falls back to the spec two-pass floor.
    scale = jnp.asarray(1.0000001192092896, dtype)
    w0 = u * scale

    def two_stream(iters: int) -> float:
        f = jax.jit(lambda w, v: jnp.sum(jax.lax.fori_loop(
            0, iters, lambda _, ww: v * scale + (1e-30 * ww[0, 0, 0]), w)))
        float(f(w0, u))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(w0, u))
            best = min(best, time.perf_counter() - t0)
        return best

    t2_lo, t2_hi = two_stream(lo), two_stream(hi)
    while hi < 20000 and (t2_hi - t2_lo) <= max(0.5 * t2_lo, 0.020):
        hi *= 4
        t2_hi = two_stream(hi)
    t_ceil = max((t2_hi - t2_lo) / (hi - lo), 1e-9)
    bpd = 2 * jnp.dtype(dtype).itemsize  # 1 read + 1 write per DoF, fused
    t_spec = n**3 * bpd / (_hbm_gbps() * 1e9)
    basis = "measured-two-stream"
    if t_ceil < t_spec:
        t_ceil, basis = t_spec, "hbm-spec-floor"
    return {"stencil_gdofs": gdofs,
            "stencil_roofline_frac": min(t_ceil / per_apply, 1.0),
            "stencil_gdofs_cold": gdofs_cold,
            "stencil_roofline_frac_cold": min(t_ceil / per_cold, 1.0),
            "stencil_ceiling_ms": t_ceil * 1e3,
            "stencil_ceiling_basis": basis,
            "stencil_time_per_apply_ms": per_apply * 1e3,
            "stencil_impl": "pallas" if on_tpu else "roll"}


def bench_mgcg(n: int, dtype, rtol: float) -> dict:
    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.cg import cg
    from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner

    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(), dtype=dtype)

    from poissbox_tpu.utils.profiling import solve_time

    solve = jax.jit(lambda b: cg(A, b, M=M, rtol=rtol, max_it=50))
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, grid.n, dtype, -1.0, 1.0)
    b = A(u - jnp.mean(u))

    dt = solve_time(solve, b)
    res = solve(b)
    rel = float(res.residual_norm / res.history[0])
    return {"mgcg_solve_s": dt, "mgcg_iters": int(res.iterations),
            "mgcg_rel_residual": rel, "mgcg_converged": bool(res.converged)}


def bench_tridiag(n: int, dtype) -> dict:
    """Batched periodic tridiagonal solve (the compact-scheme inner kernel).

    `tridiag_bw_frac` is the fraction of the MEASURED ceiling for the
    kernel's exact access pattern: a pure elementwise read+write pass
    chained over the same buffer the same way (same size, same chaining,
    same VMEM-residency opportunity) — the fastest any 2-pass in-place
    solve could possibly run here. A round-2 version divided a same-buffer
    chain by the spec-sheet HBM number and reported 1.13 of 'a bound'; a
    ping-pong 'cold' variant is unfair the other way (the aliased in-place
    kernel gets a defensive copy when both buffers stay live, measured
    169 GB/s at 512^3 vs 597 warm).

    The measured pass is only credible while it actually streams HBM. At
    sizes whose working set fits VMEM (<= ~300^3 f32 on v5e), XLA keeps
    the probe's loop-carried buffer resident and the 'pass' implies
    impossible bandwidth (5 TB/s at 256^3 — measured, bench/
    exp_ceil_probe.py), while honest streaming through a custom-call
    boundary tops out ~700 GB/s there. Detected by implied-BW > spec, the
    ceiling then falls back to the spec two-pass floor and the fraction is
    capped at 1.0 with `tridiag_ceiling_basis = 'hbm-spec-floor'`: a
    capped 1.0 means the chained in-place kernel meets or beats the HBM
    streaming wall outright by riding VMEM residency across solves
    (256^3: 1070 GB/s effective vs the 819 GB/s spec). At 512^3-class
    sizes the basis stays 'measured-pass' and the fraction is a true
    <=1 streaming efficiency (0.90 in BENCH_512_r03.json)."""
    import jax.numpy as jnp

    from poissbox_tpu.ops.tridiag import TridiagFactor
    from poissbox_tpu.ops.tridiag_pallas import PallasTridiagFactor
    from poissbox_tpu.utils.profiling import kernel_time

    a = jnp.full((n,), 9.0 / 62.0, dtype)
    b = jnp.ones((n,), dtype)
    c = jnp.full((n,), 9.0 / 62.0, dtype)
    u = jax.random.uniform(jax.random.PRNGKey(2), (n, n, n), dtype)
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        fac = PallasTridiagFactor(a, b, c, periodic=True)
    else:
        fac = TridiagFactor(a, b, c, periodic=True, method="pscan")
    t = kernel_time(lambda v: fac.solve(v, axis=0), u, lo=10, hi=40)
    # measured ceiling: one read + one write per element, chained
    # identically (the multiply keeps XLA from eliding the pass; the
    # constant is exactly representable so values stay finite)
    scale = jnp.asarray(1.0000001192092896, dtype)
    t_ceil = kernel_time(lambda v: v * scale, u, lo=10, hi=40)
    two_pass_bytes = 2 * u.size * u.dtype.itemsize
    eff = two_pass_bytes / t / 1e9
    t_spec = two_pass_bytes / (_hbm_gbps() * 1e9)
    basis = "measured-pass"
    if t_ceil < t_spec:  # probe rode loop-carried VMEM residency
        t_ceil, basis = t_spec, "hbm-spec-floor"
    return {"tridiag_ms": t * 1e3, "tridiag_ceiling_ms": t_ceil * 1e3,
            "tridiag_ceiling_basis": basis,
            "tridiag_eff_gbps": eff,
            "tridiag_bw_frac": min(t_ceil / t, 1.0)}


def bench_compact(n: int, dtype) -> dict:
    """6th-order compact Laplacian (18 batched line solves + transposes)."""
    from poissbox_tpu.ops import compact
    from poissbox_tpu.utils.profiling import kernel_time

    u = jax.random.uniform(jax.random.PRNGKey(3), (n, n, n), dtype)
    deltas = (1.0 / n,) * 3
    t = kernel_time(lambda v: compact.lapl(v, deltas), u, lo=2, hi=8)
    return {"compact_lapl_ms": t * 1e3,
            "compact_lapl_gdofs": n**3 / t / 1e9}


def bench_fft(n: int, dtype) -> dict:
    """FFT direct solve (exact for the periodic case) — the fastest path
    on the benchmark problem."""
    import jax.numpy as jnp

    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.fft import poisson_solve_fft
    from poissbox_tpu.utils.profiling import kernel_time

    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    u = jax.random.uniform(jax.random.PRNGKey(4), grid.n, dtype, -1.0, 1.0)
    b = A(u - jnp.mean(u))
    x = poisson_solve_fft(b, grid.deltas)
    rel = float(jnp.linalg.norm((A(x) - b).ravel())
                / jnp.linalg.norm(b.ravel()))
    t = kernel_time(lambda v: poisson_solve_fft(v, grid.deltas), b,
                    lo=5, hi=20)
    return {"fft_solve_ms": t * 1e3, "fft_rel_residual": rel}


def bench_f64(n: int, rtol: float = 1e-10) -> dict:
    """f64 MG-CG solve — the reference's precision of record (`pb_dp`,
    reference src/constants.f90:15) on TPU via XLA's f64 emulation (the
    Pallas kernels are dtype-gated to the XLA paths, constants.mosaic_ok).
    Validates that the deep-tolerance solve converges on hardware; the
    absolute time is emulation-bound, not a roofline metric."""
    jax.config.update("jax_enable_x64", True)
    out = bench_mgcg(n, jnp.float64, rtol)
    return {("f64_" + k): v for k, v in out.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--quick", "--smoke", action="store_true",
                    help="64^3 only (fast sanity run)")
    args = ap.parse_args()
    try:
        # persistent compilation cache: repeat runs (and the driver's
        # end-of-round run) skip the slow first-compile through the tunnel
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/poissbox-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.dtype(args.dtype)
    n = 64 if args.quick else args.n

    info = {"device": jax.devices()[0].device_kind, "n": n,
            "dtype": str(dtype)}
    print(f"bench: {info}", file=sys.stderr)

    st = bench_stencil(n, dtype)
    print(f"stencil: {st}", file=sys.stderr)
    mg = bench_mgcg(n, dtype, args.rtol)
    print(f"mgcg: {mg}", file=sys.stderr)
    td = bench_tridiag(n, dtype)
    print(f"tridiag: {td}", file=sys.stderr)
    cp = bench_compact(n, dtype)
    print(f"compact: {cp}", file=sys.stderr)
    ft = bench_fft(n, dtype)
    print(f"fft: {ft}", file=sys.stderr)
    f64 = {}
    if args.dtype == "float32":
        # f64 row (the reference's pb_dp precision of record) at a fixed
        # modest size — emulated on TPU, so kept out of the headline
        f64 = bench_f64(64 if args.quick else 128)
        print(f"f64: {f64}", file=sys.stderr)

    record = {
        "metric": f"stencil_gdofs_{n}",
        "value": round(st["stencil_gdofs"], 3),
        "unit": "GDoF/s",
        # the reference publishes no timings (BASELINE.md), so this is the
        # *cold-pass* HBM-roofline fraction — conservative by construction
        "vs_baseline": round(st["stencil_roofline_frac_cold"], 4),
        **{k: (float(f"{v:.6g}") if isinstance(v, float) else v)
           for k, v in {**st, **mg, **td, **cp, **ft, **f64,
                        **info}.items()},
    }
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
