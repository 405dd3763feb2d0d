"""Per-kernel breakdown of the 512^3 MG-CG iteration.

242 ms / 4 iterations = 60.5 ms per iteration. This decomposes one
iteration into its memory passes (all differenced device-side) to see
what is left between the measured total and the sum of parts.

All large fields ride as ARGUMENTS of the jitted timing loops — a
closed-over 512^3 array is inlined into the HLO as a 512 MB literal,
which the remote-compile path rejects (HTTP 413).

Run: PYTHONPATH=. python bench/exp_512_breakdown.py [--n 512]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def ktime(fn, v0, *aux, lo=5, hi=20, reps=3):
    """Differenced device-side seconds/apply; fn(w, *aux) -> w-shaped."""
    def timed(iters):
        f = jax.jit(lambda v, *a: jnp.sum(
            jax.lax.fori_loop(0, iters, lambda _, w: fn(w, *a), v)))
        float(f(v0, *aux))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(v0, *aux))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def ktime_mixed(fn, v0, *aux, lo=5, hi=20, reps=3):
    """Like ktime for kernels whose output shape differs from the input:
    the carry is v itself, nudged by a data-dependent 1e-30 scalar from
    the output so XLA cannot hoist the loop-invariant call. The nudge is
    a single-element update (per-iteration cost ~0)."""
    def step(w, *a):
        out = fn(w, *a)
        return w.at[0, 0, 0].add(1e-30 * out[0, 0, 0])

    return ktime(step, v0, *aux, lo=lo, hi=hi, reps=reps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    n = args.n
    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops import stencil_inplace as si
    from poissbox_tpu.ops import stencil_pallas as sp
    from poissbox_tpu.ops.stencil import make_laplacian_operator

    grid = Grid3D((n, n, n))
    deltas = grid.deltas
    A = make_laplacian_operator(grid)
    dt = jnp.float32
    u = jax.random.uniform(jax.random.PRNGKey(0), grid.n, dt)
    b = jax.random.uniform(jax.random.PRNGKey(1), grid.n, dt)
    print(f"device: {jax.devices()[0].device_kind}  n={n}",
          file=sys.stderr, flush=True)

    def rep(tag, t, nbytes):
        print(f"{tag:28s} {t*1e3:8.3f} ms  {nbytes/t/1e9:7.1f} GB/s",
              file=sys.stderr, flush=True)

    fs = 4 * n**3  # field bytes

    rep("matvec (out-of-place)",
        ktime(lambda v: sp.apply_laplacian_pallas(v, deltas), u), 2 * fs)
    rep("matvec+dot",
        ktime(lambda v: A.apply_dot(v)[0], u), 2 * fs)
    rep("RB double sweep (in-place)",
        ktime(lambda v, a: si.sor_rb_sweep_inplace(v, a, deltas, 1.0),
              u, b), 3 * fs)
    if si.multi_ok(grid.n, dt, 3):
        rep("3 RB sweeps (fused)",
            ktime(lambda v, a: si.sor_rb_multisweep_inplace(
                v, a, deltas, 1.0, 3), u, b), 3 * fs)
    rep("residual+x-restrict",
        ktime_mixed(lambda v, a: sp.residual_xrestrict_pallas(v, a, deltas),
                    u, b), int(2.5 * fs))
    ec = jax.random.uniform(jax.random.PRNGKey(2), (n // 2, n, n), dt)
    rep("x-prolong+correct",
        ktime(lambda v, e: sp.xprolong_add_pallas(v, e), u, ec),
        int(2.5 * fs))
    alpha = jnp.float32(0.5)
    p = jax.random.uniform(jax.random.PRNGKey(3), grid.n, dt)
    ap_ = jax.random.uniform(jax.random.PRNGKey(4), grid.n, dt)

    def upd(v, pp, aa):
        x2, r2, rr, sr = sp.cg_fused_update(alpha, v, pp, v, aa)
        return x2.at[0, 0, 0].add(1e-30 * r2[0, 0, 0])
    rep("CG fused update", ktime(upd, u, p, ap_), 6 * fs)


if __name__ == "__main__":
    main()
