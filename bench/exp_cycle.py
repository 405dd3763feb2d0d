"""Experiment: cycle shape vs iteration count at the 512^3 tail.

The 512^3 MG-CG wall sits at ~241 ms = 4 outer iterations of a V(3,3)
cycle whose fine level already runs at the HBM two-stream wall. The only
lever left is trading cheap coarse work for outer iterations: a W-cycle
revisits sub-fine levels twice (each 8x cheaper per level), strengthening
the coarse correction; if that drops 4 iterations to 3 the wall moves by
~25% minus the ~15% W surcharge.

Run: python bench/exp_cycle.py [--n 512] [--rtol 1e-6]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def run(n: int, rtol: float, **mg_kw) -> dict:
    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.cg import cg
    from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner

    dtype = jnp.float32
    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(**mg_kw),
                               dtype=dtype)
    solve = jax.jit(lambda b: cg(A, b, M=M, rtol=rtol, max_it=40))
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, grid.n, dtype, -1.0, 1.0)
    b = A(u - jnp.mean(u))

    def once() -> float:
        t0 = time.perf_counter()
        res = solve(b)
        float(res.residual_norm)
        return time.perf_counter() - t0

    once()
    dt = min(once() for _ in range(3))
    res = solve(b)
    true_rel = float(jnp.linalg.norm((A(res.x) - b).ravel())
                     / jnp.linalg.norm(b.ravel()))
    return {"t_ms": dt * 1e3, "iters": int(res.iterations),
            "true_rel": true_rel, "converged": bool(res.converged)}


CONFIGS = [
    ("V(3,3)          ", dict()),
    ("W(3,3) d2       ", dict(cycle="w")),
    ("W(2,2) d2       ", dict(cycle="w", pre_smooth=2, post_smooth=2)),
    ("W(3,3) d1       ", dict(cycle="w", w_depth=1)),
    ("W(3,3) d3       ", dict(cycle="w", w_depth=3)),
    ("V(2,2)          ", dict(pre_smooth=2, post_smooth=2)),
    ("V(3,3) pre=bf16 ", dict(pre_dtype="bfloat16")),
    ("W(3,3) pre=bf16 ", dict(cycle="w", pre_dtype="bfloat16")),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[512])
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--configs", type=int, nargs="+",
                    default=list(range(len(CONFIGS))))
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr,
          flush=True)
    for n in args.n:
        for i in args.configs:
            label, kw = CONFIGS[i]
            r = run(n, args.rtol, **kw)
            print(f"n={n} {label}: {r['t_ms']:8.2f} ms  {r['iters']:3d} it  "
                  f"true={r['true_rel']:.2e} conv={r['converged']}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
