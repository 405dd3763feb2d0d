"""Experiment: does flexible CG (Polak-Ribiere beta) legalize bf16 V-cycles?

Round-2 measurement: plain CG with an MGConfig(dtype="bfloat16")
preconditioner stalls near ~5e-6 relative residual — the bf16 cycle's
application-dependent rounding makes M effectively nonstationary, which
breaks the Fletcher-Reeves recursion. Flexible CG is the textbook fix
(Notay, SIAM J. Sci. Comput. 22(4), 2000). This experiment measures, on the
real chip:

    for n in {256, 512}:
        cg  + f32  cycle   (round-2 production config: the number to beat)
        cg  + bf16 cycle   (expected: stall / max_it at rtol 1e-6)
        fcg + bf16 cycle   (hypothesis: converges, cheaper per cycle)
        fcg + f32  cycle   (fcg overhead: one extra reduction/iter)

Run: python bench/exp_fcg.py [--n 256 512] [--rtol 1e-6]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def run(n: int, rtol: float, flexible: bool, mg_dtype: str) -> dict:
    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.cg import cg
    from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner

    dtype = jnp.float32
    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(dtype=mg_dtype),
                               dtype=dtype)
    solve = jax.jit(lambda b: cg(A, b, M=M, rtol=rtol, max_it=40,
                                 flexible=flexible))
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
    rel = float(res.residual_norm / res.history[0])
    true_rel = float(jnp.linalg.norm((A(res.x) - b).ravel())
                     / jnp.linalg.norm(b.ravel()))
    return {"t_ms": dt * 1e3, "iters": int(res.iterations), "rel": rel,
            "true_rel": true_rel, "converged": bool(res.converged)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[256, 512])
    ap.add_argument("--rtol", type=float, default=1e-6)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    for n in args.n:
        for label, flex, mgdt in (("cg +f32 ", False, ""),
                                  ("cg +bf16", False, "bfloat16"),
                                  ("fcg+bf16", True, "bfloat16"),
                                  ("fcg+f32 ", True, "")):
            r = run(n, args.rtol, flex, mgdt)
            print(f"n={n} {label}: {r['t_ms']:8.2f} ms  {r['iters']:3d} it  "
                  f"rel={r['rel']:.2e} true={r['true_rel']:.2e} "
                  f"conv={r['converged']}", file=sys.stderr)


if __name__ == "__main__":
    main()
