"""Scaling sweeps: problem-size scan plus device-mesh weak/strong scaling.

Three modes, each emitting one JSON line per configuration:

  * size scan (default): MG-CG iterations/time vs grid size on the local
    device(s) — the mesh-independence evidence (iterations must stay O(1)).
  * --mesh: shard the solve over an N-device mesh (real chips, or a
    virtual CPU mesh via --virtual N) at fixed global size (strong) or
    fixed per-device size (weak). On a virtual CPU mesh the timings are
    meaningless but the sharded code path, collectives, and convergence
    are real — wall-clock scaling numbers require a multi-chip slice
    (BASELINE.md configs #4/#5).

Usage:
  python bench/scaling.py                      # size scan on default device
  python bench/scaling.py --mesh --virtual 8   # sharded solves, 8-CPU mesh
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _solve_config(n: int, mesh_devices: int | None, dtype_name: str,
                  rtol: float) -> dict:
    import jax
    import jax.numpy as jnp

    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.cg import cg
    from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner

    dtype = jnp.dtype(dtype_name)
    grid = Grid3D((n, n, n))
    if mesh_devices:
        grid = grid.with_mesh(devices=jax.devices()[:mesh_devices])
    A = make_laplacian_operator(grid)
    M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(), dtype=dtype)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, grid.n, dtype, -1.0, 1.0)
    b = A(grid.shard(u - jnp.mean(u)))

    solve = jax.jit(lambda bb: cg(A, bb, M=M, rtol=rtol, max_it=50))
    res = solve(b)
    float(res.residual_norm)  # compile + warm
    t0 = time.perf_counter()
    res = solve(b)
    rel = float(res.residual_norm / res.history[0])
    dt = time.perf_counter() - t0
    return {
        "n": n,
        "dof": n**3,
        "devices": mesh_devices or 1,
        "pgrid": list(grid.mesh.devices.shape) if grid.mesh else [1, 1, 1],
        "iters": int(res.iterations),
        "converged": bool(res.converged),
        "rel_residual": float(f"{rel:.3g}"),
        "solve_s": float(f"{dt:.4g}"),
        "dof_distribution": grid.dof_counts()[:8],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32,64,128")
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--rtol", type=float, default=1e-6)
    args = ap.parse_args()

    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.virtual)

    sizes = [int(s) for s in args.sizes.split(",")]
    iters_seen = []
    for n in sizes:
        devs = len(jax.devices()) if args.mesh else None
        rec = _solve_config(n, devs, args.dtype, args.rtol)
        iters_seen.append(rec["iters"])
        print(json.dumps(rec))
    # mesh-independence check: iteration spread must be tight
    spread = max(iters_seen) - min(iters_seen)
    print(json.dumps({"check": "iteration_mesh_independence",
                      "iters": iters_seen, "spread": spread,
                      "pass": spread <= 3}), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
