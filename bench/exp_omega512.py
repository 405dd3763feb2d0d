"""SOR over-relaxation sweep at the flagship grid: can omega > 1 recover
4-iteration convergence at V(2,2) cost (512^3, rtol 1e-6)? Prints one JSON
line per omega with iters and differenced solve time."""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/poissbox-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.stencil import make_laplacian_operator
from poissbox_tpu.solvers.cg import cg
from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
from poissbox_tpu.utils.profiling import solve_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    omegas = [float(w) for w in (sys.argv[2].split(",") if len(sys.argv) > 2
                                 else ["1.0", "1.1", "1.2", "1.3"])]
    dtype = jnp.float32
    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    u = jax.random.uniform(jax.random.PRNGKey(1), grid.n, dtype, -1.0, 1.0)
    b = A(u - jnp.mean(u))
    for omega in omegas:
        cfg = MGConfig(damping=omega)
        M = make_mg_preconditioner(grid.n, grid.deltas, cfg, dtype=dtype)
        solve = jax.jit(lambda bb, M=M: cg(A, bb, M=M, rtol=1e-6, max_it=50))
        res = solve(b)
        iters = int(res.iterations)
        rel = float(res.residual_norm / res.history[0])
        dt = solve_time(solve, b)
        print(json.dumps({"omega": omega, "n": n,
                          "pre": M.config.pre_smooth,
                          "iters": iters, "rel": rel,
                          "solve_ms": dt * 1e3}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
