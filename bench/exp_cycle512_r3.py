"""Cycle-shape sweep at 512^3 (round 3): can a W-cycle (or 2 cycles per
application) drop the V(2,2) iteration count 5 -> 4 for a net win?
Existing kernels only — each config is one XLA-glue recompile."""

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


CONFIGS = {
    "v22": MGConfig(pre_smooth=2, post_smooth=2),
    "w22d1": MGConfig(pre_smooth=2, post_smooth=2, cycle="w", w_depth=1),
    "w22d2": MGConfig(pre_smooth=2, post_smooth=2, cycle="w", w_depth=2),
    "v22x2": MGConfig(pre_smooth=2, post_smooth=2, cycles=2),
    "v33": MGConfig(pre_smooth=3, post_smooth=3),
    "w11d2": MGConfig(pre_smooth=1, post_smooth=1, cycle="w", w_depth=2),
    "v11": MGConfig(pre_smooth=1, post_smooth=1),
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(CONFIGS)
    dtype = jnp.float32
    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    u = jax.random.uniform(jax.random.PRNGKey(1), grid.n, dtype, -1.0, 1.0)
    b = A(u - jnp.mean(u))
    for name in names:
        cfg = CONFIGS[name]
        M = make_mg_preconditioner(grid.n, grid.deltas, cfg, dtype=dtype)
        solve = jax.jit(lambda bb, M=M: cg(A, bb, M=M, rtol=1e-6, max_it=50))
        res = solve(b)
        iters = int(res.iterations)
        rel = float(res.residual_norm / res.history[0])
        dt = solve_time(solve, b)
        print(json.dumps({"cfg": name, "n": n, "iters": iters, "rel": rel,
                          "solve_ms": dt * 1e3}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
