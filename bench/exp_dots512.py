"""512^3 MG-CG with the fused coupling-dots preconditioner: V(1,1) vs
V(2,2), iteration robustness across RHS seeds, and the solve time with
apply_dots active (cg picks it up automatically)."""

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
    sweep_list = [int(s) for s in (sys.argv[2].split(",")
                                   if len(sys.argv) > 2 else ["1", "2"])]
    nseeds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    dtype = jnp.float32
    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    for sweeps in sweep_list:
        cfg = MGConfig(pre_smooth=sweeps, post_smooth=sweeps)
        M = make_mg_preconditioner(grid.n, grid.deltas, cfg, dtype=dtype)
        assert getattr(M, "apply_dots", None) is not None
        solve = jax.jit(lambda bb, M=M: cg(A, bb, M=M, rtol=1e-6, max_it=50))
        iters, rels = [], []
        b0 = None
        for seed in range(1, nseeds + 1):
            u = jax.random.uniform(jax.random.PRNGKey(seed), grid.n, dtype,
                                   -1.0, 1.0)
            b = A(u - jnp.mean(u))
            if b0 is None:
                b0 = b
            res = solve(b)
            iters.append(int(res.iterations))
            rels.append(float(res.residual_norm / res.history[0]))
        dt = solve_time(solve, b0)
        print(json.dumps({"sweeps": sweeps, "n": n, "iters": iters,
                          "rels": [float(f"{r:.3g}") for r in rels],
                          "solve_ms": dt * 1e3}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
