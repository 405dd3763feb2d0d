"""A/B: deferred p-update (fused into the matvec kernel) vs the eager
3-stream p-update pass, interleaved within one session."""

import dataclasses
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dtype = jnp.float32
    grid = Grid3D((n, n, n))
    A_on = make_laplacian_operator(grid)
    A_off = dataclasses.replace(A_on, pupdate_apply_dot=None)
    M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(), dtype=dtype)
    u = jax.random.uniform(jax.random.PRNGKey(1), grid.n, dtype, -1.0, 1.0)
    b = A_on(u - jnp.mean(u))
    solves = {
        "defer": jax.jit(lambda bb: cg(A_on, bb, M=M, rtol=1e-6, max_it=50)),
        "eager": jax.jit(lambda bb: cg(A_off, bb, M=M, rtol=1e-6, max_it=50)),
    }
    for _ in range(reps):
        for name, s in solves.items():
            res = s(b)
            dt = solve_time(s, b)
            print(json.dumps({"variant": name, "n": n,
                              "iters": int(res.iterations),
                              "solve_ms": dt * 1e3}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
