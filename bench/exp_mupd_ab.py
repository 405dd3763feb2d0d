"""A/B: full M-side fusion (r-update + reductions inside the V-cycle's
zero-guess kernel, apply_update_dots) vs the fused_update + apply_dots
path, interleaved within one session."""

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
    A = make_laplacian_operator(grid)
    M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(), dtype=dtype)
    assert getattr(M, "apply_update_dots", None) is not None

    def M_noupd(r):
        return M(r)
    M_noupd.apply_dots = M.apply_dots

    u = jax.random.uniform(jax.random.PRNGKey(1), grid.n, dtype, -1.0, 1.0)
    b = A(u - jnp.mean(u))
    solves = {
        "mupd": jax.jit(lambda bb: cg(A, bb, M=M, rtol=1e-6, max_it=50)),
        "dots": jax.jit(lambda bb: cg(A, bb, M=M_noupd, rtol=1e-6,
                                      max_it=50)),
    }
    for _ in range(reps):
        for name, s in solves.items():
            res = s(b)
            dt = solve_time(s, b)
            print(json.dumps({"variant": name, "n": n,
                              "iters": int(res.iterations),
                              "rel": float(res.residual_norm
                                           / res.history[0]),
                              "solve_ms": dt * 1e3}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
