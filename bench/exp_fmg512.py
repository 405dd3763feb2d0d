import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/poissbox-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.stencil import make_laplacian_operator
from poissbox_tpu.solvers.cg import cg
from poissbox_tpu.solvers import mg as mgm
from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
from poissbox_tpu.utils.profiling import solve_time

n = 512
grid = Grid3D((n,n,n))
A = make_laplacian_operator(grid)
cfg = mgm._resolve_sweeps(MGConfig(), grid.n)
import dataclasses
cfg = dataclasses.replace(cfg, pre_dtype="bfloat16")
levels = mgm._build_levels(grid.n, grid.deltas, cfg)
pinv = mgm._coarse_pinv(levels[-1], cfg, jnp.float32)
M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(), dtype=jnp.float32)

def fmg(b):
    # restrict RHS down the hierarchy
    bs = [b]
    for idx in range(len(levels) - 1):
        bs.append(mgm.restrict_mm(bs[-1]) if True else mgm.restrict(bs[-1]))
    x = (pinv @ bs[-1].reshape(-1).astype(pinv.dtype)).reshape(levels[-1].shape).astype(b.dtype)
    for idx in range(len(levels) - 2, -1, -1):
        x = mgm.prolong_mm(x)
        r = bs[idx] - mgm._lapl(x, levels[idx], cfg)
        x = x + mgm.v_cycle(levels, pinv, cfg, r, idx)
    return x

u = jax.random.uniform(jax.random.PRNGKey(1), grid.n, jnp.float32, -1, 1)
b = A(u - jnp.mean(u))

solve0 = jax.jit(lambda rhs: cg(A, rhs, M=M, rtol=1e-6, max_it=50))
def _solve_fmg(rhs):
    x0 = fmg(rhs)
    return cg(A, rhs, x0, M=M, rtol=1e-6, max_it=50)
solve1 = jax.jit(_solve_fmg)

r0 = solve0(b); print("zero-start iters", int(r0.iterations), flush=True)
r1 = solve1(b); print("fmg-start iters", int(r1.iterations), "rel", float(r1.residual_norm)/float(jnp.linalg.norm(b.ravel())), flush=True)
# fmg residual quality alone
xf = jax.jit(fmg)(b)
relf = float(jnp.linalg.norm((A(xf)-b).ravel())/jnp.linalg.norm(b.ravel()))
print("fmg x0 rel residual:", relf, flush=True)
for rep in range(2):
    t0 = solve_time(solve0, b); print(f"rep{rep} zero-start {t0*1e3:.1f} ms", flush=True)
    t1 = solve_time(solve1, b); print(f"rep{rep} fmg-start  {t1*1e3:.1f} ms", flush=True)
