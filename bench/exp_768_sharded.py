"""768^3 sharded MG-CG on the virtual 8-device mesh — the capacity proof.

README documents that 768^3 (1.8 GB/field f32) exhausts the 16 GB HBM of
one v5e chip on every solver path; the sharded mesh path is the story past
that wall. VERDICT r3 item 6: that claim was untested at the size that
motivates it. This script runs the COMPLETE sharded MG-CG solve at 768^3
over an 8-device virtual CPU mesh (2.2 GB per device-shard of the 5-6 live
fields — exactly the footprint a (4,2,1) v5e pod slice would hold at
~2.2 GB/chip) and records the convergence gate.

Run:  python bench/exp_768_sharded.py [--n 768] [--rtol 1e-6]
Writes one JSON line to stdout (recorded as MULTICHIP_768_r04.json).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=768)
    ap.add_argument("--rtol", type=float, default=1e-6)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass
    import jax.numpy as jnp

    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.cg import cg
    from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner

    n = args.n
    grid = Grid3D((n, n, n)).with_mesh()
    pgrid = tuple(grid.mesh.shape[name] for name in grid.axis_names)
    print(f"768-capacity: {len(jax.devices())} devices, pgrid={pgrid}, "
          f"{grid.ndof/1e6:.0f}M DoF, "
          f"{grid.ndof*4/len(jax.devices())/2**30:.2f} GiB/device/field",
          file=sys.stderr, flush=True)

    A = make_laplacian_operator(grid)
    M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(),
                               dtype=jnp.float32, grid=grid)

    @jax.jit
    def step(b):
        res = cg(A, b, M=M, rtol=args.rtol, max_it=25)
        return res.x, res.residual_norm, res.history[0], res.reason, \
            res.iterations

    key = jax.random.PRNGKey(0)
    # mean-free manufactured RHS, built sharded (no replicated 1.8 GB array
    # on one device)
    u = grid.random(key, jnp.float32)
    b = A(A.project(u))
    del u
    t0 = time.time()
    x, rnorm, r0, reason, iters = step(b)
    jax.block_until_ready(x)
    wall = time.time() - t0
    rel = float(rnorm) / max(float(r0), 1e-300)
    ok = int(reason) > 0 and rel <= args.rtol * 1.01
    rec = {"n": n, "pgrid": list(pgrid), "devices": len(jax.devices()),
           "platform": jax.devices()[0].platform,
           "iters": int(iters), "rel_residual": rel,
           "reason": int(reason), "converged": ok,
           "wall_s_incl_compile": round(wall, 1),
           "cycle": f"V({M.config.pre_smooth},{M.config.post_smooth})"}
    print(json.dumps(rec))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
