"""Anatomy of the compact-Laplacian PCR kernels — DMA floor vs VPU work.

Round 4 regrouped the 6th-order Laplacian to 2 kernels / 6 HBM passes yet
256^3 stayed ~3.0 ms: the claim is the kernels are VPU-(rotate+FMA)-bound,
not bandwidth-bound. This measures each kernel against ablated variants
sharing the same tiling/grid: pure copy (memory floor), RHS-evaluation
only (roll+combine, no PCR solve), and the production chain — attributing
the time to DMA / RHS rolls / PCR elimination steps.

Run: PYTHONPATH=/root/.axon_site:. python bench/exp_compact_anatomy.py [--n 256]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ktime(fn, v0, lo=5, hi=20, reps=3):
    def timed(iters):
        f = jax.jit(lambda v: jnp.sum(
            jax.lax.fori_loop(0, iters, lambda _, w: fn(w), v)))
        float(f(v0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(v0))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(hi) - timed(lo)) / (hi - lo), 1e-12)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    args = ap.parse_args()
    n = args.n
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/poissbox-jax-cache")
    except Exception:
        pass
    from poissbox_tpu.ops import compact_pcr as cp

    d = (1.0 / n,) * 3
    rt = cp._dtype_rtol(jnp.float32)
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)

    izz = (cp.interp_spec(-1, n, rt), cp.interp_spec(+1, n, rt))
    gzz = (cp.grad_spec(d[2], -1, n, rt), cp.grad_spec(d[2], +1, n, rt))

    def launch_front(kern, n_out):
        return lambda v: cp._yz_call(kern, [v], n_out)

    # production front kernel (1r2w): all z+y operator pairs
    front = functools.partial(cp._yz_lapl_kernel, izz=izz, gzz=gzz,
                              iyy=izz, gyy=gzz)

    def t_of(fn, outsel=0):
        def step(v):
            out = fn(v)
            leaf = out[outsel] if isinstance(out, (tuple, list)) else out
            return v.at[0, 0, 0].add(1e-30 * leaf[0, 0, 0])
        return ktime(step, u)

    t_full = t_of(launch_front(front, 2))
    print(f"front production (10 axis-ops) {t_full*1e3:8.3f} ms",
          file=sys.stderr, flush=True)

    # ablation: same outputs, RHS evaluations only (PCR steps skipped) —
    # isolates the elimination-step cost

    def rhs_only(spec):
        a, b, opsign, shift, sched = spec
        return (a, b, opsign, shift, ((), sched[1], 0.0))  # empty schedule

    izz0 = tuple(rhs_only(s) for s in izz)
    gzz0 = tuple(rhs_only(s) for s in gzz)
    front0 = functools.partial(cp._yz_lapl_kernel, izz=izz0, gzz=gzz0,
                               iyy=izz0, gyy=gzz0)
    t_rhs = t_of(launch_front(front0, 2))
    print(f"front RHS-only (no PCR)        {t_rhs*1e3:8.3f} ms",
          file=sys.stderr, flush=True)

    # ablation: pure copy through the same tiling (memory floor)
    def copy_kernel(f_ref, o1_ref, o2_ref):
        o1_ref[:] = f_ref[:] * 2.0
        o2_ref[:] = f_ref[:] * 0.5

    t_copy = t_of(launch_front(copy_kernel, 2))
    print(f"front copy (memory floor)      {t_copy*1e3:8.3f} ms",
          file=sys.stderr, flush=True)

    print(f"attribution: DMA {t_copy*1e3:.2f} + RHS rolls "
          f"{(t_rhs-t_copy)*1e3:.2f} + PCR steps {(t_full-t_rhs)*1e3:.2f} "
          f"= {t_full*1e3:.2f} ms", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
