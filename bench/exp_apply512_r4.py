"""A/B the 512^3-class plain apply / matvec+dot tiling (VERDICT r3 item 4).

At 512^3 the plain apply runs the paneled scheme (tiles (8, 64): y-halo
slabs amplify reads by 1.25x on top of the x amplification) and records
3.5 ms = 304 GB/s nominal. The fused residual+x-restrict kernel, which
uses FULL-PLANE x-slabs with a roomy explicit VMEM reservation, streams
at 446 GB/s. This measures the apply and apply+dot under full-plane
x-slab tiles of several widths against the production pick.

Run: PYTHONPATH=/root/.axon_site:. python bench/exp_apply512_r4.py [--n 512]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def ktime(fn, v0, *aux, lo=5, hi=20, reps=3):
    def timed(iters):
        f = jax.jit(lambda v, *a: jnp.sum(
            jax.lax.fori_loop(0, iters, lambda _, w: fn(w, *a), v)))
        float(f(v0, *aux))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(v0, *aux))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    n = args.n
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/poissbox-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from poissbox_tpu.ops import stencil_pallas as sp

    deltas = (1.0 / n,) * 3
    d = tuple(float(x) for x in deltas)
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    fs = 4 * n**3

    def rep(tag, t, nominal_passes=2.0):
        print(f"{tag:34s} {t*1e3:8.3f} ms  "
              f"{nominal_passes*fs/t/1e9:7.1f} GB/s nominal",
              file=sys.stderr, flush=True)

    rep("apply (production pick)",
        ktime(lambda v: sp.apply_laplacian_pallas(v, d), u))
    rep("apply+dot (production pick)",
        ktime(lambda v: sp.apply_laplacian_dot_pallas(v, d)[0], u))

    for tx in (2, 4, 8, 16):
        if n % tx:
            continue
        try:
            t = ktime(lambda v, a=tx: sp._apply(v, d, (a, n)), u)
            rep(f"apply  full-plane slab tx={tx}", t)
        except Exception as e:
            print(f"apply tx={tx} FAIL: {str(e).splitlines()[0][:90]}",
                  file=sys.stderr, flush=True)
        try:
            t = ktime(lambda v, a=tx: sp._apply_dot(v, d, (a, n))[0], u)
            rep(f"apply+dot full-plane slab tx={tx}", t)
        except Exception as e:
            print(f"apply+dot tx={tx} FAIL: {str(e).splitlines()[0][:90]}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
