"""Validate + time the in-place aliased smoother kernels
(ops/stencil_inplace.py) against the out-of-place Pallas kernels, and
re-time the tridiagonal kernels with a long-device-loop protocol.

Run on the real chip: python bench/exp_inplace.py [--n 512] [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/poissbox-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from poissbox_tpu.ops import stencil_inplace as si  # noqa: E402
from poissbox_tpu.ops.stencil_pallas import (  # noqa: E402
    _jacobi, _pick_tiles, _sor_rb, jacobi_sweep_pallas, sor_rb_sweep_pallas,
)

HBM = 819.0


def robust_time(fn, u, iters=60, reps=3):
    """Single long device loop; tunnel overhead amortized."""
    f = jax.jit(lambda v, it: jnp.sum(
        jax.lax.fori_loop(0, it, lambda _, w: fn(w), v)))
    float(f(u, 3))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(u, iters))
        best = min(best, time.perf_counter() - t0)
    # subtract a short-loop run to cancel dispatch overhead
    t0 = time.perf_counter()
    float(f(u, 3))
    short = time.perf_counter() - t0
    return (best - short) / (iters - 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    deltas = (1.0 / args.n,) * 3

    # -- correctness on a small grid first (cheap compile) ---------------
    nS = 128
    dS = (1.0 / nS,) * 3
    key = jax.random.PRNGKey(0)
    uS = jax.random.uniform(key, (nS, nS, nS), jnp.float32)
    bS = jax.random.uniform(jax.random.PRNGKey(1), (nS, nS, nS), jnp.float32)

    tiles = _pick_tiles(uS)
    want = _jacobi(uS, bS, dS, 8.0 / 9.0, tiles)
    got = si.jacobi_sweep_inplace(uS, bS, dS, 8.0 / 9.0)
    dj = float(jnp.max(jnp.abs(got - want)))
    print(f"jacobi  in-place vs out: max|d| = {dj:.3e}", flush=True)

    want = _sor_rb(uS, bS, dS, 1.0, False, 8)
    got = si.sor_rb_sweep_inplace(uS, bS, dS, 1.0, False)
    ds = float(jnp.max(jnp.abs(got - want)))
    print(f"sor_rb  in-place vs out: max|d| = {ds:.3e}", flush=True)

    want = _sor_rb(uS, bS, dS, 1.0, True, 8)
    got = si.sor_rb_sweep_inplace(uS, bS, dS, 1.0, True)
    dr = float(jnp.max(jnp.abs(got - want)))
    print(f"sor_rb rev in-place vs out: max|d| = {dr:.3e}", flush=True)
    assert max(dj, ds, dr) < 1e-5, "in-place kernels disagree"

    if args.quick:
        return

    # -- timing at the target size ---------------------------------------
    n = args.n
    u = jax.random.uniform(key, (n, n, n), jnp.float32)
    b = jax.random.uniform(jax.random.PRNGKey(1), (n, n, n), jnp.float32)
    three = 3 * u.size * 4  # read u + read b + write u

    for tag, fn in [
        ("jacobi out-of-place", lambda w: _jacobi(w, b, deltas, 8.0 / 9.0,
                                                  _pick_tiles(u))),
        ("jacobi in-place", lambda w: si.jacobi_sweep_inplace(
            w, b, deltas, 8.0 / 9.0)),
        ("sor_rb out-of-place", lambda w: _sor_rb(w, b, deltas, 1.0, False,
                                                  8)),
        ("sor_rb in-place", lambda w: si.sor_rb_sweep_inplace(
            w, b, deltas, 1.0, False)),
    ]:
        try:
            t = robust_time(fn, u, iters=30 if "sor" in tag else 60)
            g = three / t / 1e9
            print(f"{tag:22s} {t*1e3:7.3f} ms  {g:6.1f} GB/s "
                  f"{g/HBM*100:5.1f}% (3-pass)", flush=True)
        except Exception as e:
            print(f"{tag:22s} FAIL {str(e).splitlines()[0][:90]}", flush=True)

    # bf16 variants
    u16, b16 = u.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    for tag, fn in [
        ("sor_rb in-place bf16", lambda w: si.sor_rb_sweep_inplace(
            w, b16, deltas, 1.0, False)),
        ("jacobi in-place bf16", lambda w: si.jacobi_sweep_inplace(
            w, b16, deltas, 8.0 / 9.0)),
    ]:
        try:
            t = robust_time(fn, u16, iters=60)
            g = 3 * u.size * 2 / t / 1e9
            print(f"{tag:22s} {t*1e3:7.3f} ms  {g:6.1f} GB/s "
                  f"{g/HBM*100:5.1f}% (3-pass bf16)", flush=True)
        except Exception as e:
            print(f"{tag:22s} FAIL {str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
