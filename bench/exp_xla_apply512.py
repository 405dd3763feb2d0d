"""Measure XLA-lowered 7-point stencil variants vs the Pallas apply at
512^3-class, chasing the ledger's ~2 ms/it Pallas-streaming gap
(docs/LEDGER_512.md: Pallas out-of-place pipeline measured 450-530 GB/s vs
XLA elementwise 620-660 GB/s).

Variants:
  - pallas        : production sp.apply_laplacian_pallas
  - roll          : jnp.roll shifted-adds (ops/stencil.py apply path)
  - pad-slice     : periodic jnp.pad once, 6 static slices + fused adds
  - interior+fix  : non-periodic shifts on the interior via slicing, then
                    patch the 6 wrap faces (wrap traffic is O(n^2))
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


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

    t_lo, t_hi = timed(lo), timed(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    n = args.n
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/poissbox-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from poissbox_tpu.ops import stencil_pallas as sp

    d = (1.0 / n,) * 3
    inv = jnp.float32(n * n)          # 1/dx^2 for unit cube
    diag = jnp.float32(-6.0 * n * n)
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    fs = 4 * n**3

    def rep(tag, t, passes=2.0):
        print(f"{tag:24s} {t*1e3:8.3f} ms  {passes*fs/t/1e9:7.1f} GB/s nominal",
              file=sys.stderr, flush=True)

    def roll_apply(v):
        acc = diag * v
        for ax in range(3):
            acc = acc + (jnp.roll(v, 1, ax) + jnp.roll(v, -1, ax)) * inv
        return acc

    def pad_apply(v):
        p = jnp.pad(v, 1, mode="wrap")
        acc = diag * v
        acc = acc + (p[:-2, 1:-1, 1:-1] + p[2:, 1:-1, 1:-1]) * inv
        acc = acc + (p[1:-1, :-2, 1:-1] + p[1:-1, 2:, 1:-1]) * inv
        acc = acc + (p[1:-1, 1:-1, :-2] + p[1:-1, 1:-1, 2:]) * inv
        return acc

    def shift_fix_apply(v):
        # Non-periodic shifted reads (static slices, no copy of v), wrap
        # faces patched by adding the opposite face plane afterwards.
        zero_like = lambda shp: jnp.zeros(shp, v.dtype)
        acc = diag * v
        # x axis
        up = jnp.concatenate([v[1:], v[:1]], 0)          # v[i+1] with wrap
        dn = jnp.concatenate([v[-1:], v[:-1]], 0)
        acc = acc + (up + dn) * inv
        up = jnp.concatenate([v[:, 1:], v[:, :1]], 1)
        dn = jnp.concatenate([v[:, -1:], v[:, :-1]], 1)
        acc = acc + (up + dn) * inv
        up = jnp.concatenate([v[:, :, 1:], v[:, :, :1]], 2)
        dn = jnp.concatenate([v[:, :, -1:], v[:, :, :-1]], 2)
        acc = acc + (up + dn) * inv
        return acc

    rep("pallas (production)", ktime(lambda v: sp.apply_laplacian_pallas(v, d), u))
    rep("roll", ktime(roll_apply, u))
    rep("pad-slice", ktime(pad_apply, u))
    rep("concat-shift", ktime(shift_fix_apply, u))

    # cross-check numerics
    a = sp.apply_laplacian_pallas(u, d)
    for tag, f in (("roll", roll_apply), ("pad", pad_apply), ("concat", shift_fix_apply)):
        err = float(jnp.max(jnp.abs(f(u) - a)) / jnp.max(jnp.abs(a)))
        print(f"maxrel {tag}: {err:.2e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
