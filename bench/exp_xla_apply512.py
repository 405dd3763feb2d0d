"""Measure XLA-lowered 7-point stencil variants vs the Pallas apply at
512^3-class, chasing the ledger's ~2 ms/it Pallas-streaming gap
(docs/LEDGER_512.md: Pallas out-of-place pipeline measured 450-530 GB/s vs
XLA elementwise 620-660 GB/s).

Variants:
  - pallas        : production sp.apply_laplacian_pallas
  - roll          : jnp.roll shifted-adds (ops/stencil.py apply path)
  - pad-slice    : periodic jnp.pad once, 6 static slices + fused adds
  - concat-shift : wrap shifts materialized as concat(face, body) per axis
  - interior+fix : in-place window adds on the interior (no wrap copies),
                   then 6 O(n^2) face patches for the periodic wrap
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def ktime(fn, v0, lo=5, hi=20, reps=3, scale=1.0):
    # `scale` renormalizes the chained operator so f32 values stay finite
    # (the raw stencil's spectral radius ~8n^2 overflows in ~6 chained
    # applications; TPU throughput is inf-insensitive but the harness
    # shouldn't rely on that)
    s = jnp.float32(scale)

    def timed(iters):
        f = jax.jit(lambda v: jnp.sum(
            jax.lax.fori_loop(0, iters, lambda _, w: fn(w) * s, v)))
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

    def concat_shift_apply(v):
        # Wrap shifts materialized as concat(face, body) per axis — the
        # full-volume concat lowering (NOT interior+fix; that is below).
        acc = diag * v
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

    def interior_fix_apply(v):
        # The true interior+fix lowering: windowed in-place adds with NO
        # wrap copies of the volume; the periodic wrap is patched by 6
        # O(n^2) face-plane adds.
        acc = diag * v
        for ax in range(3):
            lo = tuple(slice(0, n - 1) if i == ax else slice(None)
                       for i in range(3))
            hi = tuple(slice(1, None) if i == ax else slice(None)
                       for i in range(3))
            first = tuple(slice(0, 1) if i == ax else slice(None)
                          for i in range(3))
            last = tuple(slice(n - 1, n) if i == ax else slice(None)
                         for i in range(3))
            acc = acc.at[lo].add(v[hi] * inv)      # up-neighbor, interior
            acc = acc.at[hi].add(v[lo] * inv)      # down-neighbor, interior
            acc = acc.at[last].add(v[first] * inv)  # wrap faces
            acc = acc.at[first].add(v[last] * inv)
        return acc

    # renormalize chained applies so f32 values stay finite (ADVICE r4)
    sc = 1.0 / (8.0 * n * n)
    rep("pallas (production)",
        ktime(lambda v: sp.apply_laplacian_pallas(v, d), u, scale=sc))
    rep("roll", ktime(roll_apply, u, scale=sc))
    rep("pad-slice", ktime(pad_apply, u, scale=sc))
    rep("concat-shift", ktime(concat_shift_apply, u, scale=sc))
    rep("interior+fix", ktime(interior_fix_apply, u, scale=sc))

    # cross-check numerics
    a = sp.apply_laplacian_pallas(u, d)
    for tag, f in (("roll", roll_apply), ("pad", pad_apply),
                   ("concat", concat_shift_apply),
                   ("interior+fix", interior_fix_apply)):
        err = float(jnp.max(jnp.abs(f(u) - a)) / jnp.max(jnp.abs(a)))
        print(f"maxrel {tag}: {err:.2e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
