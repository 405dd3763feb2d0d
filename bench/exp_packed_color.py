"""Packed-color (octant) red-black sweep experiment — the 512^3 ledger's
one open lever (docs/LEDGER_512.md: the masked RB half-step computes the
full star at EVERY point and throws half away; a packed sweep would halve
the ~1 ms/half-step VPU star arithmetic, worth ~2 ms/it).

Layout: the 8-way parity split X[pi,pj,pk][a,b,c] = x[2a+pi, 2b+pj, 2c+pk]
(each octant (n/2)^3). The red set {pi+pj+pk even} = {eee, eoo, oeo, ooe}.
A red half-step updates exactly the n^3/2 red points: each neighbor term
is the partner octant (parity flipped on one axis), aligned or rolled by
one — no masks, half the star arithmetic, and 2n^3 words of traffic per
half-step vs the dense masked form's 3n^3.

Measured variants at --n (default 512):
  masked-pallas   : production sor_rb_multisweep_pallas, per half-step
  octant-xla      : red+black packed half-steps as plain XLA ops
  convert         : one-time dense <-> octant conversion cost (amortizes
                    over the whole V-cycle only if every level op is
                    reworked to the packed layout)

Decision input for the ledger: if octant-xla (an upper bound a dedicated
Pallas kernel could tighten) does not decisively beat the masked Pallas
half-step, the lever is rejected with numbers.
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

RED = ((0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0))
BLACK = ((1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1))


def ktime(fn, v0, *consts, lo=3, hi=9, reps=3):
    """Differenced chained timing; `consts` are passed as real jit
    arguments (closure-captured 512^3 arrays would be embedded as program
    constants and blow the remote-compile payload limit). The result is
    reduced to a scalar and pulled to the HOST: on the tunneled backend
    `block_until_ready` does not synchronize — only host transfers do."""
    def timed(iters):
        def run(v, *cs):
            out = jax.lax.fori_loop(0, iters,
                                    lambda _, w: fn(w, *cs), v)
            return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))

        f = jax.jit(run)
        float(f(v0, *consts))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(v0, *consts))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def octant_split(x):
    return {p: x[p[0]::2, p[1]::2, p[2]::2] for p in RED + BLACK}


def octant_merge(oct, n):
    out = jnp.zeros((n, n, n), next(iter(oct.values())).dtype)
    for p, v in oct.items():
        out = out.at[p[0]::2, p[1]::2, p[2]::2].set(v)
    return out


def half_step(oct, rhs, colors, invs, winv):
    """Update `colors` octants in place (functionally) from their partners."""
    new = dict(oct)
    for p in colors:
        s = None
        for ax in range(3):
            q = list(p)
            q[ax] ^= 1
            P = oct[tuple(q)]
            if p[ax] == 0:
                up, dn = P, jnp.roll(P, 1, ax)
            else:
                up, dn = jnp.roll(P, -1, ax), P
            t = (up + dn) * invs[ax]
            s = t if s is None else s + t
        X = oct[p]
        diag = -2.0 * sum(invs)
        new[p] = X + winv * (rhs[p] - s - diag * X)
    return new


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
    invs = [float(n * n)] * 3
    diag = -2.0 * sum(invs)
    winv = 1.0 / diag
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    b = jax.random.uniform(jax.random.PRNGKey(1), (n, n, n), jnp.float32)

    def rep(tag, t, note=""):
        print(f"{tag:22s} {t*1e3:8.3f} ms {note}", file=sys.stderr, flush=True)

    # 1. production masked Pallas sweep (1 sweep = 2 half-steps)
    t = ktime(lambda v, bb: sp.sor_rb_multisweep_pallas(v, bb, d, 1.0, 1),
              u, b)
    rep("masked-pallas sweep", t, f"({t/2*1e3:.3f} ms/half-step)")

    # 2. octant-packed sweep in XLA
    oct_u = octant_split(u)
    oct_b = {p: jax.device_put(v) for p, v in octant_split(b).items()}

    def packed_sweep(oct, rhs):
        oct = half_step(oct, rhs, RED, invs, winv)
        return half_step(oct, rhs, BLACK, invs, winv)

    t = ktime(packed_sweep, oct_u, oct_b)
    rep("octant-xla sweep", t, f"({t/2*1e3:.3f} ms/half-step)")

    # 3. conversion cost (round trip)
    t = ktime(lambda v: octant_merge(octant_split(v), n), u)
    rep("convert roundtrip", t)

    # numeric cross-check vs the dense masked formulation
    from poissbox_tpu.ops.stencil import apply_laplacian
    ii = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, u.shape, 2)
    red_m = (((ii + jj + kk) % 2) == 0).astype(u.dtype)
    want = u + winv * red_m * (b - apply_laplacian(u, d))
    got = octant_merge(half_step(oct_u, oct_b, RED, invs, winv), n)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"maxabs red half-step vs dense masked: {err:.2e}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
