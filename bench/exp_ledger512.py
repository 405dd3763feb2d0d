"""Per-iteration byte/time LEDGER for the flagship MG-CG solve.

VERDICT r3 item 1: the 512^3 MG-CG iteration ran ~27.5 ms while its
kernels' memory floors summed to ~17 ms. This script measures every stage
of the REAL iteration composition — round 4: eager p/x updates, the
ALIASED streaming zero-guess kernel with bf16 pre-smooth output (the
512^3-class default), the fused downward/upward legs — its minimum HBM
bytes, and the measured ceiling for its access pattern, then cross-checks
the sum of stages against the measured whole.

Stages of one 512^3 CG iteration (auto cfg: V(1,1), pre_dtype=bf16):
  1. matvec+dot        Ap, <p, Ap>             (A.apply_dot, big-slab tiles)
  2. x-update          x + alpha p             (XLA, loop-aliased)
  3. p-update          (v - zs) + beta p       (XLA, loop-aliased)
  4. zero-upd sweep    b=r-a*Ap f32; x1 bf16   (aliased stream kernel)
  5. resid+x-restrict  r1 = b - A x1, /2 on x  (bf16 x1 read)
  6. yz-restrict       restrict_mm axes (1,2)  (MXU banded contractions)
  7. sub-cycle         full V-cycle at level 1 (256^3 and below, as a unit)
  8. yz-prolong        prolong_mm axes (1,2)
  9. x-prolong+add     xprolong_add_pallas     (bf16 x1 read, f32 out)
 10. post-smooth+dots  in-place RB sweep       (aliased, f32)

Measured ceilings (same timing protocol as the stages):
  same-buffer pass   v <- v * c         (donated carry)
  two-stream pass    w <- v*c + eps*w   (v kept LIVE: a true 2-buffer
                     stream — the round-4a probe's dead-carry ping-pong
                     was silently aliased by XLA back to same-buffer)

Output: a table (stderr), one JSON line (stdout), and docs/LEDGER_512.md.
Run:  PYTHONPATH=/root/.axon_site:. python bench/exp_ledger512.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def ktime(fn, *args, lo=5, hi=20, reps=3, carry=0):
    """Differenced device-side s/apply; the loop carries args[carry] (fn
    must return something of its shape+dtype)."""
    def timed(iters):
        def loop(*a):
            def body(_, w):
                aa = list(a)
                aa[carry] = w
                return fn(*aa)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, a[carry]))
        f = jax.jit(loop)
        float(f(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def ktime_nudge(fn, *args, lo=5, hi=20, reps=3):
    """ktime for stages whose output shape differs from every input."""
    def step(w, *rest):
        out = fn(w, *rest)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return w.at[(0,) * w.ndim].add(
            (1e-30 * leaf.reshape(-1)[0]).astype(w.dtype))

    return ktime(step, *args, lo=lo, hi=hi, reps=reps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--write-md", action="store_true",
                    help="write docs/LEDGER_512.md")
    args = ap.parse_args()
    n = args.n
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/poissbox-jax-cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops import stencil_inplace as si
    from poissbox_tpu.ops import stencil_pallas as sp
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers import mg as mgm
    from poissbox_tpu.solvers.cg import cg
    from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
    from poissbox_tpu.utils.profiling import solve_time

    grid = Grid3D((n, n, n))
    deltas = grid.deltas
    A = make_laplacian_operator(grid)
    dt = jnp.float32
    fs = n**3 * 4  # one f32 field, bytes
    GB = 1e9

    cfg = mgm._resolve_sweeps(MGConfig(), grid.n)
    import dataclasses as _dc
    if n >= 512:
        cfg = _dc.replace(cfg, pre_dtype="bfloat16")  # the built default
    levels = mgm._build_levels(grid.n, deltas, cfg)
    pinv = mgm._coarse_pinv(levels[-1], cfg, dt)
    w = 1.0 if cfg.damping is None else cfg.damping
    pd = jnp.dtype(cfg.pre_dtype) if cfg.pre_dtype else None

    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, grid.n, dt)
    b = jax.random.uniform(jax.random.PRNGKey(1), grid.n, dt)
    r = jax.random.uniform(jax.random.PRNGKey(2), grid.n, dt)
    u_n = u.astype(pd) if pd else u          # narrow pre-smooth iterate
    nc = n // 2
    half = jax.random.uniform(jax.random.PRNGKey(3), (nc, n, n), dt)
    rc = jax.random.uniform(jax.random.PRNGKey(4), (nc, nc, nc), dt)
    alpha = jnp.float32(0.37)

    print(f"device: {jax.devices()[0].device_kind}  n={n}  "
          f"cycle=V({cfg.pre_smooth},{cfg.post_smooth}) levels={len(levels)}"
          f" pre_dtype={cfg.pre_dtype or '-'}",
          file=sys.stderr, flush=True)

    rows = []

    def stage(tag, t, min_bytes, ceiling_key):
        rows.append(dict(tag=tag, ms=t * 1e3, gb=min_bytes / GB,
                         gbps=min_bytes / t / GB, ceil=ceiling_key))
        print(f"  {tag:22s} {t*1e3:8.3f} ms  {min_bytes/GB:6.3f} GB  "
              f"{min_bytes/t/GB:7.1f} GB/s  [{ceiling_key}]",
              file=sys.stderr, flush=True)

    # -- measured ceilings ---------------------------------------------
    c = jnp.asarray(1.0000001192092896, dt)
    t_same = ktime(lambda v: v * c, u)                # donated carry
    # true two-stream: v stays LIVE, output lands in the dead carry w
    t_two = ktime(lambda wv, v: v * c + (1e-30 * wv[0, 0, 0]),
                  u * c, u, carry=0)
    gb_same = 2 * fs / t_same / GB
    gb_two = 2 * fs / t_two / GB
    print(f"ceilings: same-buffer {t_same*1e3:.3f} ms ({gb_same:.0f} GB/s)"
          f"   two-stream {t_two*1e3:.3f} ms ({gb_two:.0f} GB/s)",
          file=sys.stderr, flush=True)

    # -- stages ----------------------------------------------------------
    t = ktime(lambda v: A.apply_dot(v)[0], u)
    stage("matvec+dot", t, 2 * fs, "two")

    t = ktime(lambda x, p: x + alpha * p, u, b)
    stage("x-update", t, 3 * fs, "mixed")

    t = ktime(lambda p, v: (v - jnp.float32(0.01)) + alpha * p, u, b)
    stage("p-update", t, 3 * fs, "mixed")

    nb = fs // 2 if pd else fs               # narrow-iterate bytes

    def zu(rr, ap):
        b2, x1, _, _ = sp.sor_rb_zero_update_pallas(
            rr, ap, alpha, deltas, w, out_dtype=pd)
        return b2.at[0, 0, 0].add((1e-30 * x1[0, 0, 0]).astype(b2.dtype))
    t = ktime(zu, r, b)
    stage("zero-upd sweep", t, 3 * fs + nb, "aliased")

    t = ktime_nudge(lambda x1, b2: sp.residual_xrestrict_pallas(x1, b2,
                                                                deltas),
                    u_n, b)
    stage("resid+x-restrict", t, fs + nb + fs // 2, "two")

    t = ktime_nudge(lambda h: mgm.restrict_mm(h, axes=(1, 2)), half)
    by = (fs // 2 + fs // 4) + (fs // 4 + fs // 8)
    stage("yz-restrict (MXU)", t, by, "two")

    t = ktime(lambda v: mgm.v_cycle(levels, pinv, cfg, v, 1), rc)
    stage("sub-cycle (lvl1+)", t, 0, "-")

    t = ktime_nudge(lambda e: mgm.prolong_mm(e, axes=(1, 2)), rc)
    stage("yz-prolong (MXU)", t, by, "two")

    t = ktime_nudge(lambda x, e: sp.xprolong_add_pallas(x, e), u_n, half)
    stage("x-prolong+add", t, nb + fs // 2 + fs, "two")

    if si.available(grid.n, dt):
        def ps(x, bb):
            out, rv, sv = si.sor_rb_sweep_inplace(x, bb, deltas, w,
                                                  reverse=True, dots=True)
            return out.at[0, 0, 0].add(1e-30 * (rv + sv))
        t = ktime(ps, u, b)
    else:
        def ps(x, bb):
            out, rv, sv = sp.sor_rb_sweep_pallas(x, bb, deltas, w,
                                                 reverse=True, dots=True)
            return out.at[0, 0, 0].add(1e-30 * (rv + sv))
        t = ktime(ps, u, b)
    stage("post-smooth+dots", t, 3 * fs, "aliased")

    # -- wholes ----------------------------------------------------------
    M = make_mg_preconditioner(grid.n, deltas, MGConfig(), dtype=dt)
    solve = jax.jit(lambda rhs: cg(A, rhs, M=M, rtol=1e-6, max_it=50))
    rhs = A(u - jnp.mean(u))
    res = solve(rhs)
    iters = int(res.iterations)
    t_solve = solve_time(solve, rhs)
    per_it = t_solve / iters

    t_stages = sum(rw["ms"] for rw in rows) / 1e3
    print(f"\nsolve: {t_solve*1e3:.1f} ms / {iters} it = "
          f"{per_it*1e3:.2f} ms/it", file=sys.stderr)
    print(f"sum of stages: {t_stages*1e3:.2f} ms/it  "
          f"(accounted {t_stages/per_it*100:.1f}% of the iteration)",
          file=sys.stderr)

    # floors: each stage's min bytes at ITS measured ceiling (aliased and
    # mixed patterns can reach the same-buffer rate; pure reads/writes of
    # distinct buffers the two-stream rate)
    floor = 0.0
    for rw in rows:
        rate = gb_same if rw["ceil"] in ("same", "aliased", "mixed") \
            else gb_two
        floor += rw["ms"] / 1e3 if rw["ceil"] == "-" else rw["gb"] / rate
    print(f"sum of per-stage memory floors: {floor*1e3:.2f} ms/it  "
          f"(floors/stages = {floor/t_stages*100:.1f}%)", file=sys.stderr)

    rec = {
        "n": n, "iters": iters, "solve_ms": t_solve * 1e3,
        "per_it_ms": per_it * 1e3, "stages_ms": t_stages * 1e3,
        "accounted_frac": t_stages / per_it,
        "floors_ms": floor * 1e3,
        "floor_frac_of_stages": floor / t_stages,
        "ceil_same_gbps": gb_same, "ceil_two_gbps": gb_two,
        "cycle": f"V({cfg.pre_smooth},{cfg.post_smooth})",
        "pre_dtype": cfg.pre_dtype,
        "stages": rows,
    }
    print(json.dumps(rec))

    if args.write_md:
        lines = [
            "# 512^3 MG-CG per-iteration byte/time ledger (round 4)",
            "",
            "Produced by `bench/exp_ledger512.py --write-md` on the driver"
            " TPU; every stage of the",
            "real iteration composition, its minimum HBM bytes, and the"
            " measured access-pattern ceilings.",
            "",
            f"Device: {jax.devices()[0].device_kind}; measured ceilings:"
            f" same-buffer {gb_same:.0f} GB/s, two-stream {gb_two:.0f}"
            f" GB/s; cycle {rec['cycle']}, pre_dtype"
            f" {cfg.pre_dtype or 'none'}.",
            "",
            "| stage | ms | min GB | GB/s | pattern |",
            "|---|---|---|---|---|",
        ]
        for rw in rows:
            lines.append(f"| {rw['tag']} | {rw['ms']:.3f} | {rw['gb']:.3f}"
                         f" | {rw['gbps']:.0f} | {rw['ceil']} |")
        lines += [
            "",
            f"Solve: **{rec['solve_ms']:.1f} ms / {iters} it ="
            f" {rec['per_it_ms']:.2f} ms/it**; stage sum"
            f" {rec['stages_ms']:.2f} ms/it"
            f" (**{rec['accounted_frac']*100:.1f}% attributed**);"
            f" per-stage memory floors {rec['floors_ms']:.2f} ms/it"
            f" ({rec['floor_frac_of_stages']*100:.0f}% of stage time is"
            " at measured floors; the rest is VPU time in the red-black"
            " sweeps and transfer contractions).",
            "",
        ]
        with open("docs/LEDGER_512.md", "w") as fh:
            fh.write("\n".join(lines))
        print("wrote docs/LEDGER_512.md", file=sys.stderr)


if __name__ == "__main__":
    main()
