"""Round-3 probe: warm/cold stencil at 256^3 and cold-chained tridiag.

Chasing VERDICT r2 weak #2 (warm 256^3 stencil 88.8 -> 84.1 GDoF/s) and
weak #3 (tridiag_bw_frac > 1 because chained same-buffer solves ride VMEM
residency). Prints one JSON line per experiment.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/poissbox-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--what", default="stencil")
    ap.add_argument("--tiles", default="")
    args = ap.parse_args()
    n = args.n
    dtype = jnp.float32
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    if args.what == "stencil":
        sys.path.insert(0, "/root/repo")
        from bench import __name__  # noqa
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "benchmod", "/root/repo/bench.py")
        benchmod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(benchmod)
        st = benchmod.bench_stencil(n, dtype)
        print(json.dumps({"what": "stencil", "n": n, **st}))
    elif args.what == "tridiag_cold":
        from poissbox_tpu.ops.tridiag_pallas import PallasTridiagFactor
        a = jnp.full((n,), 9.0 / 62.0, dtype)
        b = jnp.ones((n,), dtype)
        c = jnp.full((n,), 9.0 / 62.0, dtype)
        fac = PallasTridiagFactor(a, b, c, periodic=True)
        u = jax.random.uniform(jax.random.PRNGKey(2), (n, n, n), dtype)

        def cold_loop(iters):
            def body(_, vw):
                v, w = vw
                return (w, fac.solve(v, axis=0))
            f = jax.jit(lambda v, w: jnp.sum(
                jax.lax.fori_loop(0, iters, body, (v, w))[1]))
            w0 = fac.solve(u, axis=0)
            float(f(u, w0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(u, w0))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = 10, 40
        t_lo, t_hi = cold_loop(lo), cold_loop(hi)
        while hi < 20000 and (t_hi - t_lo) <= max(0.5 * t_lo, 0.020):
            hi *= 4
            t_hi = cold_loop(hi)
        t = max((t_hi - t_lo) / (hi - lo), 1e-12)
        eff = 2 * u.size * u.dtype.itemsize / t / 1e9
        print(json.dumps({"what": "tridiag_cold", "n": n,
                          "tridiag_ms": t * 1e3, "tridiag_eff_gbps": eff,
                          "tridiag_bw_frac": eff / 819.0}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
