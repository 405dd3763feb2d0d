"""Anatomy of the in-place RB double sweep at 512^3 — where does the VPU
time go? Times the production kernel against ablated variants sharing the
same DMA pipeline (same slabs, same halos): pure copy (memory floor),
unmasked jacobi-style update, rotate-free star, single half-step.
"""

import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/poissbox-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from poissbox_tpu.ops import stencil_inplace as si
from poissbox_tpu.ops.stencil_pallas import _pm1_sum, _rb_halfstep
from poissbox_tpu.ops.stencil_inplace import _make_kernel, _pick_T, _parity_x


def launch(u, b, update, H, Hb):
    nx, ny, nz = u.shape
    T = _pick_T(nx, ny, nz, u.dtype.itemsize, H, Hb)
    kernel = _make_kernel(nx, ny, nz, T, H, Hb, u.dtype, update, True)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=22 * u.size,
            bytes_accessed=3 * u.size * u.dtype.itemsize,
            transcendentals=0),
    )(u, b)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dt = jnp.float32
    nx = ny = nz = n
    deltas = (1.0 / n,) * 3
    invs = tuple(1.0 / d**2 for d in deltas)
    winv = 1.0 / (-2.0 * sum(invs))
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), dt)
    b = jax.random.uniform(jax.random.PRNGKey(1), (n, n, n), dt)
    H, Hb = 2, 1

    def upd_copy(xe, be, x0):
        return xe[H:-H] + be[Hb:-Hb] * np.float32(1e-30)

    def upd_jacobi2(xe, be, x0):
        # two unmasked jacobi half-steps with the same shrinking regions
        x = xe
        for j in range(2):
            m = x.shape[0]
            from poissbox_tpu.ops.stencil_pallas import _star_ext
            x = x[1:-1] + np.float32(winv) * (be[j:j + m - 2] - _star_ext(x, invs))
        return x

    def upd_prod(xe, be, x0):
        x = xe
        m0 = xe.shape[0] - 2
        par = _parity_x((m0, ny, nz), x0 + (1 - H))
        w0 = jnp.where(par == 0, np.float32(winv), np.float32(0.0))
        ws = (w0, np.float32(winv) - w0)
        for j in range(2):
            m = x.shape[0]
            wj = ws[j % 2][j:m0 - j] if j else ws[0]
            x = _rb_halfstep(x, be[j:j + m - 2], wj, invs)
        return x

    def upd_norot(xe, be, x0):
        # production masked form, but neighbor sums along y/z replaced by
        # 2*c — isolates the rotate cost (WRONG numerics, timing only)
        x = xe
        m0 = xe.shape[0] - 2
        par = _parity_x((m0, ny, nz), x0 + (1 - H))
        w0 = jnp.where(par == 0, np.float32(winv), np.float32(0.0))
        ws = (w0, np.float32(winv) - w0)
        iv = invs[0]
        for j in range(2):
            m = x.shape[0]
            wj = ws[j % 2][j:m0 - j] if j else ws[0]
            c = x[1:-1]
            s = (x[:-2] + x[2:]) + (c + c) + (c + c)
            x = c + wj * ((be[j:j + m - 2] - iv * s) + (6.0 * iv) * c)
        return x

    def upd_single(xe, be, x0):
        # ONE masked half-step (H=2 pipeline kept so DMA volume matches)
        m0 = xe.shape[0] - 2
        par = _parity_x((m0, ny, nz), x0 + (1 - H))
        w0 = jnp.where(par == 0, np.float32(winv), np.float32(0.0))
        x = _rb_halfstep(xe, be[0:m0], w0, invs)
        return x[1:-1]

    # b MUST ride as an ARGUMENT of the jitted loop: a closed-over 512^3
    # array is inlined into the HLO as a 512 MB literal, which the
    # remote-compile path rejects (breaks the tunnel pipe)
    import time as _time

    def ktime(f, lo=5, hi=20, reps=3):
        def timed(iters):
            g = jax.jit(lambda v, a: jnp.sum(
                jax.lax.fori_loop(0, iters, lambda _, w: f(w, a), v)))
            float(g(u, b))
            best = float("inf")
            for _ in range(reps):
                t0 = _time.perf_counter()
                float(g(u, b))
                best = min(best, t0 * 0 + _time.perf_counter() - t0)
            return best
        t_lo, t_hi = timed(lo), timed(hi)
        return max((t_hi - t_lo) / (hi - lo), 1e-12)

    for tag, upd in [("production double sweep", upd_prod),
                     ("no-rotate double", upd_norot),
                     ("single half-step", upd_single),
                     ("2x jacobi (no masks)", upd_jacobi2),
                     ("copy (memory floor)", upd_copy)]:
        try:
            t = ktime(lambda v, a, f=upd: launch(v, a, f, H, Hb))
            print(json.dumps({"variant": tag, "ms": t * 1e3}), flush=True)
        except Exception as e:  # noqa: BLE001 — tunnel flake, keep going
            print(json.dumps({"variant": tag, "error": str(e)[:120]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
