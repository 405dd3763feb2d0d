"""Second-stage bandwidth probe at 512^3: find a Pallas configuration that
matches XLA's ~680 GB/s streaming (the automatic pipeline with (8,256,512)
blocks reaches only ~350 GB/s).  Variants: larger/smaller blocks, 1-D
grids, flattened 2-D views, and a manual double-buffered DMA kernel.
Run: python bench/exp_bw2.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from poissbox_tpu.utils.profiling import kernel_time  # noqa: E402

HBM = 819.0


def copy3d(u, tx, ty, vmem=100 * 2**20):
    nx, ny, nz = u.shape
    blk = pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda i_ref, o_ref: o_ref.__setitem__(slice(None), i_ref[:] * 2.0),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(nx // tx, ny // ty),
        in_specs=[blk],
        out_specs=blk,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
    )(u)


def copy2d(u, rows, cols=None):
    n3 = u.size
    nz = u.shape[-1]
    cols = cols or nz
    v = u.reshape(n3 // cols, cols)
    blk = pl.BlockSpec((rows, cols), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda i_ref, o_ref: o_ref.__setitem__(slice(None), i_ref[:] * 2.0),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=(v.shape[0] // rows,),
        in_specs=[blk],
        out_specs=blk,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(v)
    return out.reshape(u.shape)


def copy_manual(u, chunk_rows):
    """Manual double-buffered DMA over a flattened (R, nz) view."""
    nz = 512
    v = u.reshape(-1, nz)
    R = v.shape[0]
    nchunks = R // chunk_rows

    def kernel(hbm_in, hbm_out):
        def body(scratch, sem_in, sem_out):
            def get(slot, ci):
                return pltpu.make_async_copy(
                    hbm_in.at[pl.ds(ci * chunk_rows, chunk_rows)],
                    scratch.at[slot], sem_in.at[slot])

            def put(slot, ci):
                return pltpu.make_async_copy(
                    scratch.at[2 + slot],
                    hbm_out.at[pl.ds(ci * chunk_rows, chunk_rows)],
                    sem_out.at[slot])

            get(0, 0).start()

            def loop(ci, _):
                cur = ci % 2
                @pl.when(ci + 1 < nchunks)
                def _():
                    get((ci + 1) % 2, ci + 1).start()
                get(cur, ci).wait()
                @pl.when(ci >= 2)
                def _():
                    put(cur, ci - 2).wait()
                scratch[2 + cur] = scratch[cur] * 2.0
                put(cur, ci).start()
                return 0

            jax.lax.fori_loop(0, nchunks, loop, 0)
            put((nchunks - 1) % 2, nchunks - 1).wait()
            @pl.when(nchunks >= 2)
            def _():
                put((nchunks - 2) % 2, nchunks - 2).wait()

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((4, chunk_rows, nz), u.dtype),
            sem_in=pltpu.SemaphoreType.DMA((2,)),
            sem_out=pltpu.SemaphoreType.DMA((2,)),
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(v)
    return out.reshape(u.shape)


def report(tag, fn, u):
    two_pass = 2 * u.size * 4
    try:
        x = fn(u)
        err = float(jnp.max(jnp.abs(x[::97, ::31, ::53] -
                                    2.0 * u[::97, ::31, ::53])))
        t = kernel_time(fn, u, lo=5, hi=20)
        gbps = two_pass / t / 1e9
        print(f"{tag:30s} {t*1e3:7.3f} ms  {gbps:6.1f} GB/s "
              f"{gbps/HBM*100:5.1f}%  err={err:.1e}", flush=True)
    except Exception as e:
        print(f"{tag:30s} FAIL {str(e).splitlines()[0][:80]}", flush=True)


def main():
    n = 512
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    report("xla scale", jax.jit(lambda v: v * 2.0), u)
    for tx, ty in [(16, 256), (32, 256), (64, 256), (8, 512), (16, 512),
                   (4, 256), (64, 512), (2, 128)]:
        report(f"grid2d ({tx},{ty})",
               functools.partial(copy3d, tx=tx, ty=ty), u)
    for rows in (1024, 2048, 4096, 8192, 512):
        report(f"flat2d rows={rows}", functools.partial(copy2d, rows=rows), u)
    for rows in (2048, 4096, 8192):
        report(f"manual rows={rows}",
               functools.partial(copy_manual, chunk_rows=rows), u)


if __name__ == "__main__":
    main()
