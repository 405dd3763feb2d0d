"""Probe achievable HBM streaming bandwidth vs problem size.

Separates "kernel is inefficient" from "large-array streaming itself tops
out below nominal HBM speed": times an XLA elementwise scale, a Pallas
tiled copy, and the production stencil, at 256^3 and 512^3, all with the
same device-loop timing protocol.  Run: python bench/exp_bw.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from poissbox_tpu.ops.stencil_pallas import apply_laplacian_pallas  # noqa: E402
from poissbox_tpu.utils.profiling import kernel_time  # noqa: E402

HBM = 819.0


def pallas_copy(u, tx, ty):
    nx, ny, nz = u.shape
    blk = pl.BlockSpec((tx, ty, nz), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda i_ref, o_ref: o_ref.__setitem__(slice(None), i_ref[:] * 2.0),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(nx // tx, ny // ty),
        in_specs=[blk],
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=u.size, bytes_accessed=2 * u.size * u.dtype.itemsize,
            transcendentals=0),
    )(u)


def report(tag, t, nbytes):
    gbps = nbytes / t / 1e9
    print(f"{tag:34s} {t*1e3:7.3f} ms  {gbps:6.1f} GB/s  {gbps/HBM*100:5.1f}%",
          flush=True)


def main():
    for n in (256, 384, 512):
        u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
        two_pass = 2 * u.size * 4
        t = kernel_time(jax.jit(lambda v: v * 2.0), u, lo=5, hi=20)
        report(f"xla scale      n={n}", t, two_pass)
        for tiles in [(8, 256), (8, n), (16, 128)]:
            tx, ty = tiles
            if n % tx or n % ty or ty > n:
                continue
            try:
                t = kernel_time(
                    lambda v, a=tx, b=ty: pallas_copy(v, a, b), u, lo=5, hi=20)
                report(f"pallas copy {tiles} n={n}", t, two_pass)
            except Exception as e:
                print(f"pallas copy {tiles} n={n} FAIL "
                      f"{str(e).splitlines()[0][:70]}", flush=True)
        t = kernel_time(lambda v: apply_laplacian_pallas(
            v, (1.0 / n,) * 3), u, lo=5, hi=20)
        report(f"stencil (prod) n={n}", t, two_pass)


if __name__ == "__main__":
    main()
