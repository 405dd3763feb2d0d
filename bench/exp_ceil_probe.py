"""Ceiling-probe comparison: the XLA `v*scale` chained pass vs the same
pass issued through a Pallas custom call (the same HBM<->custom-call
boundary the tridiag kernel crosses). At 256^3 the XLA probe's
loop-carried buffer gets VMEM placement (implied BW ~5 TB/s > spec), so
it stops being a streaming ceiling; the Pallas form keeps the probe
honest at every size. Run: python bench/exp_ceil_probe.py

Measured (v5e, f32, 2026-08-20):
  n=256 xla pass  0.027 ms  5011 GB/s   <- residency artifact, not a ceiling
  n=256 pl tx=4/8/16: 650 / 686 / 708 GB/s   <- honest streaming
  n=512 xla pass  1.634 ms   657 GB/s   <- honest (512 MB never resident)
  n=512 pl tx=4   2.996 ms   358 GB/s   <- Pallas auto-pipeline, known slow
Conclusion: keep the XLA pass as the ceiling probe, but floor it at the
spec two-pass time when its implied BW exceeds spec (bench.bench_tridiag).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from poissbox_tpu.utils.profiling import kernel_time  # noqa: E402

HBM = 819.0


def scale_pallas(u, tx=8):
    nx, ny, nz = u.shape
    blk = pl.BlockSpec((tx, ny, nz), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda i_ref, o_ref: o_ref.__setitem__(
            slice(None), i_ref[:] * 1.0000001192092896),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=(nx // tx,),
        in_specs=[blk],
        out_specs=blk,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(u)


def main():
    scale = jnp.asarray(1.0000001192092896, jnp.float32)
    for n in (256, 512):
        u = jax.random.uniform(jax.random.PRNGKey(2), (n, n, n), jnp.float32)
        two = 2 * u.size * 4 / 1e9  # GB
        t_xla = kernel_time(lambda v: v * scale, u, lo=10, hi=40)
        print(f"n={n} xla   : {t_xla*1e3:8.3f} ms  {two/t_xla:7.1f} GB/s")
        for tx in (4, 8, 16):
            t = kernel_time(lambda v, a=tx: scale_pallas(v, a), u,
                            lo=10, hi=40)
            print(f"n={n} pl tx={tx:2d}: {t*1e3:8.3f} ms  {two/t:7.1f} GB/s")


if __name__ == "__main__":
    main()
