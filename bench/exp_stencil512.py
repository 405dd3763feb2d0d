"""Experiment: 512^3 stencil tiling sweep (VERDICT round-1 item 3).

Times the paneled 7-point Laplacian kernel across (TX, TY) tile choices,
grid iteration orders, and dimension_semantics, to find the scheme that
holds >=70% of HBM roofline at 512^3 (the y-paneled round-1 scheme ran at
37%). Run on the real chip: python bench/exp_stencil512.py [--n 512]
"""

from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from poissbox_tpu.ops.stencil_pallas import _make_kernel, _upd_lapl  # noqa: E402
from poissbox_tpu.utils.profiling import kernel_time  # noqa: E402

HBM = 819.0  # v5e GB/s


def launch(u, tiles, order="xy", semantics=None, vmem=None):
    nx, ny, nz = u.shape
    tx, ty = tiles
    full_y = ty == ny
    vm = pltpu.VMEM
    invs = tuple(1.0 / (1.0 / n) ** 2 for n in u.shape)
    kernel = _make_kernel(_upd_lapl, full_y, invs=invs, tx=tx, ty=ty)

    gi, gj = nx // tx, ny // ty
    if order == "xy":   # i = x-block (outer), j = y-block (inner)
        grid = (gi, gj)
        bi = lambda i, j: (i, j)
    else:               # y outer, x inner
        grid = (gj, gi)
        bi = lambda j, i: (i, j)

    blk = pl.BlockSpec((tx, ty, nz),
                       lambda a, b: (bi(a, b)[0], bi(a, b)[1], 0),
                       memory_space=vm)
    xplane = lambda off: pl.BlockSpec(
        (1, ty, nz),
        lambda a, b: ((bi(a, b)[0] * tx + off) % nx, bi(a, b)[1], 0),
        memory_space=vm)
    if full_y:
        in_specs = [xplane(-1), blk, xplane(tx)]
        args = (u, u, u)
    else:
        nyb, tyb = ny // 8, ty // 8
        ym = pl.BlockSpec((tx, 8, nz),
                          lambda a, b: (bi(a, b)[0],
                                        (bi(a, b)[1] * tyb - 1) % nyb, 0),
                          memory_space=vm)
        yp = pl.BlockSpec((tx, 8, nz),
                          lambda a, b: (bi(a, b)[0],
                                        ((bi(a, b)[1] + 1) * tyb) % nyb, 0),
                          memory_space=vm)
        in_specs = [xplane(-1), ym, blk, yp, xplane(tx)]
        args = (u, u, u, u, u)
    cp = pltpu.CompilerParams(
        dimension_semantics=semantics,
        vmem_limit_bytes=vmem,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=blk,
        cost_estimate=pl.CostEstimate(
            flops=9 * u.size,
            bytes_accessed=len(in_specs) * u.size * u.dtype.itemsize,
            transcendentals=0),
        compiler_params=cp,
    )(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    n = args.n
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    sol = HBM / 8  # GDoF/s at 2 passes

    cases = []
    for tiles in [(8, 64), (8, 128), (4, 128), (4, 256), (2, 256), (16, 64),
                  (8, 256), (2, 512), (1, 512)]:
        if n % tiles[0] or n % tiles[1] or tiles[1] > n:
            continue
        for order in ["xy", "yx"]:
            for sem in [None, ("arbitrary", "arbitrary")]:
                cases.append((tiles, order, sem))

    results = []
    for tiles, order, sem in cases:
        tag = f"t={tiles} ord={order} sem={'arb' if sem else 'def'}"
        try:
            f = functools.partial(launch, tiles=tiles, order=order,
                                  semantics=sem, vmem=64 * 2**20)
            t = kernel_time(f, u, lo=5, hi=20)
            gd = n**3 / t / 1e9
            print(f"{tag:42s} {t*1e3:7.3f} ms  {gd:6.1f} GDoF/s "
                  f"{gd/sol*100:5.1f}%", flush=True)
            results.append((gd, tag))
        except Exception as e:
            msg = str(e).split(chr(10))[0][:90]
            print(f"{tag:42s} FAIL {msg}", flush=True)
    results.sort(reverse=True)
    print("\nbest:", results[0] if results else None)


if __name__ == "__main__":
    main()
