"""Numerical operator kernels: stencils, tridiagonal solves, compact schemes."""

from poissbox_tpu.ops import coefficients, stencil, tridiag, compact

__all__ = ["coefficients", "stencil", "tridiag", "compact"]
