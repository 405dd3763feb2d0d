"""FFT direct Poisson solver — the fully-periodic fast path.

The reference's problem class (uniform, fully periodic box,
reference src/example.f90:24-35) is exactly diagonalized by the DFT: the
discrete 7-point Laplacian's eigenvalues on mode (kx, ky, kz) are

    lambda_k = sum_d (2 cos(2 pi k_d / n_d) - 2) / d_d^2

so A^{-1} is two FFTs and a pointwise divide — machine-precision accurate
in one pass, no iteration. The reference has no such solver (PETSc KSP
only); on TPU the XLA FFT makes this the fastest exact method for the
benchmark problem, provided here as a first-class `ksp_type` alongside the
Krylov methods (which remain the general path — non-periodic BCs, variable
coefficients — and the MG machinery doubles as their preconditioner).

The singular constant mode (k = 0) is the null space; its inverse
eigenvalue is set to zero, which IS the pseudo-inverse — the same
projection semantics as MatNullSpace (reference src/poissbox.f90:284-291).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from poissbox_tpu.solvers.result import ConvergedReason, SolveResult

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _inv_eigenvalues(shape: tuple, deltas: tuple, dtype_name: str):
    """Pseudo-inverse eigenvalues of the periodic 7-point Laplacian,
    rfft-layout (last axis halved). Computed once per (shape, deltas)."""
    with jax.ensure_compile_time_eval():
        nx, ny, nz = shape
        dx, dy, dz = deltas

        def lam(n, d):
            k = np.arange(n)
            return (2.0 * np.cos(2.0 * np.pi * k / n) - 2.0) / d**2

        lx = lam(nx, dx)[:, None, None]
        ly = lam(ny, dy)[None, :, None]
        lz = lam(nz, dz)[None, None, : nz // 2 + 1]  # rfft layout
        eig = lx + ly + lz
        inv = np.zeros_like(eig)
        nonzero = eig != 0.0
        inv[nonzero] = 1.0 / eig[nonzero]  # zero mode -> 0: pseudo-inverse
        return jnp.asarray(inv, jnp.dtype(dtype_name))


def poisson_solve_fft(b: Array, deltas: Sequence[float]) -> Array:
    """x = A^+ b for the periodic 7-point Laplacian, via real FFTs.

    Exact (to floating point) for any RHS; the null-space component of b
    is annihilated, so the result is the minimal-norm solution — identical
    semantics to the projected Krylov solves.
    """
    shape = tuple(b.shape)
    inv = _inv_eigenvalues(shape, tuple(float(d) for d in deltas),
                           jnp.dtype(b.dtype).name)
    bhat = jnp.fft.rfftn(b)
    xhat = bhat * inv.astype(bhat.dtype)
    return jnp.fft.irfftn(xhat, s=shape).astype(b.dtype)


def fft_solver_result(A, b: Array, deltas: Sequence[float]) -> SolveResult:
    """Run the direct solve and wrap it as a SolveResult (one 'iteration',
    residual measured, PETSc-style reason code)."""
    x = poisson_solve_fft(b, deltas)
    r = A.project(b) - A(x)
    resnorm = jnp.sqrt(jnp.sum(r * r))
    hist = jnp.stack([jnp.sqrt(jnp.sum(b * b)), resnorm])
    return SolveResult(
        x=x,
        iterations=jnp.int32(1),
        residual_norm=resnorm,
        history=hist,
        reason=jnp.int32(ConvergedReason.CONVERGED_ATOL),
    )
