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

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from poissbox_tpu.solvers.result import ConvergedReason, SolveResult

Array = jax.Array


def _inv_eigenvalues(shape: tuple, deltas: tuple, dtype, rfft: bool):
    """Pseudo-inverse eigenvalues of the periodic 7-point Laplacian, in
    rfft layout (last axis halved) or full-fft layout.

    Evaluated with jnp *inside the trace* — a host-precomputed table would
    be embedded in the compiled program as an O(n^3) literal (33 MB at
    256^3), which bloats executables and overflows remote-compile payload
    limits; the on-device cosine evaluation is a negligible one-pass cost
    that XLA constant-folds/hoists anyway."""
    nx, ny, nz = shape
    dx, dy, dz = deltas

    def lam(n, d):
        # 2 cos(theta) - 2 == -4 sin^2(theta/2): the sin^2 form is
        # cancellation-free — the difference form loses ~7 digits for low
        # modes in f32 and produces garbage solves
        k = jnp.arange(n, dtype=dtype)
        s = jnp.sin((np.pi / n) * k)
        return (-4.0 / d**2) * s * s

    lz = lam(nz, dz)
    if rfft:
        lz = lz[: nz // 2 + 1]
    eig = (lam(nx, dx)[:, None, None]
           + lam(ny, dy)[None, :, None]
           + lz[None, None, :])
    return jnp.where(eig != 0.0, 1.0 / jnp.where(eig != 0.0, eig, 1.0), 0.0)


def poisson_solve_fft(b: Array, deltas: Sequence[float]) -> Array:
    """x = A^+ b for the periodic 7-point Laplacian, via FFTs.

    Exact (to floating point) for any RHS; the null-space component of b
    is annihilated, so the result is the minimal-norm solution — identical
    semantics to the projected Krylov solves.
    """
    shape = tuple(b.shape)
    # XLA's real FFT mis-computes large transforms on some TPU runtimes
    # (observed: irfftn(rfftn(u)) has 0.17 relative error at 256^3 on v5e
    # while the complex transform is fine at 7e-7), so the TPU path uses
    # the complex FFT; CPU keeps the cheaper real transform.
    use_rfft = jax.default_backend() == "cpu"
    inv = _inv_eigenvalues(shape, tuple(float(d) for d in deltas), b.dtype,
                           rfft=use_rfft)
    if use_rfft:
        xhat = jnp.fft.rfftn(b) * inv.astype(jnp.complex64 if b.dtype ==
                                             jnp.float32 else jnp.complex128)
        return jnp.fft.irfftn(xhat, s=shape).astype(b.dtype)
    bhat = jnp.fft.fftn(b)
    xhat = bhat * inv.astype(bhat.dtype)
    return jnp.fft.ifftn(xhat).real.astype(b.dtype)


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
