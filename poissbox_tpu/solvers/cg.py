"""Preconditioned conjugate gradients — the `-ksp_type cg` path.

The reference's recommended solver is PETSc CG (reference README.md:42-47),
run through `KSPSolve` with a null-space-projected singular operator
(reference src/poissbox.f90:284-296). This is that capability as one pure
JAX function: `lax.while_loop` outer iteration, global dot products that
GSPMD lowers to psum over the device mesh, optional preconditioner closure,
and null-space projection of the right-hand side and of every preconditioned
residual (PETSc's MatNullSpace semantics).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from poissbox_tpu.linops import LinearOperator
from poissbox_tpu.solvers.result import SolveResult, classify

Array = jax.Array


class _CGState(NamedTuple):
    x: Array
    r: Array
    p: Array
    rz: Array        # <r, z> for the current residual
    resnorm: Array   # ||r||_2
    k: Array         # iteration counter
    hist: Array      # residual-norm history


def _dot(a: Array, b: Array) -> Array:
    """Global inner product; on sharded operands XLA inserts the psum."""
    return jnp.sum(a * b)


def cg(
    A: LinearOperator,
    b: Array,
    x0: Optional[Array] = None,
    *,
    M: Optional[Callable[[Array], Array]] = None,
    rtol: float = 1.0e-5,
    atol: float = 1.0e-50,
    max_it: int = 500,
) -> SolveResult:
    """Solve A x = b by (preconditioned) CG.

    Args:
      A: symmetric linear operator (optionally singular with an attached
        null-space projector — the periodic Poisson case).
      b: right-hand side field.
      x0: initial guess (zero if omitted).
      M: preconditioner closure z = M(r) (identity if omitted).
      rtol/atol/max_it: PETSc-default-style stopping controls
        (reference README.md:48: default rtol 1e-5 via `-ksp_rtol`).

    Returns a :class:`SolveResult`; `history[i]` is ||r_i||_2 (NaN past the
    final iteration so the pytree has static shape under jit).
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    # Singular consistency: remove the null-space component from b and x
    # (PETSc removes it from the RHS when a MatNullSpace is attached).
    b = A.project(b)
    x = A.project(x)

    precond = M if M is not None else (lambda v: v)

    r = b - A(x)
    z = A.project(precond(r))
    p = z
    rz = _dot(r, z)
    rnorm0 = jnp.sqrt(_dot(r, r))
    # PETSc KSPConvergedDefault semantics: relative to ||b|| (equals the
    # initial residual for a zero guess; correct for warm/resumed starts)
    bnorm = jnp.sqrt(_dot(b, b))

    hist = jnp.full((max_it + 1,), jnp.nan, dtype=b.dtype)
    hist = hist.at[0].set(rnorm0)

    atol_ = jnp.asarray(atol, b.dtype)
    rtol_ = jnp.asarray(rtol, b.dtype)

    def cond(s: _CGState) -> Array:
        not_done = (s.resnorm > rtol_ * bnorm) & (s.resnorm > atol_)
        ok = jnp.isfinite(s.resnorm)
        return not_done & ok & (s.k < max_it)

    def body(s: _CGState) -> _CGState:
        if A.apply_dot is not None:
            Ap, pAp = A.apply_dot(s.p)
        else:
            Ap = A(s.p)
            pAp = _dot(s.p, Ap)
        # breakdown guard: pAp (or rz) vanishes when the residual has
        # collapsed to rounding noise of the projected null space — stop
        # cleanly with the current iterate instead of dividing 0/0
        # (PETSc reports KSP_DIVERGED_BREAKDOWN; here the iterate is
        # already converged to working precision, so report that)
        ok = (pAp != 0.0) & (s.rz != 0.0)
        alpha = jnp.where(ok, s.rz / jnp.where(ok, pAp, 1.0), 0.0)
        x = s.x + alpha * s.p
        r = s.r - alpha * Ap
        z = A.project(precond(r))
        rz_new = _dot(r, z)
        beta = jnp.where(ok, rz_new / jnp.where(ok, s.rz, 1.0), 0.0)
        p = z + beta * s.p
        resnorm = jnp.where(ok, jnp.sqrt(_dot(r, r)), jnp.zeros_like(s.resnorm))
        k = s.k + 1
        hist = s.hist.at[k].set(resnorm)
        return _CGState(x, r, p, rz_new, resnorm, k, hist)

    init = _CGState(x, r, p, rz, rnorm0, jnp.int32(0), hist)
    final = lax.while_loop(cond, body, init)

    reason = classify(final.resnorm, final.k, bnorm, rtol_, atol_, max_it)
    return SolveResult(
        x=A.project(final.x),
        iterations=final.k,
        residual_norm=final.resnorm,
        history=final.hist,
        reason=reason,
    )
