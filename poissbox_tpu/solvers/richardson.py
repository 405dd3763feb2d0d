"""Damped (preconditioned) Richardson iteration.

The reference's multigrid level solver of record is
`-mg_levels_ksp_type richardson -mg_levels_pc_type sor` with a level rtol of
1e-4 (reference README.md:42-47). Richardson is x += omega * M(b - A x);
with M = a smoother application this is exactly a smoothing iteration, so
the multigrid module reuses this function for its level solves.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from poissbox_tpu.linops import LinearOperator
from poissbox_tpu.solvers.result import SolveResult, classify

Array = jax.Array


class _RichState(NamedTuple):
    x: Array
    resnorm: Array
    k: Array
    hist: Array


def richardson(
    A: LinearOperator,
    b: Array,
    x0: Optional[Array] = None,
    *,
    M: Optional[Callable[[Array], Array]] = None,
    omega: float = 1.0,
    rtol: float = 1.0e-5,
    atol: float = 1.0e-50,
    max_it: int = 100,
    monitor: bool = False,
) -> SolveResult:
    """Solve A x = b by damped preconditioned Richardson iteration.

    `monitor=True` streams a `-ksp_monitor` residual line per iteration
    from inside the jitted loop (live, like PETSc's during-solve monitor —
    reference README.md:48-49), matching the cg-family solvers."""
    x = jnp.zeros_like(b) if x0 is None else x0
    b = A.project(b)
    x = A.project(x)
    precond = M if M is not None else (lambda v: v)

    r0 = b - A(x)
    rnorm0 = jnp.sqrt(jnp.sum(r0 * r0))
    bnorm = jnp.sqrt(jnp.sum(b * b))  # PETSc KSPConvergedDefault base
    hist = jnp.full((max_it + 1,), jnp.nan, dtype=b.dtype)
    hist = hist.at[0].set(rnorm0)
    if monitor:
        from poissbox_tpu.solvers.cg import emit_monitor
        emit_monitor(jnp.int32(0), rnorm0)

    atol_ = jnp.asarray(atol, b.dtype)
    rtol_ = jnp.asarray(rtol, b.dtype)
    w = jnp.asarray(omega, b.dtype)

    def cond(s: _RichState) -> Array:
        not_done = (s.resnorm > rtol_ * bnorm) & (s.resnorm > atol_)
        return not_done & jnp.isfinite(s.resnorm) & (s.k < max_it)

    def body(s: _RichState) -> _RichState:
        r = b - A(s.x)
        x = A.project(s.x + w * precond(r))
        rnew = b - A(x)
        resnorm = jnp.sqrt(jnp.sum(rnew * rnew))
        k = s.k + 1
        if monitor:
            from poissbox_tpu.solvers.cg import emit_monitor
            emit_monitor(k, resnorm)
        return _RichState(x, resnorm, k, s.hist.at[k].set(resnorm))

    final = lax.while_loop(cond, body, _RichState(x, rnorm0, jnp.int32(0), hist))
    reason = classify(final.resnorm, final.k, bnorm, rtol_, atol_, max_it)
    return SolveResult(final.x, final.k, final.resnorm, final.hist, reason)
