"""Solve results and convergence reasons.

The reference reads convergence through `-ksp_monitor` /
`-ksp_converged_reason` (reference README.md:48-49) and prints the final
true residual itself (reference src/example.f90:79-84). Here both are data:
every solver returns a :class:`SolveResult` pytree with the iterate, the
iteration count, the residual norm, and a fixed-length residual history
(NaN-padded past the final iteration so the result has static shape under
`jit`).
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ConvergedReason(enum.IntEnum):
    """Subset of PETSc's KSPConvergedReason relevant here.

    Positive = converged, negative = diverged, matching PETSc's sign
    convention so `reason > 0` means success.
    """

    CONVERGED_RTOL = 2
    CONVERGED_ATOL = 3
    DIVERGED_MAX_IT = -3
    DIVERGED_NAN = -9

    @property
    def message(self) -> str:
        return {
            ConvergedReason.CONVERGED_RTOL: "converged: relative tolerance",
            ConvergedReason.CONVERGED_ATOL: "converged: absolute tolerance",
            ConvergedReason.DIVERGED_MAX_IT: "diverged: maximum iterations",
            ConvergedReason.DIVERGED_NAN: "diverged: NaN/Inf residual",
        }[self]


class SolveResult(NamedTuple):
    """Result pytree returned by every Krylov solver."""

    x: jax.Array                 # final iterate
    iterations: jax.Array        # int32 iteration count
    residual_norm: jax.Array     # final ||r||_2
    history: jax.Array           # (max_it + 1,) residual norms, NaN-padded
    reason: jax.Array            # int32 ConvergedReason value

    @property
    def converged(self) -> jax.Array:
        return self.reason > 0

    def reason_enum(self) -> ConvergedReason:
        """Host-side accessor (forces a device sync)."""
        return ConvergedReason(int(self.reason))

    def monitor_lines(self, prefix: str = "") -> list[str]:
        """Render the residual history like `-ksp_monitor` output."""
        hist = jax.device_get(self.history)
        lines = []
        for i, r in enumerate(hist):
            if jnp.isnan(r):
                break
            lines.append(f"{prefix}{i:3d} KSP Residual norm {float(r):.12e}")
        return lines


def classify(resnorm, iters, rnorm0, rtol, atol, max_it) -> jax.Array:
    """Map final state to a ConvergedReason code (traced-friendly)."""
    nan = jnp.isnan(resnorm) | jnp.isinf(resnorm)
    conv_atol = resnorm <= atol
    conv_rtol = resnorm <= rtol * rnorm0
    return jnp.where(
        nan,
        jnp.int32(ConvergedReason.DIVERGED_NAN),
        jnp.where(
            conv_atol,
            jnp.int32(ConvergedReason.CONVERGED_ATOL),
            jnp.where(
                conv_rtol,
                jnp.int32(ConvergedReason.CONVERGED_RTOL),
                jnp.int32(ConvergedReason.DIVERGED_MAX_IT),
            ),
        ),
    )
