"""High-level facade — the reference's `poissbox` module workflow as one
object.

The reference exposes a four-call workflow backed by module-level globals:
`initialise_grid` -> `initialise_linear_system` -> assemble ->
`solve` (reference src/poissbox.f90:152-324). Here that lifecycle is a
:class:`PoissonSolver`: grid + operator + preconditioner + options bound
once, then pure jitted solves.

    solver = PoissonSolver((256, 256, 256),
                           options=Options(["-ksp_rtol", "1e-8"]))
    result = solver.solve(b)          # SolveResult
    x = solver.solve_refined(b)       # f64-accurate via iterative refinement
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from poissbox_tpu.config import Options, SolverOptions
from poissbox_tpu.linops import LinearOperator
from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.stencil import make_laplacian_operator
from poissbox_tpu.solvers.cg import cg
from poissbox_tpu.solvers.ksp import make_solver
from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
from poissbox_tpu.solvers.refine import RefineResult, refine
from poissbox_tpu.solvers.result import SolveResult

Array = jax.Array


class PoissonSolver:
    """Periodic 3-D Poisson solver on a (possibly sharded) structured grid.

    Args:
      n: grid shape (nx, ny, nz).
      length: domain extents (unit cube default, like the reference demo,
        reference src/example.f90:24-35).
      options: solver configuration; defaults to the reference's
        recommended CG + multigrid (reference README.md:42-47).
      shard: attach a device mesh over all local devices (PETSC_DECIDE).
      dtype: field dtype for the preconditioner setup (default: f64 when
        x64 is on, else f32).
    """

    def __init__(self, n: Sequence[int],
                 length: Sequence[float] = (1.0, 1.0, 1.0),
                 options: Options | SolverOptions | None = None,
                 shard: bool = False,
                 dtype=None,
                 order: int = 2):
        grid = Grid3D(tuple(n), tuple(length))
        if shard:
            grid = grid.with_mesh()
        self.grid = grid
        if order == 2:
            self.A: LinearOperator = make_laplacian_operator(grid)
        elif order == 6:
            # 6th-order compact Laplacian; Krylov solves reuse the
            # 2nd-order GMG preconditioner (spectrally equivalent), and
            # ksp_type="fft" is the exact spectral pseudo-inverse
            from poissbox_tpu.ops.compact import (
                make_compact_laplacian_operator,
            )
            self.A = make_compact_laplacian_operator(grid)
        else:
            raise ValueError(f"order must be 2 or 6, got {order}")
        if isinstance(options, Options):
            options = SolverOptions.from_options(options)
        if options is None:
            options = SolverOptions(ksp_type="cg", pc_type="mg")
        self.options = options
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)
        self._solver = make_solver(self.A, options, grid.n, grid.deltas,
                                   self.dtype, grid=grid)
        self._solver_jit = jax.jit(self._solver)

    # -- fields ------------------------------------------------------------
    def random_solution(self, seed: int = 0) -> Array:
        """Mean-free random field in [-1, 1] (the demo's set_solution,
        reference src/example.f90:154-199)."""
        x = self.grid.random(jax.random.PRNGKey(seed), self.dtype)
        return self.A.project(x)

    def rhs_for(self, x: Array) -> Array:
        """Manufactured RHS b = A x."""
        return self.A(x)

    def _prep(self, f: Optional[Array]) -> Optional[Array]:
        """Accept logical-shape fields on uneven decompositions: scatter
        into the padded layout (parallel.uneven) transparently."""
        if (f is not None and self.grid.uneven
                and tuple(f.shape) == tuple(self.grid.n)):
            return self.grid.shard(f)
        return f

    # -- solves ------------------------------------------------------------
    def solve(self, b: Array, x0: Optional[Array] = None) -> SolveResult:
        """Jitted options-driven solve (KSPSolve analogue)."""
        b, x0 = self._prep(b), self._prep(x0)
        return self._solver_jit(b, x0) if x0 is not None else self._solver_jit(b)

    def solve_refined(self, b: Array, rtol: float = 1.0e-12,
                      max_outer: int = 4) -> RefineResult:
        """f64-accurate solve by mixed-precision iterative refinement:
        fast-dtype MG-CG corrections, f64 true residuals."""
        M = make_mg_preconditioner(self.grid.n, self.grid.deltas, MGConfig(),
                                   dtype=jnp.float32, grid=self.grid)
        inner = jax.jit(lambda r: cg(self.A, r, M=M,
                                     rtol=1e-6, max_it=50))
        return refine(self.A, inner, b, rtol=rtol, max_outer=max_outer)

    def solve_checkpointed(self, b: Array, path: str, *,
                           rtol: float = 1.0e-6, max_it: int = 500,
                           every: int = 25):
        """Preemption-tolerant solve: in-loop snapshots every `every`
        iterations; a killed run resumes from `path` with at most `every`
        wasted iterations (checkpoint.solve_with_checkpoints)."""
        from poissbox_tpu.checkpoint import solve_with_checkpoints
        M = make_mg_preconditioner(self.grid.n, self.grid.deltas, MGConfig(),
                                   dtype=self.dtype, grid=self.grid)
        return solve_with_checkpoints(self.A, b, path, M=M, rtol=rtol,
                                      max_it=max_it, every=every)

    def residual_norm(self, x: Array, b: Array) -> float:
        """True relative residual ||A x - b|| / ||b|| (the demo's final
        verification, reference src/example.f90:79-84)."""
        r = float(jnp.linalg.norm((self.A(x) - b).ravel()))
        return r / float(jnp.linalg.norm(b.ravel()))
