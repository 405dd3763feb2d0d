"""FFT direct-solver tests: the spectral inverse must be exact (to
floating point) for the discrete periodic 7-point operator, agree with the
Krylov solvers, and share their null-space semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poissbox_tpu.config import Options
from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.stencil import make_laplacian_operator
from poissbox_tpu.solvers import cg, poisson_solve_fft, solve


def _problem(n=16, seed=0):
    grid = Grid3D((n, n, n))
    A = make_laplacian_operator(grid)
    u = A.project(jax.random.normal(jax.random.PRNGKey(seed), grid.n,
                                    jnp.float64))
    return grid, A, u, A(u)


def test_exact_inverse():
    grid, A, u, b = _problem(32)
    x = poisson_solve_fft(b, grid.deltas)
    assert float(jnp.max(jnp.abs(x - u))) < 1e-13
    rel = float(jnp.linalg.norm((A(x) - b).ravel())
                / jnp.linalg.norm(b.ravel()))
    assert rel < 1e-14


def test_matches_cg():
    grid, A, u, b = _problem(16, seed=1)
    x_fft = poisson_solve_fft(b, grid.deltas)
    x_cg = cg(A, b, rtol=1e-13, max_it=5000).x
    np.testing.assert_allclose(np.asarray(x_fft), np.asarray(x_cg),
                               rtol=1e-8, atol=1e-10)


def test_nullspace_annihilated():
    # constant RHS is pure null space -> zero solution (pseudo-inverse)
    grid = Grid3D((8, 8, 8))
    b = jnp.full(grid.n, 2.5, jnp.float64)
    x = poisson_solve_fft(b, grid.deltas)
    assert float(jnp.max(jnp.abs(x))) < 1e-13


def test_mean_free_output():
    grid, A, u, b = _problem(16, seed=2)
    x = poisson_solve_fft(b + 7.0, grid.deltas)  # shift b by a constant
    assert abs(float(jnp.mean(x))) < 1e-13
    np.testing.assert_allclose(np.asarray(x), np.asarray(u), atol=1e-12)


def test_anisotropic_and_noncubic():
    grid = Grid3D((16, 8, 32), length=(1.0, 0.5, 2.0))
    A = make_laplacian_operator(grid)
    u = A.project(jax.random.normal(jax.random.PRNGKey(3), grid.n,
                                    jnp.float64))
    b = A(u)
    x = poisson_solve_fft(b, grid.deltas)
    np.testing.assert_allclose(np.asarray(x), np.asarray(u), atol=1e-12)


def test_ksp_dispatch_fft():
    grid, A, u, b = _problem(16, seed=4)
    res = solve(A, b, Options(["-ksp_type", "fft"]), shape=grid.n,
                deltas=grid.deltas)
    assert bool(res.converged)
    assert int(res.iterations) == 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(u), atol=1e-12)
