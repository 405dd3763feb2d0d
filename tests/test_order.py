"""Discretization-order verification: grid-convergence studies.

Beyond the reference's fixed-grid tolerance checks, these tests verify the
*order of accuracy* directly: MMS error ratios across grid doublings must
match the scheme order (2nd for the 7-point star, 6th for the compact
schemes) — the strongest single check that a discretization is implemented
as designed.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops import compact
from poissbox_tpu.ops.stencil import apply_laplacian


def _mms_error_stencil(n: int) -> float:
    grid = Grid3D((n, n, n), length=(2 * np.pi,) * 3)
    c = np.asarray(grid.cells(0))
    f = (np.sin(c)[:, None, None] + np.sin(c)[None, :, None]
         + np.sin(c)[None, None, :]) + np.zeros((n, n, n))
    out = np.asarray(apply_laplacian(jnp.asarray(f), grid.deltas))
    return float(np.sqrt(np.mean((out + f) ** 2)))


def _mms_error_compact(n: int) -> float:
    grid = Grid3D((n, n, n), length=(2 * np.pi,) * 3)
    c = np.asarray(grid.cells(0))
    f = (np.sin(c)[:, None, None] + np.sin(c)[None, :, None]
         + np.sin(c)[None, None, :]) + np.zeros((n, n, n))
    out = np.asarray(compact.lapl(jnp.asarray(f), grid.deltas))
    return float(np.sqrt(np.mean((out + f) ** 2)))


def _order(errors, ns):
    # least-squares slope of log(err) vs log(1/n)
    x = np.log(1.0 / np.asarray(ns, dtype=float))
    y = np.log(np.asarray(errors))
    return np.polyfit(x, y, 1)[0]


def test_stencil_second_order():
    ns = [16, 32, 64]
    errs = [_mms_error_stencil(n) for n in ns]
    p = _order(errs, ns)
    assert 1.9 < p < 2.1, (errs, p)


def test_compact_sixth_order():
    ns = [8, 16, 32]
    errs = [_mms_error_compact(n) for n in ns]
    p = _order(errs, ns)
    assert 5.7 < p < 6.3, (errs, p)


def test_compact_grad_sixth_order():
    def err(n):
        grid = Grid3D((n,), length=(2 * np.pi,))
        dx = 2 * np.pi / n
        c = (np.arange(n) + 0.5) * dx
        v = np.arange(n) * dx
        df = np.asarray(compact.grad_1d(jnp.asarray(np.sin(c)), dx))
        return float(np.sqrt(np.mean((df - np.cos(v)) ** 2)))

    ns = [8, 16, 32, 64]
    p = _order([err(n) for n in ns], ns)
    assert 5.7 < p < 6.3


class TestChebyshevSmoother:
    @pytest.mark.slow
    def test_mgcg_with_chebyshev(self):
        from poissbox_tpu.ops.stencil import make_laplacian_operator
        from poissbox_tpu.solvers import cg
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        import jax

        grid = Grid3D((32, 32, 32))
        A = make_laplacian_operator(grid)
        M = make_mg_preconditioner(grid.n, grid.deltas,
                                   MGConfig(smoother="chebyshev"))
        u = A.project(jax.random.normal(jax.random.PRNGKey(9), grid.n,
                                        jnp.float64))
        res = cg(A, A(u), M=M, rtol=1e-8, max_it=50)
        assert bool(res.converged) and int(res.iterations) <= 8

    def test_symmetric(self):
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        import jax

        grid = Grid3D((16, 16, 16))
        M = make_mg_preconditioner(grid.n, grid.deltas,
                                   MGConfig(smoother="chebyshev"))
        k1, k2 = jax.random.split(jax.random.PRNGKey(10))
        r1 = jax.random.normal(k1, grid.n, jnp.float64)
        r2 = jax.random.normal(k2, grid.n, jnp.float64)
        lhs = float(jnp.sum(M(r1) * r2))
        rhs = float(jnp.sum(r1 * M(r2)))
        assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))

    def test_ksp_flag_mapping(self):
        from poissbox_tpu.config import Options, SolverOptions
        from poissbox_tpu.ops.stencil import make_laplacian_operator
        from poissbox_tpu.solvers import solve
        import jax

        grid = Grid3D((16, 16, 16))
        A = make_laplacian_operator(grid)
        u = A.project(jax.random.normal(jax.random.PRNGKey(11), grid.n,
                                        jnp.float64))
        opts = Options(["-ksp_type", "cg", "-pc_type", "mg",
                        "-mg_levels_ksp_type", "chebyshev",
                        "-ksp_rtol", "1e-8"])
        res = solve(A, A(u), opts, shape=grid.n, deltas=grid.deltas)
        assert bool(res.converged)
