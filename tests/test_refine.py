"""Mixed-precision iterative-refinement tests: f32 MG-CG inner solves must
reach f64-level relative residuals — beyond both the reference's default
rtol 1e-5 and its recommended 1e-8 runs (reference README.md:48)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.stencil import make_laplacian_operator
from poissbox_tpu.solvers import cg
from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
from poissbox_tpu.solvers.refine import refine


@pytest.mark.slow
def test_refinement_reaches_f64_accuracy():
    n = 32
    grid = Grid3D((n, n, n))
    A64 = make_laplacian_operator(grid)
    M32 = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(),
                                 dtype=jnp.float32)
    inner = jax.jit(lambda r: cg(A64, r, M=M32, rtol=1e-6, max_it=30))

    key = jax.random.PRNGKey(0)
    u = A64.project(jax.random.normal(key, grid.n, jnp.float64))
    b = A64(u)
    res = refine(A64, inner, b, rtol=1e-12, max_outer=5)
    bnorm = float(jnp.linalg.norm(b.ravel()))
    assert float(res.residual_norm) < 1e-12 * bnorm
    assert res.outer_iterations <= 4
    err = float(jnp.linalg.norm((res.x - u).ravel()) / jnp.linalg.norm(u.ravel()))
    assert err < 1e-10


@pytest.mark.slow
def test_refinement_history_monotone():
    n = 16
    grid = Grid3D((n, n, n))
    A64 = make_laplacian_operator(grid)
    M32 = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(),
                                 dtype=jnp.float32)
    inner = jax.jit(lambda r: cg(A64, r, M=M32, rtol=1e-6, max_it=30))
    key = jax.random.PRNGKey(1)
    b = A64(A64.project(jax.random.normal(key, grid.n, jnp.float64)))
    res = refine(A64, inner, b, rtol=1e-13, max_outer=4)
    hist = np.asarray(res.history)
    assert (np.diff(hist) < 0).all() or hist[-1] < 1e-12 * hist[0]
