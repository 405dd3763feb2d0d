"""PoissonSolver facade tests — the reference's module workflow
(initialise_grid -> initialise_linear_system -> solve, reference
src/poissbox.f90:152-324) as one object."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poissbox_tpu.api import PoissonSolver
from poissbox_tpu.config import Options


def test_default_mgcg_solve():
    s = PoissonSolver((16, 16, 16))
    x = s.random_solution(seed=1)
    b = s.rhs_for(x)
    res = s.solve(b)
    assert bool(res.converged)
    assert s.residual_norm(res.x, b) < 1e-5


def test_options_driven():
    s = PoissonSolver((16, 16, 16),
                      options=Options(["-ksp_type", "cg", "-pc_type",
                                       "jacobi", "-ksp_rtol", "1e-9",
                                       "-ksp_max_it", "3000"]))
    x = s.random_solution(seed=2)
    b = s.rhs_for(x)
    res = s.solve(b)
    assert bool(res.converged)
    err = float(jnp.linalg.norm((res.x - x).ravel()))
    assert err < 1e-6


def test_refined_reaches_f64():
    s = PoissonSolver((16, 16, 16))
    x = s.random_solution(seed=3)
    b = s.rhs_for(x)
    res = s.solve_refined(b, rtol=1e-12)
    assert s.residual_norm(res.x, b) < 1e-12


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_sharded_solver():
    s = PoissonSolver((16, 16, 16), shard=True)
    assert s.grid.mesh is not None and s.grid.mesh.size == 8
    b = s.rhs_for(s.random_solution(seed=4))
    res = s.solve(b)
    assert bool(res.converged)
