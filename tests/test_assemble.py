"""Assembled-operator tests.

The reference leaves its assemble+matvec test as a permanently failing stub
(reference tests/coefficients/test_lapl.f90:18 — `stop 1` placeholder) and
instead cross-checks A vs P at runtime (reference src/example.f90:235-261).
Here both become real tests: assembled apply == matrix-free apply, dense
view structure, row introspection, and the demo's check_matrices invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np

from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.assemble import StencilMatrix, assemble_laplacian
from poissbox_tpu.ops.stencil import apply_laplacian, make_laplacian_operator


class TestAssembledLaplacian:
    def test_matches_matrix_free(self):
        # check_matrices analogue: ||A x - P x|| ~ 0 (example.f90:235-261)
        grid = Grid3D((16, 16, 16))
        P = assemble_laplacian(grid.n, grid.deltas)
        A = make_laplacian_operator(grid)
        u = jax.random.normal(jax.random.PRNGKey(0), grid.n, jnp.float64)
        np.testing.assert_allclose(np.asarray(P(u)), np.asarray(A(u)),
                                   rtol=1e-13, atol=1e-9)

    def test_nnz_is_seven(self):
        # the star stencil has 7 nonzeros; the reference pushes 27 entries
        # of which 20 are zero (coefficients.f90:89-105) — we store only 7
        P = assemble_laplacian((8, 8, 8), (0.125, 0.125, 0.125))
        assert P.nnz_per_row() == 7

    def test_row_entries(self):
        d = 0.25
        P = assemble_laplacian((4, 4, 4), (d, d, d))
        row = P.row(1, 1, 1)
        inv = 1.0 / d**2
        assert row[(1, 1, 1)] == -6.0 * inv
        for col in [(0, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 1), (1, 1, 0), (1, 1, 2)]:
            assert row[col] == inv
        assert len(row) == 7

    def test_row_periodic_wrap(self):
        P = assemble_laplacian((4, 4, 4), (0.25, 0.25, 0.25))
        row = P.row(0, 0, 0)
        assert (3, 0, 0) in row and (0, 3, 0) in row and (0, 0, 3) in row

    def test_dense_symmetric_singular(self):
        P = assemble_laplacian((4, 4, 4), (0.25, 0.25, 0.25))
        A = P.to_dense()
        np.testing.assert_allclose(A, A.T)
        assert np.max(np.abs(A @ np.ones(64))) < 1e-10
        # row sums zero: consistency of the singular periodic operator
        np.testing.assert_allclose(A.sum(axis=1), 0.0, atol=1e-10)

    def test_dense_matches_apply(self):
        shape, d = (4, 4, 4), 0.25
        P = assemble_laplacian(shape, (d, d, d))
        u = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float64)
        dense = (P.to_dense() @ np.asarray(u).ravel()).reshape(shape)
        np.testing.assert_allclose(dense, np.asarray(P(u)), rtol=1e-12,
                                   atol=1e-10)
