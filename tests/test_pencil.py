"""Pencil-transpose and distributed compact-scheme tests on the 8-CPU mesh.

The serial compact stack is validated against analytic fields in
test_compact.py; here the distributed pencil path must reproduce the serial
results exactly on sharded inputs — the framework's sequence-parallel
correctness check (no reference analogue: the reference never distributes
its line solves, SURVEY.md §5.7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from poissbox_tpu.mesh import Grid3D, make_device_mesh
from poissbox_tpu.ops import compact, compact_dist
from poissbox_tpu.parallel.pencil import from_pencil, pencil_spec, to_pencil

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _sharded_grid(pgrid, n=16):
    mesh = make_device_mesh(pgrid)
    return Grid3D((n, n, n), mesh=mesh)


class TestPencilSpec:
    def test_unsharded_identity(self):
        grid = Grid3D((8, 8, 8))
        assert pencil_spec(grid, 0) == PartitionSpec()

    @requires_8
    def test_local_dim_unsharded(self):
        grid = _sharded_grid((2, 2, 2))
        for d in range(3):
            spec = pencil_spec(grid, d)
            entries = list(spec) + [None] * (3 - len(spec))
            assert entries[d] is None, (d, spec)
            # all three mesh axes still used
            used = []
            for e in entries:
                if e is None:
                    continue
                used.extend(e if isinstance(e, tuple) else [e])
            assert sorted(used) == ["x", "y", "z"], (d, spec)

    @requires_8
    def test_2d_mesh_layouts(self):
        grid = _sharded_grid((4, 2, 1))
        assert pencil_spec(grid, 2) == PartitionSpec("x", "y", None)
        sx = pencil_spec(grid, 0)
        entries = list(sx) + [None] * (3 - len(sx))
        assert entries[0] is None


@requires_8
class TestPencilTranspose:
    def test_round_trip_preserves_values(self):
        grid = _sharded_grid((2, 2, 2))
        u = jax.random.normal(jax.random.PRNGKey(0), grid.n, jnp.float64)
        us = grid.shard(u)

        @jax.jit
        def round_trip(v):
            for d in (2, 1, 0):
                v = to_pencil(v, grid, d)
            return from_pencil(v, grid)

        np.testing.assert_array_equal(np.asarray(round_trip(us)),
                                      np.asarray(u))

    def test_pencil_layout_applied(self):
        grid = _sharded_grid((4, 2, 1))
        u = grid.shard(jax.random.normal(jax.random.PRNGKey(1), grid.n,
                                         jnp.float64))
        v = jax.jit(lambda w: to_pencil(w, grid, 0))(u)
        # x must be unsharded in X-pencil layout
        spec = v.sharding.spec
        entries = list(spec) + [None] * (3 - len(spec))
        assert entries[0] is None


@requires_8
class TestDistributedCompact:
    @pytest.mark.parametrize("pgrid", [(2, 2, 2), (4, 2, 1), (8, 1, 1)])
    def test_grad_matches_serial(self, pgrid):
        grid = _sharded_grid(pgrid)
        u = jax.random.normal(jax.random.PRNGKey(2), grid.n, jnp.float64)
        serial = np.asarray(compact.grad(u, grid.deltas))
        dist = np.asarray(jax.jit(
            lambda v: compact_dist.grad(v, grid))(grid.shard(u)))
        np.testing.assert_allclose(dist, serial, rtol=1e-13, atol=1e-12)

    def test_div_matches_serial(self):
        grid = _sharded_grid((2, 2, 2))
        F = jax.random.normal(jax.random.PRNGKey(3), grid.n + (3,),
                              jnp.float64)
        serial = np.asarray(compact.div(F, grid.deltas))
        dist = np.asarray(jax.jit(
            lambda v: compact_dist.div(v, grid))(F))
        np.testing.assert_allclose(dist, serial, rtol=1e-13, atol=1e-12)

    def test_lapl_matches_serial(self):
        grid = _sharded_grid((2, 2, 2))
        u = jax.random.normal(jax.random.PRNGKey(4), grid.n, jnp.float64)
        serial = np.asarray(compact.lapl(u, grid.deltas))
        dist = np.asarray(jax.jit(
            lambda v: compact_dist.lapl(v, grid))(grid.shard(u)))
        np.testing.assert_allclose(dist, serial, rtol=1e-12, atol=1e-11)

    def test_lapl_analytic_on_mesh(self):
        # MMS through the fully distributed path: f = sin x + sin y + sin z
        # on L = 2 pi (the reference lapl test field, test_lapl.f90:57-132)
        n = 32
        mesh = make_device_mesh((2, 2, 2))
        grid = Grid3D((n, n, n), length=(2 * np.pi,) * 3, mesh=mesh)
        c = np.asarray(grid.cells(0))
        f = jnp.asarray(np.sin(c)[:, None, None] + np.sin(c)[None, :, None]
                        + np.sin(c)[None, None, :] + np.zeros((n, n, n)))
        out = np.asarray(jax.jit(
            lambda v: compact_dist.lapl(v, grid))(grid.shard(f)))
        err = np.sqrt(np.mean((out + np.asarray(f)) ** 2))
        assert np.isfinite(err) and err < 1e-7  # 32^3: coarser than 64^3 tier
