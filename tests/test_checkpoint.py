"""Checkpoint/resume tests: a CG solve interrupted at k iterations and
resumed from its checkpoint must reach the same solution as an
uninterrupted solve (capability beyond the reference, which is one-shot —
SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from poissbox_tpu import checkpoint
from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.stencil import make_laplacian_operator
from poissbox_tpu.solvers import cg


def test_save_load_roundtrip(tmp_path):
    state = {"x": jnp.arange(12.0).reshape(3, 4),
             "iterations": jnp.int32(7)}
    p = checkpoint.save(str(tmp_path / "ckpt"), state)
    loaded = checkpoint.load(p)
    np.testing.assert_array_equal(np.asarray(loaded["x"]),
                                  np.asarray(state["x"]))
    assert int(loaded["iterations"]) == 7


def test_sharded_roundtrip(tmp_path):
    # Orbax must preserve values for sharded fields (multi-host analogue
    # exercised on the virtual mesh)
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    grid = Grid3D((16, 16, 16)).with_mesh()
    u = grid.random(jax.random.PRNGKey(5))
    p = checkpoint.save(str(tmp_path / "sharded"), {"u": u})
    loaded = checkpoint.load(p)
    np.testing.assert_array_equal(np.asarray(loaded["u"]), np.asarray(u))


def test_resume_matches_uninterrupted(tmp_path):
    grid = Grid3D((16, 16, 16))
    A = make_laplacian_operator(grid)
    key = jax.random.PRNGKey(0)
    u = A.project(jax.random.normal(key, grid.n, jnp.float64))
    b = A(u)

    full = cg(A, b, rtol=1e-10, max_it=2000)

    part = cg(A, b, rtol=1e-10, max_it=20)       # interrupted early
    st = checkpoint.SolveCheckpoint.from_result(part, b=b)
    p = checkpoint.save(str(tmp_path / "solve"), st.as_dict())
    restored = checkpoint.SolveCheckpoint.from_dict(checkpoint.load(p))
    resumed = cg(A, restored.b, x0=restored.x, rtol=1e-10, max_it=2000)

    assert bool(resumed.converged)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-6, atol=1e-8)
    # resuming saved work: fewer iterations than from scratch
    assert int(resumed.iterations) < int(full.iterations)
