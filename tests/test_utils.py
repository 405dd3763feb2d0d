"""Tests for the auxiliary subsystems (profiling/logging/debugging)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poissbox_tpu.utils import check_field, is_process0, kernel_time, log0
from poissbox_tpu.utils.profiling import bandwidth_gbps


class TestDebugging:
    def test_check_field_passes(self):
        f = jnp.ones((4, 4))
        assert check_field(f, shape=(4, 4), dtype=f.dtype) is f

    def test_check_field_shape_mismatch(self):
        with pytest.raises(ValueError, match="shape"):
            check_field(jnp.ones((4, 4)), shape=(8, 8))

    def test_check_field_nan(self):
        with pytest.raises(FloatingPointError, match="NaN"):
            check_field(jnp.asarray([1.0, jnp.nan]))

    def test_check_field_dtype(self):
        with pytest.raises(TypeError, match="dtype"):
            check_field(jnp.ones(3, jnp.float32), dtype=jnp.float64)


class TestLogging:
    def test_process0(self, capsys):
        assert is_process0()  # single-process test env
        log0("hello", 42)
        assert capsys.readouterr().out == "hello 42\n"

    def test_all_processes_prefix(self, capsys):
        log0("x", all_processes=True)
        assert capsys.readouterr().out.startswith("[p0]")


class TestProfiling:
    def test_kernel_time_positive_and_sane(self):
        f = lambda v: v * 2.0 + 1.0
        t = kernel_time(f, jnp.ones((64, 64)), lo=2, hi=10, reps=1)
        assert 0 < t < 1.0

    def test_bandwidth_positive(self):
        gb = bandwidth_gbps(lambda v: v + 1.0, jnp.ones((128, 128)),
                            lo=2, hi=10, reps=1)
        assert gb > 0


def test_ksp_view_prints_resolved_configuration(capsys):
    # `-ksp_view` (round 4): the assembled solver configuration with the
    # RESOLVED MG cycle (auto sweep counts + level stack), printed before
    # the solve like PETSc's KSPView
    import jax.numpy as jnp

    from poissbox_tpu.config import Options
    from poissbox_tpu.mesh import Grid3D
    from poissbox_tpu.ops.stencil import make_laplacian_operator
    from poissbox_tpu.solvers.ksp import solve

    g = Grid3D((16, 16, 16))
    A = make_laplacian_operator(g)
    b = A.project(jnp.ones(g.n).at[0, 0, 0].set(2.0))
    solve(A, b, Options(["-ksp_type", "cg", "-pc_type", "mg",
                         "-ksp_rtol", "1e-6", "-ksp_view"]),
          shape=g.n, deltas=g.deltas)
    out = capsys.readouterr().out
    assert "KSP Object:" in out and "type: cg" in out
    assert "cycle: V(3,3)" in out          # resolved auto sweeps at 16^3
    assert "16x16x16 -> 8x8x8 -> 4x4x4" in out
    assert "coarse solve: svd" in out
