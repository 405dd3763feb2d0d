"""Round-3 behaviors: `-options_left`, size-aware sweep unification across
entry points, pipecg options parity, and live `-ksp_monitor` streaming.

Reference semantics being matched:
  * PETSc options DB complains about set-but-unused options
    (`-options_left`; the reference wires every object through the DB,
    reference src/poissbox.f90:295) — a typo like `-mg_cylce w` must fail
    loudly instead of silently no-op'ing.
  * One solver of record (reference README.md:42-47): the options entry
    point and the MGConfig() default path must build the SAME cycle.
  * `-ksp_monitor` prints residuals *while* KSPSolve runs (reference
    README.md:48-49).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poissbox_tpu.config import Options, SolverOptions
from poissbox_tpu.linops import LinearOperator
from poissbox_tpu.mesh import Grid3D
from poissbox_tpu.ops.stencil import make_laplacian_operator
from poissbox_tpu.solvers.ksp import make_preconditioner, make_solver, solve


def _identity_op():
    return LinearOperator(apply=lambda x: x,
                          diagonal=lambda: jnp.asarray(1.0))


class TestOptionsLeft:
    def test_typo_fails_loudly(self):
        # `-mg_cylce w` (typo of -mg_cycle) must not be a silent no-op
        opts = Options(["-ksp_type", "cg", "-pc_type", "none",
                        "-mg_cylce", "w"])
        SolverOptions.from_options(opts)  # consumes the legit keys
        assert opts.unused_keys() == ["mg_cylce"]
        with pytest.raises(ValueError, match="mg_cylce"):
            opts.check_unused(error=True)

    def test_clean_run_is_silent(self):
        opts = Options(["-ksp_type", "cg", "-ksp_rtol", "1e-7"])
        SolverOptions.from_options(opts)
        assert opts.unused_keys() == []
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            opts.check_unused()  # must not warn

    def test_unused_warns_by_default(self):
        opts = Options(["-ksp_typo", "cg"])
        with pytest.warns(UserWarning, match="ksp_typo"):
            opts.check_unused()

    def test_error_flag_read_from_db(self):
        opts = Options(["-bogus_flag", "-options_error_if_unused"])
        with pytest.raises(ValueError, match="bogus_flag"):
            opts.check_unused()

    def test_ksp_solve_options_left(self):
        # `solve()` with `-options_left` warns about the unconsumed typo
        grid = Grid3D((8, 8, 8))
        A = make_laplacian_operator(grid)
        b = A(A.project(jax.random.normal(jax.random.PRNGKey(2), grid.n,
                                          jnp.float64)))
        opts = Options(["-ksp_type", "cg", "-pc_type", "jacobi",
                        "-ksp_rtol", "1e-6", "-mg_cylce", "w",
                        "-options_left"])
        with pytest.warns(UserWarning, match="mg_cylce"):
            solve(A, b, opts, shape=grid.n, deltas=grid.deltas)

    def test_log_view(self, capsys):
        grid = Grid3D((8, 8, 8))
        A = make_laplacian_operator(grid)
        b = A(A.project(jax.random.normal(jax.random.PRNGKey(4), grid.n,
                                          jnp.float64)))
        solve(A, b, Options(["-ksp_type", "cg", "-pc_type", "jacobi",
                             "-ksp_rtol", "1e-6", "-log_view"]),
              shape=grid.n, deltas=grid.deltas)
        out = capsys.readouterr().out
        assert "log_view:   setup" in out and "log_view:   solve" in out
        assert "iterations" in out
        # round 5: PETSc-style per-event table (count, time/call, total, %)
        assert "log_view:   MatMult" in out
        assert "log_view:   PCApply" in out
        assert "time/call" in out

    @pytest.mark.slow
    def test_demo_errors_on_typo(self):
        # jacobi keeps the run cheap — the options-left check fires either
        # way, after the solve completes
        from poissbox_tpu import demo
        with pytest.raises(ValueError, match="mg_cylce"):
            demo.run(Options(["-n", "16", "-pc_type", "jacobi",
                              "-ksp_rtol", "1e-4", "-mg_cylce", "w",
                              "-options_error_if_unused"]))


class TestSweepPolicyUnified:
    """VERDICT r2 task 3: with neither -mg_levels_ksp_rtol nor
    -mg_levels_ksp_max_it set, the options entry point must resolve the
    same size-aware sweep counts as MGConfig() (solvers.mg._resolve_sweeps):
    V(3,3) at 256^3-class, V(2,2) at 512^3-class."""

    def _cfg_for(self, shape, flags=()):
        opts = SolverOptions.from_options(Options(["-pc_type", "mg", *flags]))
        A = _identity_op()
        deltas = tuple(1.0 / s for s in shape)
        M = make_preconditioner(A, opts, shape, deltas, jnp.float64)
        return M.config

    def test_auto_matches_mgconfig_512(self):
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        shape = (512, 512, 512)
        cfg_opts = self._cfg_for(shape)
        M_direct = make_mg_preconditioner(shape, (1 / 512,) * 3, MGConfig(),
                                          dtype=jnp.float64)
        assert cfg_opts.pre_smooth == M_direct.config.pre_smooth == 1
        assert cfg_opts.post_smooth == M_direct.config.post_smooth == 1

    def test_auto_256_class(self):
        cfg = self._cfg_for((256, 256, 256))
        assert (cfg.pre_smooth, cfg.post_smooth) == (2, 2)

    def test_auto_matches_mgconfig_64(self):
        cfg = self._cfg_for((64, 64, 64))
        assert (cfg.pre_smooth, cfg.post_smooth) == (3, 3)

    def test_explicit_flags_keep_calibrated_path(self):
        from poissbox_tpu.solvers.mg import sweeps_for_level_rtol
        cfg = self._cfg_for((512, 512, 512),
                            ["-mg_levels_ksp_rtol", "1e-8",
                             "-mg_levels_ksp_max_it", "30"])
        assert cfg.pre_smooth == sweeps_for_level_rtol("sor", 1e-8, 30) > 2

    def test_max_it_alone_binds(self):
        cfg = self._cfg_for((64, 64, 64), ["-mg_levels_ksp_max_it", "1"])
        assert cfg.pre_smooth == 1


class TestPipecgParity:
    def _problem(self):
        grid = Grid3D((16, 16, 16))
        A = make_laplacian_operator(grid)
        x = A.project(jax.random.normal(jax.random.PRNGKey(5), grid.n,
                                        jnp.float64))
        return grid, A, A(x), x

    def test_natural_norm_converges(self):
        from poissbox_tpu.solvers.pipecg import pipecg
        grid, A, b, x_exact = self._problem()
        inv_diag = 1.0 / A.diagonal()
        res = pipecg(A, b, M=lambda r: inv_diag * r, rtol=1e-10, max_it=200,
                     norm_type="natural")
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_exact),
                                   rtol=1e-7, atol=1e-9)

    def test_cg_natural_norm_negative_definite(self):
        # regression: <r, M r> is NEGATIVE on this sign-consistent
        # negative-definite pair; a clamped sqrt(max(.,0)) reported 0 and
        # stalled the solve at x=0 without iterating
        from poissbox_tpu.solvers.cg import cg
        grid, A, b, x_exact = self._problem()
        inv_diag = 1.0 / A.diagonal()
        res = cg(A, b, M=lambda r: inv_diag * r, rtol=1e-10, max_it=200,
                 norm_type="natural")
        assert bool(res.converged) and int(res.iterations) > 0
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_exact),
                                   rtol=1e-7, atol=1e-9)

    def test_bad_norm_type_rejected(self):
        from poissbox_tpu.solvers.pipecg import pipecg
        _, A, b, _ = self._problem()
        with pytest.raises(ValueError, match="norm_type"):
            pipecg(A, b, norm_type="preconditioned")

    def test_norm_type_flag_dispatches(self):
        grid, A, b, x_exact = self._problem()
        o = SolverOptions(ksp_type="pipecg", ksp_norm_type="natural",
                          pc_type="jacobi", ksp_rtol=1e-10, ksp_max_it=200)
        res = make_solver(A, o, grid.n, grid.deltas)(b)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_exact),
                                   rtol=1e-7, atol=1e-9)

    @pytest.mark.parametrize("ksp_type,should_warn", [
        ("cg", True), ("pipecg", True), ("fcg", False)])
    def test_bf16_warning_matrix(self, ksp_type, should_warn):
        # bf16 V-cycle noise stalls the Fletcher-Reeves recurrence of both
        # cg and pipecg; only fcg's Polak-Ribiere beta is exempt
        A = _identity_op()
        o = SolverOptions(ksp_type=ksp_type, pc_type="mg", ksp_rtol=1e-8,
                          mg_cycle_dtype="bfloat16")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            make_preconditioner(A, o, (16, 16, 16), (1 / 16,) * 3)
        stall = [w for w in caught if "bf16" in str(w.message)]
        assert bool(stall) == should_warn

    @pytest.mark.parametrize("ksp_type", ["cg", "pipecg", "fcg"])
    def test_f32_cycle_no_warning(self, ksp_type):
        A = _identity_op()
        o = SolverOptions(ksp_type=ksp_type, pc_type="mg", ksp_rtol=1e-8,
                          mg_cycle_dtype="float32")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            make_preconditioner(A, o, (16, 16, 16), (1 / 16,) * 3)
        assert not [w for w in caught if "bf16" in str(w.message)]


class TestCensusParser:
    """utils.census HLO parsing — unit-level (the compiled-program
    assertions live in tests/test_aot_multichip.py)."""

    HLO = """\
HloModule jit_f, entry_computation_layout={...}

%wide.body_spmd (p: f32[8,16]) -> f32[8,16] {
  %ar = f32[] all-reduce(f32[] %x), channel_id=1, to_apply=%sum
  %cps = (f32[1,16]{1,0:T(8,128)S(1)}, f32[1,16]{1,0}, u32[]{:S(2)}, u32[]{:S(2)}) collective-permute-start(%slice.1), channel_id=2
  %cpd = f32[1,16]{1,0} collective-permute-done(%cps)
}

ENTRY %main_spmd (arg: f32[8,16]) -> f32[8,16] {
  %a2a = f32[8,16]{1,0} all-to-all(%arg), channel_id=3
  %ag = f32[64,16]{1,0} all-gather(%arg), channel_id=4, dimensions={0}
  %w = f32[8,16]{1,0} while(%arg), condition=%cond.1, body=%wide.body_spmd
}
"""

    def test_counts_and_bytes(self):
        from poissbox_tpu.utils.census import census
        got = census(self.HLO)
        assert got["all-to-all"] == {"count": 1, "bytes": 8 * 16 * 4}
        assert got["all-gather"] == {"count": 1, "bytes": 64 * 16 * 4}
        assert got["all-reduce"] == {"count": 1, "bytes": 4}
        # async permute: counted once (start), payload = ONE buffer,
        # u32 context scalars ignored
        assert got["collective-permute"] == {"count": 1, "bytes": 16 * 4}

    def test_computation_scoping_and_while_body(self):
        from poissbox_tpu.utils.census import census, while_bodies
        assert while_bodies(self.HLO) == ["wide.body_spmd"]
        body = census(self.HLO, computation="wide.body_spmd")
        assert set(body) == {"all-reduce", "collective-permute"}
        main = census(self.HLO, computation="main_spmd")
        assert set(main) == {"all-to-all", "all-gather"}

    def test_max_gather_bytes(self):
        from poissbox_tpu.utils.census import max_gather_bytes
        assert max_gather_bytes(self.HLO) == 64 * 16 * 4

    def test_halo_model_counts(self):
        from poissbox_tpu.mesh import Grid3D
        from poissbox_tpu.utils.census import halo_model
        grid = Grid3D((16, 16, 16)).with_mesh()
        if grid.mesh is None:
            pytest.skip("needs a multi-device mesh")
        from poissbox_tpu.parallel.dist_stencil import local_shape
        loc = local_shape(grid)
        want = halo_model(grid, itemsize=8)
        # 2 permutes per sharded dim, one face plane each
        n_ax = sum(1 for d, n in enumerate(grid.n)
                   if loc[d] != n)
        assert want["count"] == 2 * n_ax


class TestDistFusedUpdate:
    """VERDICT r2 weak #8: the distributed CG path now fuses the x/r
    iterate update with the next iteration's reductions, like the
    single-chip path."""

    def _mesh_grid(self, n=16):
        from poissbox_tpu.mesh import Grid3D
        return Grid3D((n, n, n)).with_mesh()

    def test_sharded_update_matches_unfused(self):
        from poissbox_tpu.parallel.dist_stencil import cg_fused_update_sharded
        grid = self._mesh_grid()
        if grid.mesh is None:
            pytest.skip("needs a multi-device mesh")
        k = jax.random.PRNGKey(3)
        ks = jax.random.split(k, 4)
        x, p, r, ap = (grid.shard(jax.random.normal(kk, grid.n, jnp.float64))
                       for kk in ks)
        alpha = 0.37
        xo, ro, rr, sr = jax.jit(
            lambda *a: cg_fused_update_sharded(*a, grid))(alpha, x, p, r, ap)
        np.testing.assert_allclose(np.asarray(xo), np.asarray(x + alpha * p),
                                   rtol=1e-12, atol=1e-14)
        re = r - alpha * ap
        np.testing.assert_allclose(np.asarray(ro), np.asarray(re),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(float(rr), float(jnp.sum(re * re)),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(sr), float(jnp.sum(re)),
                                   rtol=1e-10, atol=1e-10)

    def test_dist_operator_binds_fused_update(self):
        from poissbox_tpu.ops.stencil import make_laplacian_operator
        grid = self._mesh_grid()
        if grid.mesh is None:
            pytest.skip("needs a multi-device mesh")
        A = make_laplacian_operator(grid, impl="dist")
        assert A.fused_update is not None
        # end-to-end: the fused-update dist CG still matches the serial one
        from poissbox_tpu.solvers.cg import cg
        from poissbox_tpu.mesh import Grid3D
        A_u = make_laplacian_operator(Grid3D(grid.n), impl="roll")
        x_exact = A_u.project(
            jax.random.normal(jax.random.PRNGKey(11), grid.n, jnp.float64))
        b = A_u(x_exact)
        res_u = cg(A_u, b, rtol=1e-10, max_it=400)
        res_s = jax.jit(lambda bb: cg(A, bb, rtol=1e-10,
                                      max_it=400))(grid.shard(b))
        assert bool(res_s.converged)
        assert abs(int(res_s.iterations) - int(res_u.iterations)) <= 1
        np.testing.assert_allclose(np.asarray(res_s.x), np.asarray(res_u.x),
                                   rtol=1e-6, atol=1e-9)


class TestFusedCouplingDots:
    """make_mg_preconditioner.apply_dots: (M r, <r, M r>, sum(M r)) with
    the reductions folded into the final post-smooth kernel (no separate
    HBM pass on the in-place SOR path); cg consumes it automatically."""

    def _setup(self, n=32):
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        grid = Grid3D((n, n, n))
        A = make_laplacian_operator(grid)
        M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig())
        return grid, A, M

    @pytest.mark.slow
    def test_matches_plain_apply(self):
        grid, A, M = self._setup()
        assert M.apply_dots is not None
        r = A.project(jax.random.normal(jax.random.PRNGKey(0), grid.n,
                                        jnp.float64))
        v0 = M(r)
        v1, rv, sv = jax.jit(M.apply_dots)(r)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                   rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(float(rv), float(jnp.sum(r * v0)),
                                   rtol=1e-11)
        np.testing.assert_allclose(float(sv), float(jnp.sum(v0)),
                                   rtol=1e-8, atol=1e-12)

    @pytest.mark.slow
    def test_cg_uses_it_and_converges_identically(self):
        from poissbox_tpu.solvers.cg import cg
        grid, A, M = self._setup()
        x_ex = A.project(jax.random.normal(jax.random.PRNGKey(1), grid.n,
                                           jnp.float64))
        b = A(x_ex)
        res = jax.jit(lambda bb: cg(A, bb, M=M, rtol=1e-10, max_it=50))(b)
        # strip the hook; the explicit-reduction path must agree
        M_plain = lambda r: M(r)
        res0 = jax.jit(lambda bb: cg(A, bb, M=M_plain, rtol=1e-10,
                                     max_it=50))(b)
        assert bool(res.converged)
        assert int(res.iterations) == int(res0.iterations)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(res0.x),
                                   rtol=1e-9, atol=1e-12)

    def test_not_exposed_for_multi_cycle_or_cast(self):
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        grid = Grid3D((32, 32, 32))
        M2 = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(cycles=2))
        assert getattr(M2, "apply_dots", None) is None
        Mb = make_mg_preconditioner(grid.n, grid.deltas,
                                    MGConfig(dtype="bfloat16"))
        assert getattr(Mb, "apply_dots", None) is None

    def test_zero_update_kernel(self):
        # b = r - alpha*Ap formed inside the zero-guess sweep kernel
        from poissbox_tpu.ops.stencil_pallas import (
            sor_rb_zero_sweep_pallas,
            sor_rb_zero_update_pallas,
        )
        n = 32
        d = (1.0 / n,) * 3
        r = jax.random.normal(jax.random.PRNGKey(0), (n,) * 3, jnp.float64)
        ap = jax.random.normal(jax.random.PRNGKey(1), (n,) * 3, jnp.float64)
        alpha = 0.41
        b_new, x1, rr, sr = sor_rb_zero_update_pallas(r, ap, alpha, d, 1.0)
        b0 = r - alpha * ap
        x0 = sor_rb_zero_sweep_pallas(b0, d, 1.0)
        np.testing.assert_allclose(np.asarray(b_new), np.asarray(b0),
                                   rtol=1e-13, atol=1e-14)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(float(rr), float(jnp.sum(b0 * b0)),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(sr), float(jnp.sum(b0)),
                                   rtol=1e-8, atol=1e-10)

    def test_apply_update_dots_matches_plain(self):
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        grid = Grid3D((32, 32, 32))
        # impl='pallas' forces the fused-pre path in interpret mode off-TPU
        M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(impl="pallas"))
        assert getattr(M, "apply_update_dots", None) is not None
        r = jax.random.normal(jax.random.PRNGKey(5), grid.n, jnp.float64)
        ap = jax.random.normal(jax.random.PRNGKey(6), grid.n, jnp.float64)
        alpha = 0.37
        b0 = r - alpha * ap
        v0 = M(b0)
        v, b_new, rr, sr, rv, sv = jax.jit(M.apply_update_dots)(r, ap, alpha)
        np.testing.assert_allclose(np.asarray(b_new), np.asarray(b0),
                                   rtol=1e-13, atol=1e-14)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v0),
                                   rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(float(rr), float(jnp.sum(b0 * b0)),
                                   rtol=1e-12)
        np.testing.assert_allclose(float(rv), float(jnp.sum(b0 * v0)),
                                   rtol=1e-11)
        np.testing.assert_allclose(float(sv), float(jnp.sum(v0)),
                                   rtol=1e-8, atol=1e-12)

    def test_cg_fused_m_matches(self):
        from poissbox_tpu.solvers.cg import cg
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        grid = Grid3D((32, 32, 32))
        A = make_laplacian_operator(grid, impl="pallas")
        M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig(impl="pallas"))
        x_ex = A.project(jax.random.normal(jax.random.PRNGKey(7), grid.n,
                                           jnp.float64))
        b = A(x_ex)
        res = jax.jit(lambda z: cg(A, z, M=M, rtol=1e-10, max_it=60))(b)
        M_plain = lambda z: M(z)  # strips the fusion hooks
        res0 = jax.jit(lambda z: cg(A, z, M=M_plain, rtol=1e-10,
                                    max_it=60))(b)
        assert bool(res.converged)
        assert int(res.iterations) == int(res0.iterations)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(res0.x),
                                   rtol=1e-8, atol=1e-11)

    def test_update_dots_gating(self):
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        grid = Grid3D((32, 32, 32))
        # jacobi smoother: no fused zero+update kernel -> hook absent
        Mj = make_mg_preconditioner(grid.n, grid.deltas,
                                    MGConfig(impl="pallas",
                                             smoother="jacobi"))
        assert getattr(Mj, "apply_update_dots", None) is None
        # pre_smooth=0: nothing to fuse into
        M0 = make_mg_preconditioner(grid.n, grid.deltas,
                                    MGConfig(impl="pallas", pre_smooth=0,
                                             post_smooth=2))
        assert getattr(M0, "apply_update_dots", None) is None

    def test_inplace_kernel_dots(self):
        # the fused in-place kernel path (interpret mode off-TPU)
        from poissbox_tpu.ops.stencil_inplace import _sor_rb_multi_inplace
        from poissbox_tpu.ops.stencil_pallas import sor_rb_sweep_pallas
        n = 32
        u = jax.random.normal(jax.random.PRNGKey(2), (n, n, n), jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(3), (n, n, n), jnp.float64)
        deltas = (1.0 / n,) * 3
        x, rv, sv = _sor_rb_multi_inplace(u, b, deltas, 1.0, False, 1,
                                          dots=True)
        x0 = sor_rb_sweep_pallas(u, b, deltas, 1.0, False)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(float(rv), float(jnp.sum(x0 * b)),
                                   rtol=1e-11)
        np.testing.assert_allclose(float(sv), float(jnp.sum(x0)),
                                   rtol=1e-8, atol=1e-10)


class TestFusedLegTc1:
    def test_single_coarse_plane_blocks(self):
        # regression: tc=1 blocks (VMEM-forced at 768^3-class planes) hit
        # zero-size concat operands in the fused V-cycle leg kernels
        from poissbox_tpu.ops.stencil_pallas import (
            _resid_xrestrict,
            _xprolong_add,
        )
        n = 16
        d = (1.0 / n,) * 3
        u = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float64)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n, n), jnp.float64)
        np.testing.assert_allclose(
            np.asarray(_resid_xrestrict(u, b, d, 1)),
            np.asarray(_resid_xrestrict(u, b, d, 4)), rtol=1e-13, atol=1e-11)
        e = jax.random.normal(jax.random.PRNGKey(2), (n // 2, n, n),
                              jnp.float64)
        np.testing.assert_allclose(
            np.asarray(_xprolong_add(u, e, 1)),
            np.asarray(_xprolong_add(u, e, 4)), rtol=1e-13, atol=1e-13)


class TestDeferredPUpdate:
    """cg's deferred search-direction path: p' = (v - zshift) + beta*p
    forms inside the fused matvec kernel (pupdate_lapl_dot_pallas).
    Measured slower than the eager pass on the 7-point stack (doubled
    halo fetches — see ops/stencil.py), so it is NOT bound by default;
    the capability stays correct and tested."""

    def _op(self, n=16):
        import dataclasses
        from poissbox_tpu.ops.stencil_pallas import pupdate_lapl_dot_pallas
        grid = Grid3D((n, n, n))
        A = make_laplacian_operator(grid, impl="pallas")
        deltas = grid.deltas
        A = dataclasses.replace(
            A, pupdate_apply_dot=lambda v, p, beta, zs:
            pupdate_lapl_dot_pallas(v, p, beta, zs, deltas))
        return grid, A

    def test_kernel_matches_eager(self):
        from poissbox_tpu.ops.stencil_pallas import (
            apply_laplacian_pallas,
            pupdate_lapl_dot_pallas,
        )
        n = 16
        d = (1.0 / n,) * 3
        v = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float64)
        p = jax.random.normal(jax.random.PRNGKey(1), (n, n, n), jnp.float64)
        pn, ap, pap = pupdate_lapl_dot_pallas(v, p, 0.73, 0.031, d)
        pn0 = (v - 0.031) + 0.73 * p
        ap0 = apply_laplacian_pallas(pn0, d)
        np.testing.assert_allclose(np.asarray(pn), np.asarray(pn0),
                                   rtol=1e-13, atol=1e-14)
        np.testing.assert_allclose(np.asarray(ap), np.asarray(ap0),
                                   rtol=1e-12, atol=1e-8)
        np.testing.assert_allclose(float(pap), float(jnp.sum(pn0 * ap0)),
                                   rtol=1e-11)

    def test_cg_deferred_matches_eager(self):
        from poissbox_tpu.solvers.cg import cg
        grid, A = self._op()
        A0 = make_laplacian_operator(grid, impl="roll")
        x_ex = A0.project(jax.random.normal(jax.random.PRNGKey(2), grid.n,
                                            jnp.float64))
        b = A0(x_ex)
        res = jax.jit(lambda bb: cg(A, bb, rtol=1e-10, max_it=400))(b)
        res0 = jax.jit(lambda bb: cg(A0, bb, rtol=1e-10, max_it=400))(b)
        assert bool(res.converged)
        assert abs(int(res.iterations) - int(res0.iterations)) <= 1
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(res0.x),
                                   rtol=1e-7, atol=1e-10)

    @pytest.mark.slow
    def test_cg_deferred_preconditioned(self):
        from poissbox_tpu.solvers.cg import cg
        from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
        grid, A = self._op()
        M = make_mg_preconditioner(grid.n, grid.deltas, MGConfig())
        x_ex = A.project(jax.random.normal(jax.random.PRNGKey(3), grid.n,
                                           jnp.float64))
        b = A(x_ex)
        res = jax.jit(lambda bb: cg(A, bb, M=M, rtol=1e-10, max_it=50))(b)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ex),
                                   rtol=1e-6, atol=1e-9)


class TestLiveMonitor:
    """VERDICT r2 task 5: residual lines must appear DURING a jitted solve,
    not from post-hoc history rendering."""

    def _problem(self):
        grid = Grid3D((16, 16, 16))
        A = make_laplacian_operator(grid)
        x = A.project(jax.random.normal(jax.random.PRNGKey(7), grid.n,
                                        jnp.float64))
        return A, A(x)

    @pytest.mark.parametrize("ksp_type", ["cg", "fcg", "pipecg"])
    def test_streams_inside_jit(self, ksp_type, capfd):
        A, b = self._problem()
        o = SolverOptions(ksp_type=ksp_type, pc_type="jacobi",
                          ksp_rtol=1e-8, ksp_max_it=100, ksp_monitor=True)
        slv = jax.jit(lambda bb: make_solver(A, o, b.shape,
                                             (1 / 16,) * 3)(bb).x)
        jax.block_until_ready(slv(b))
        jax.effects_barrier()
        out = capfd.readouterr().out
        lines = [ln for ln in out.splitlines() if "KSP Residual norm" in ln]
        assert len(lines) >= 3, out
        # iteration counters present and starting at 0
        assert lines[0].split()[0] == "0"
        # the streamed norms are real decreasing residuals
        norms = [float(ln.split()[-1]) for ln in lines]
        assert norms[-1] < norms[0] * 1e-6

    def test_solve_does_not_duplicate(self, capfd):
        A, b = self._problem()
        opts = Options(["-ksp_type", "cg", "-pc_type", "jacobi",
                        "-ksp_rtol", "1e-8", "-ksp_max_it", "100",
                        "-ksp_monitor"])
        res = solve(A, b, opts, shape=b.shape, deltas=(1 / 16,) * 3)
        jax.block_until_ready(res.x)
        jax.effects_barrier()
        out = capfd.readouterr().out
        lines = [ln for ln in out.splitlines() if "KSP Residual norm" in ln]
        starts = [ln.split()[0] for ln in lines]
        assert len(starts) == len(set(starts)), "duplicated monitor lines"

    def test_off_by_default(self, capfd):
        A, b = self._problem()
        o = SolverOptions(ksp_type="cg", pc_type="jacobi", ksp_rtol=1e-8,
                          ksp_max_it=100)
        jax.block_until_ready(
            make_solver(A, o, b.shape, (1 / 16,) * 3)(b).x)
        jax.effects_barrier()
        assert "KSP Residual norm" not in capfd.readouterr().out
