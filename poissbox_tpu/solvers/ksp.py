"""Options-driven solver dispatch — the KSPSetFromOptions / KSPSolve analog.

The reference wires solver choice entirely through the options database:
`KSPCreate` + `KSPSetOperators` + `KSPSetFromOptions` + `KSPSolve`
(reference src/poissbox.f90:293-296), configured by `-ksp_*`/`-pc_*`/`-mg_*`
flags (reference README.md:42-49). :func:`make_solver` assembles the same
pipeline from a :class:`SolverOptions`: preconditioner construction
(none/jacobi/mg), Krylov method selection (cg/fcg/gmres/richardson), stopping
controls, and monitor output.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from poissbox_tpu.config import Options, SolverOptions
from poissbox_tpu.linops import LinearOperator
from poissbox_tpu.solvers.cg import cg
from poissbox_tpu.solvers.gmres import gmres
from poissbox_tpu.solvers.mg import MGConfig, make_mg_preconditioner
from poissbox_tpu.solvers.result import SolveResult
from poissbox_tpu.solvers.richardson import richardson

Array = jax.Array


def make_preconditioner(
    A: LinearOperator,
    opts: SolverOptions,
    shape: Optional[Sequence[int]] = None,
    deltas: Optional[Sequence[float]] = None,
    dtype=jnp.float64,
    grid=None,
) -> Optional[Callable[[Array], Array]]:
    """Build the preconditioner closure selected by `pc_type`."""
    if opts.pc_type in ("none", ""):
        return None
    if opts.pc_type == "jacobi":
        if A.diagonal is None:
            raise ValueError("jacobi preconditioning needs an operator diagonal")
        inv_diag = 1.0 / A.diagonal()
        return lambda r: inv_diag * r
    if opts.pc_type == "fft":
        # exact periodic 7-point inverse as a spectrally-equivalent
        # preconditioner (for the compact 6th-order system, variable
        # coefficients, ...); distributed via pencil FFTs on meshed grids
        if grid is not None:
            deltas = grid.deltas if deltas is None else deltas
        if deltas is None:
            raise ValueError("fft preconditioning needs the grid deltas")
        from poissbox_tpu.solvers.fft import make_fft_preconditioner
        return make_fft_preconditioner(deltas, grid=grid)
    if opts.pc_type == "mg":
        if shape is None or deltas is None:
            raise ValueError("mg preconditioning needs the grid shape and deltas")
        smoother = opts.mg_levels_pc_type
        if opts.mg_levels_ksp_type == "chebyshev":
            # PETSc expresses Chebyshev as the level KSP type
            smoother = "chebyshev"
        # `-mg_levels_ksp_rtol` semantics: the level solve stops at rtol or
        # max_it, whichever binds first — statically calibrated to a fixed
        # sweep count via the smoother's smoothing factor (see
        # solvers.mg.sweeps_for_level_rtol). When NEITHER flag is given,
        # pass the -1 auto sentinel through so solvers.mg._resolve_sweeps
        # picks the size-aware optimum — the options entry point and
        # MGConfig() then build the same cycle (one solver of record,
        # reference README.md:42-47).
        from poissbox_tpu.solvers.mg import sweeps_for_level_rtol
        rtol_set = opts.mg_levels_ksp_rtol > 0.0
        max_set = opts.mg_levels_ksp_max_it >= 0
        if rtol_set or max_set:
            lv_rtol = opts.mg_levels_ksp_rtol if rtol_set else 1.0e-4
            lv_max = opts.mg_levels_ksp_max_it if max_set else 3
            sweeps = sweeps_for_level_rtol(smoother, lv_rtol, lv_max)
        else:
            sweeps = -1  # size-aware auto
        if (opts.mg_cycle_dtype == "bfloat16" and opts.ksp_rtol < 1e-5
                and opts.ksp_type != "fcg"):
            # measured on v5e: a bf16 V-cycle's output noise floor stalls
            # the FLETCHER-REEVES recursion near ~5e-6 relative — the solve
            # then spins to max_it without converging (512^3: 40 it, no
            # convergence). Flexible CG's Polak-Ribiere beta stays
            # convergent (512^3: 10 it to 1e-6), so fcg is exempt; plain
            # cg+bf16 is for loose tolerances or refinement inner solves.
            import warnings
            warnings.warn(
                f"mg_cycle_dtype=bfloat16 with ksp_rtol={opts.ksp_rtol:g}: "
                "bf16 preconditioner noise stalls CG near 5e-6 relative; "
                "use -ksp_type fcg, ksp_rtol >= 1e-5, or solve_refined",
                stacklevel=2)
        cfg = MGConfig(
            levels=opts.mg_levels,
            smoother=smoother,
            pre_smooth=sweeps,
            post_smooth=sweeps,
            damping=None if opts.mg_levels_damping == 1.0
            and opts.mg_levels_pc_type == "jacobi" else opts.mg_levels_damping,
            coarse=opts.mg_coarse_pc_type,
            transfers=opts.mg_transfers,
            impl=opts.mg_impl,
            cycles=opts.mg_cycles,
            cycle=opts.mg_cycle,
            dtype=opts.mg_cycle_dtype,
            pre_dtype=opts.mg_pre_dtype,
        )
        return make_mg_preconditioner(shape, deltas, cfg, dtype, grid=grid)
    raise ValueError(
        f"unknown pc_type {opts.pc_type!r} (expected none|jacobi|fft|mg)")


def make_solver(
    A: LinearOperator,
    opts: SolverOptions | Options | None = None,
    shape: Optional[Sequence[int]] = None,
    deltas: Optional[Sequence[float]] = None,
    dtype=jnp.float64,
    grid=None,
) -> Callable[[Array], SolveResult]:
    """Assemble a jit-compatible `solve(b) -> SolveResult` closure."""
    if opts is None:
        opts = SolverOptions()
    elif isinstance(opts, Options):
        opts = SolverOptions.from_options(opts)

    # direct solvers take no preconditioner — skip the (possibly
    # expensive) MG setup entirely
    if grid is not None:
        shape = grid.n if shape is None else shape
        deltas = grid.deltas if deltas is None else deltas
    M = (None if opts.ksp_type == "fft"
         else make_preconditioner(A, opts, shape, deltas, dtype, grid=grid))
    common = dict(M=M, rtol=opts.ksp_rtol, atol=opts.ksp_atol,
                  max_it=opts.ksp_max_it)

    if opts.ksp_type in ("cg", "fcg"):
        # fcg = flexible CG (PETSc KSPFCG): Polak-Ribiere beta, robust to
        # nonstationary preconditioners (bf16 V-cycles, inner Krylov)
        return lambda b, x0=None: cg(A, b, x0, norm_type=opts.ksp_norm_type,
                                     flexible=opts.ksp_type == "fcg",
                                     monitor=opts.ksp_monitor,
                                     **common)
    if opts.ksp_type == "pipecg":
        # single overlapped reduction per iteration (PETSc KSPPIPECG);
        # for meshes where psum latency dominates — see solvers/pipecg.py
        from poissbox_tpu.solvers.pipecg import pipecg
        return lambda b, x0=None: pipecg(A, b, x0,
                                         norm_type=opts.ksp_norm_type,
                                         monitor=opts.ksp_monitor,
                                         **common)
    if opts.ksp_type == "gmres":
        return lambda b, x0=None: gmres(A, b, x0, restart=opts.gmres_restart,
                                        **common)
    if opts.ksp_type == "richardson":
        return lambda b, x0=None: richardson(A, b, x0, **common)
    if opts.ksp_type == "fft":
        if deltas is None:
            raise ValueError("fft direct solve needs the grid deltas")
        from poissbox_tpu.solvers.fft import fft_solver_result
        return lambda b, x0=None: fft_solver_result(A, b, deltas, grid=grid)
    raise ValueError(
        f"unknown ksp_type {opts.ksp_type!r} "
        "(expected cg|fcg|pipecg|gmres|richardson|fft)")


def solve(
    A: LinearOperator,
    b: Array,
    opts: SolverOptions | Options | None = None,
    x0: Optional[Array] = None,
    shape: Optional[Sequence[int]] = None,
    deltas: Optional[Sequence[float]] = None,
    grid=None,
) -> SolveResult:
    """One-shot options-driven solve (KSPSolve analogue).

    Prints `-ksp_monitor` / `-ksp_converged_reason` style output when those
    flags are set (reference README.md:48-49).
    """
    db = opts if isinstance(opts, Options) else None
    if isinstance(opts, Options):
        opts = SolverOptions.from_options(opts)
    opts = opts or SolverOptions()
    log_view = db is not None and db.get_bool("log_view")
    import time as _time
    t_setup0 = _time.perf_counter()
    solver = make_solver(A, opts, shape, deltas, b.dtype, grid=grid)
    t_setup = _time.perf_counter() - t_setup0
    t0 = _time.perf_counter()
    result = solver(b, x0)
    jax.block_until_ready(result.x)
    t_solve = _time.perf_counter() - t0
    if log_view:
        # `-log_view` analogue (PETSc's per-stage summary; the reference
        # recommends it for performance work, reference README.md:48-49):
        # setup (preconditioner build) vs solve wall, iteration rate, and
        # throughput. Wall-clock including compile on first call — rerun
        # for the warm number, or use utils.profiling.solve_time for
        # differenced device-side timing.
        it = max(int(result.iterations), 1)
        ndof = b.size
        print("log_view: stage        time")
        print(f"log_view:   setup      {t_setup:10.4f} s")
        print(f"log_view:   solve      {t_solve:10.4f} s  "
              f"({int(result.iterations)} iterations, "
              f"{t_solve / it * 1e3:.3f} ms/it, "
              f"{ndof * it / max(t_solve, 1e-12) / 1e9:.2f} GDoF/s)")
    if db is not None and (db.get_bool("options_left")
                           or db.get_bool("options_error_if_unused")):
        # `-options_left` semantics: after solver assembly, complain about
        # set-but-unconsumed options (PETSc prints this at finalize;
        # reference src/poissbox.f90:295 wires everything through the DB)
        db.check_unused()
    if opts.ksp_monitor and opts.ksp_type not in ("cg", "fcg", "pipecg"):
        # cg/fcg/pipecg stream live from inside the jitted loop
        # (solvers.cg.emit_monitor); post-hoc lines cover the rest
        for line in result.monitor_lines():
            print(line)
    if opts.ksp_converged_reason:
        r = result.reason_enum()
        print(f"Linear solve {r.message} (reason {r.name}, "
              f"iterations {int(result.iterations)})")
    return result
