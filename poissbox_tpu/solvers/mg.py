"""Geometric multigrid V-cycle preconditioner — the `-pc_type gamg` replacement.

The reference preconditions CG with PETSc's algebraic multigrid (GAMG) using
Richardson+SOR level smoothing and an SVD coarse solve
(`-pc_type gamg -mg_coarse_sub_pc_type svd -mg_levels_ksp_rtol 1.0e-4
-mg_levels_ksp_type richardson -mg_levels_pc_type sor`, reference
README.md:42-47). The grid here is structured and uniform, so the idiomatic
equivalent is *geometric* multigrid:

  * hierarchy: each level halves (nx, ny, nz); operators are re-discretized
    7-point Laplacians (uniform periodic grid — re-discretization and
    Galerkin coarsening agree to the order of the scheme);
  * smoothers: red-black SOR (the parallel-correct SOR ordering — plain
    lexicographic SOR is sequential and has no TPU analogue) or weighted
    Jacobi, both expressed as masked stencil updates that XLA fuses; the
    post-smoother runs colors in reverse (black-red) so one V-cycle is a
    symmetric operator, as CG preconditioning requires;
  * transfers: cell-centered full-weighting restriction and trilinear
    prolongation (the variational pair P = 2 R^T), in two cross-checked
    formulations: reshapes/rolls that GSPMD partitions ('roll'), and
    per-axis banded-matrix contractions on the MXU ('matmul', ~2.5x
    faster on TPU — the default there);
  * coarse solve: dense pseudo-inverse of the assembled coarse Laplacian via
    SVD with the zero singular value (constant null space) truncated —
    exactly the `-mg_coarse_sub_pc_type svd` semantics; computed once at
    setup with numpy and folded into the compiled cycle as a constant.

The whole V-cycle is a pure function of the input residual: levels are a
static Python list, so jit unrolls the cycle into one fused program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from poissbox_tpu.ops.stencil import apply_laplacian, default_impl

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MGConfig:
    """Multigrid knobs, mirroring the reference's `-mg_*` flag set."""

    levels: int = 0               # 0 = auto (coarsen while divisible, > coarse_size)
    smoother: str = "sor"         # "sor" (red-black) | "jacobi" | "chebyshev"
    pre_smooth: int = 2           # smoother sweeps before coarse correction
    post_smooth: int = 2          # ... and after (reversed ordering)
    damping: Optional[float] = None  # None = per-smoother default (sor 1.0, jacobi 8/9)
    coarse: str = "svd"           # "svd" | "direct" (both dense; svd truncates nullspace)
    coarse_size: int = 4          # stop coarsening at min(n) <= coarse_size
    cycles: int = 1               # V-cycles per preconditioner application
    impl: str = "auto"            # level-operator impl: auto | roll | pallas
    transfers: str = "auto"       # restriction/prolongation: auto | roll | matmul


@dataclasses.dataclass(frozen=True)
class _Level:
    shape: tuple[int, int, int]
    deltas: tuple[float, float, float]
    diag: float                   # constant stencil diagonal -2*sum(1/d^2)


def _use_pallas(lvl: _Level, cfg: MGConfig) -> bool:
    impl = cfg.impl
    if impl == "auto":
        impl = default_impl(lvl.shape)
    return impl == "pallas"


def _lapl(x: Array, lvl: _Level, cfg: MGConfig) -> Array:
    """Level-operator application; fine levels use the tiled Pallas kernel
    on single-device TPU runs, coarse/sharded levels the GSPMD rolls."""
    if _use_pallas(lvl, cfg):
        from poissbox_tpu.ops.stencil_pallas import apply_laplacian_pallas
        return apply_laplacian_pallas(x, lvl.deltas)
    return apply_laplacian(x, lvl.deltas)


def _residual(x: Array, b: Array, lvl: _Level, cfg: MGConfig) -> Array:
    if _use_pallas(lvl, cfg):
        from poissbox_tpu.ops.stencil_pallas import residual_pallas
        return residual_pallas(x, b, lvl.deltas)
    return b - apply_laplacian(x, lvl.deltas)


def _build_levels(shape, deltas, cfg: MGConfig) -> list[_Level]:
    levels = []
    n = tuple(shape)
    d = tuple(float(x) for x in deltas)
    while True:
        diag = -2.0 * sum(1.0 / dd**2 for dd in d)
        levels.append(_Level(n, d, diag))
        stop_size = min(n) <= cfg.coarse_size
        stop_div = any(x % 2 for x in n)
        stop_count = cfg.levels > 0 and len(levels) >= cfg.levels
        if stop_size or stop_div or stop_count:
            return levels
        n = tuple(x // 2 for x in n)
        d = tuple(2.0 * dd for dd in d)


# ---------------------------------------------------------------------------
# transfers (cell-centered, periodic)
# ---------------------------------------------------------------------------

def restrict(f: Array) -> Array:
    """Full-weighting restriction for cell-centered grids: R = P^T / 8,
    the exact (scaled) adjoint of :func:`prolong` — the variational pairing
    that keeps the V-cycle a symmetric operator (CG requires it).

    Along each axis: c_I = (3 f_{2I} + 3 f_{2I+1} + f_{2I+2} + f_{2I-1}) / 8,
    periodic.
    """
    for ax in range(f.ndim):
        n = f.shape[ax]
        pairs = f.reshape(f.shape[:ax] + (n // 2, 2) + f.shape[ax + 1:])
        even = jnp.take(pairs, 0, axis=ax + 1)   # f_{2I}
        odd = jnp.take(pairs, 1, axis=ax + 1)    # f_{2I+1}
        up = jnp.roll(even, -1, ax)              # f_{2I+2}
        dn = jnp.roll(odd, 1, ax)                # f_{2I-1}
        f = (3.0 * (even + odd) + up + dn) * 0.125
    return f


def prolong(c: Array) -> Array:
    """Trilinear prolongation for cell-centered grids.

    Along each axis a fine cell at i = 2I + s interpolates 3/4 from its
    parent and 1/4 from the parent's (periodic) neighbor on side s.
    """
    for ax in range(c.ndim):
        even = 0.75 * c + 0.25 * jnp.roll(c, 1, ax)    # fine i = 2I
        odd = 0.75 * c + 0.25 * jnp.roll(c, -1, ax)    # fine i = 2I + 1
        c = jnp.stack([even, odd], axis=ax + 1)
        c = c.reshape(c.shape[:ax] + (c.shape[ax] * 2,) + c.shape[ax + 2:])
    return c


# -- MXU formulation: transfers as banded-matrix contractions ---------------

@functools.lru_cache(maxsize=None)
def _restrict_matrix(n: int, dtype_name: str):
    """1-D full-weighting restriction as a dense (n/2, n) banded matrix.
    P = 2 R^T (the variational pair). Cached per (n, dtype)."""
    import jax

    with jax.ensure_compile_time_eval():
        R = np.zeros((n // 2, n))
        for I in range(n // 2):
            R[I, (2 * I - 1) % n] += 1.0 / 8.0
            R[I, 2 * I] += 3.0 / 8.0
            R[I, (2 * I + 1) % n] += 3.0 / 8.0
            R[I, (2 * I + 2) % n] += 1.0 / 8.0
        return jnp.asarray(R, jnp.dtype(dtype_name))


def restrict_mm(f: Array) -> Array:
    """restrict() evaluated as three MXU contractions — one banded matmul
    per axis, each a single fused memory pass (vs the roll formulation's
    many). f32 inputs use HIGHEST precision so the 4-tap sums stay exact."""
    import jax

    prec = jax.lax.Precision.HIGHEST
    out = f
    for ax in range(3):
        R = _restrict_matrix(f.shape[ax], jnp.dtype(f.dtype).name)
        out = jnp.moveaxis(
            jnp.tensordot(R, out, axes=(1, ax), precision=prec), 0, ax)
    return out


def prolong_mm(c: Array) -> Array:
    """prolong() as three MXU contractions with P = 2 R^T."""
    import jax

    prec = jax.lax.Precision.HIGHEST
    out = c
    for ax in range(3):
        R = _restrict_matrix(2 * c.shape[ax], jnp.dtype(c.dtype).name)
        out = jnp.moveaxis(
            jnp.tensordot(2.0 * R.T, out, axes=(1, ax), precision=prec), 0, ax)
    return out


# ---------------------------------------------------------------------------
# smoothers
# ---------------------------------------------------------------------------

def _color_mask(shape, dtype) -> Array:
    """Red mask: (i + j + k) even. Static per level; folded into the kernel."""
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return (((ii + jj + kk) % 2) == 0).astype(dtype)


def _smooth(x: Array, b: Array, lvl: _Level, cfg: MGConfig, sweeps: int,
            reverse: bool) -> Array:
    """`sweeps` smoothing iterations of the level operator.

    This is the Richardson-with-SOR/Jacobi level solve of the reference's MG
    configuration (reference README.md:43-47), with fixed sweep count in
    place of the inner rtol (fixed iteration counts keep the cycle a linear,
    symmetric operator — required for CG — and compile to straight-line
    code).
    """
    inv_diag = 1.0 / lvl.diag
    pallas = _use_pallas(lvl, cfg)
    if cfg.smoother == "jacobi":
        w = 8.0 / 9.0 if cfg.damping is None else cfg.damping
        if pallas:
            from poissbox_tpu.ops.stencil_pallas import jacobi_sweep_pallas
            for _ in range(sweeps):
                x = jacobi_sweep_pallas(x, b, lvl.deltas, w)
            return x
        for _ in range(sweeps):
            x = x + w * inv_diag * (b - apply_laplacian(x, lvl.deltas))
        return x
    if cfg.smoother == "chebyshev":
        # Chebyshev polynomial smoothing (PETSc GAMG's modern default level
        # solver, `-mg_levels_ksp_type chebyshev`). The periodic 7-point
        # spectrum is known analytically — eigenvalues in [-4*sum(1/d^2), 0]
        # — so the usual power-iteration estimate is unnecessary; smooth the
        # upper 90% of the spectrum ([0.1, 1.0]*lambda_max in magnitude,
        # GAMG's convention). A polynomial in A is symmetric by
        # construction, so pre/post ordering needs no reversal.
        m = 4.0 * sum(1.0 / dd**2 for dd in lvl.deltas)
        a_lo, b_hi = -m, -0.1 * m          # signed spectrum interval
        theta = 0.5 * (a_lo + b_hi)
        delta = 0.5 * (b_hi - a_lo)
        sigma1 = theta / delta
        degree = max(2 * sweeps, 2)        # ~cost parity with 2-color SOR
        r = _residual(x, b, lvl, cfg)
        d = r / theta
        x = x + d
        rho = 1.0 / sigma1
        for _ in range(degree - 1):
            r = _residual(x, b, lvl, cfg)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * r
            x = x + d
            rho = rho_new
        return x
    if cfg.smoother == "sor":
        w = 1.0 if cfg.damping is None else cfg.damping
        order = [1, 0] if reverse else [0, 1]  # color 0 = red, (i+j+k) even
        if pallas:
            from poissbox_tpu.ops.stencil_pallas import sor_rb_sweep_pallas
            for _ in range(sweeps):
                x = sor_rb_sweep_pallas(x, b, lvl.deltas, w, reverse=reverse)
            return x
        red = _color_mask(lvl.shape, b.dtype)
        masks = {0: red, 1: 1.0 - red}
        for _ in range(sweeps):
            for color in order:
                r = b - apply_laplacian(x, lvl.deltas)
                x = x + (w * inv_diag) * masks[color] * r
        return x
    raise ValueError(f"unknown smoother {cfg.smoother!r} (expected sor|jacobi|chebyshev)")


# ---------------------------------------------------------------------------
# coarse solve
# ---------------------------------------------------------------------------

def _dense_periodic_laplacian(shape, deltas) -> np.ndarray:
    """Assemble the coarse 7-point periodic Laplacian densely (numpy, setup
    time). Kronecker structure: A = Lx (x) Iy (x) Iz + ... ."""
    def l1d(n, d):
        L = np.zeros((n, n))
        idx = np.arange(n)
        L[idx, idx] = -2.0
        L[idx, (idx + 1) % n] = 1.0
        L[idx, (idx - 1) % n] = 1.0
        return L / d**2

    nx, ny, nz = shape
    dx, dy, dz = deltas
    Ix, Iy, Iz = np.eye(nx), np.eye(ny), np.eye(nz)
    A = (
        np.kron(np.kron(l1d(nx, dx), Iy), Iz)
        + np.kron(np.kron(Ix, l1d(ny, dy)), Iz)
        + np.kron(np.kron(Ix, Iy), l1d(nz, dz))
    )
    return A


def _coarse_pinv(lvl: _Level, cfg: MGConfig, dtype) -> Array:
    """SVD pseudo-inverse of the coarse operator, nullspace truncated —
    the `-mg_coarse_sub_pc_type svd` coarse solve."""
    A = _dense_periodic_laplacian(lvl.shape, lvl.deltas)
    if cfg.coarse not in ("svd", "direct"):
        raise ValueError(f"unknown coarse solve {cfg.coarse!r}")
    # rcond cuts the zero singular value of the singular periodic operator;
    # "direct" on this singular system is the same least-squares solve.
    pinv = np.linalg.pinv(A, rcond=1e-10)
    return jnp.asarray(pinv, dtype)


# ---------------------------------------------------------------------------
# V-cycle
# ---------------------------------------------------------------------------

def v_cycle(levels: Sequence[_Level], coarse_pinv: Array, cfg: MGConfig,
            b: Array, idx: int = 0) -> Array:
    """One V-cycle for the level-`idx` system A_idx e = b. Pure; levels are
    static so jit unrolls the recursion."""
    lvl = levels[idx]
    if idx == len(levels) - 1:
        flat = b.reshape(-1)
        return (coarse_pinv @ flat).reshape(lvl.shape)
    x = _smooth(jnp.zeros_like(b), b, lvl, cfg, cfg.pre_smooth, reverse=False)
    r = _residual(x, b, lvl, cfg)
    tr = cfg.transfers
    if tr == "auto":
        tr = "matmul" if jax.devices()[0].platform == "tpu" else "roll"
    down, up = (restrict_mm, prolong_mm) if tr == "matmul" else (restrict, prolong)
    ec = v_cycle(levels, coarse_pinv, cfg, down(r), idx + 1)
    x = x + up(ec)
    return _smooth(x, b, lvl, cfg, cfg.post_smooth, reverse=True)


def make_mg_preconditioner(
    shape: Sequence[int],
    deltas: Sequence[float],
    cfg: MGConfig = MGConfig(),
    dtype=jnp.float64,
) -> Callable[[Array], Array]:
    """Build M(r) ~= A^{-1} r, a jit-compatible V-cycle closure.

    Setup (hierarchy + dense coarse pseudo-inverse) runs once here; the
    returned closure is linear and symmetric, suitable as a CG
    preconditioner.
    """
    levels = _build_levels(tuple(shape), tuple(deltas), cfg)
    pinv = _coarse_pinv(levels[-1], cfg, dtype)

    def M(r: Array) -> Array:
        x = v_cycle(levels, pinv, cfg, r)
        for _ in range(cfg.cycles - 1):
            x = x + v_cycle(levels, pinv, cfg, r - _lapl(x, levels[0], cfg))
        return x

    return M
