"""In-place (aliased, manually pipelined) smoother kernel tests.

The in-place kernels must be mathematically identical to the out-of-place
sweeps — every read sees the OLD field values despite the aliased
write-back (the lagged-write schedule). Interpret mode on CPU executes
the same DMA program a TPU runs; the real-chip validation
(bench/exp_inplace.py) additionally showed bit-equality at 512^3.
"""

import jax
import jax.numpy as jnp
import pytest

from poissbox_tpu.ops import stencil_inplace as si
from poissbox_tpu.ops.stencil import apply_laplacian


@pytest.fixture
def fields(rng):
    n = 32
    u = jnp.asarray(rng.uniform(-1.0, 1.0, (n, n, n)), jnp.float32)
    b = jnp.asarray(rng.uniform(-1.0, 1.0, (n, n, n)), jnp.float32)
    return u, b, (1.0 / n,) * 3


def test_jacobi_inplace_matches_rolls(fields):
    u, b, d = fields
    w = 8.0 / 9.0
    winv = w / (-2.0 * sum(1.0 / dd**2 for dd in d))
    want = u + winv * (b - apply_laplacian(u, d))
    got = si._jacobi_inplace(u, b, d, w)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-6


@pytest.mark.parametrize("reverse", [False, True])
def test_sor_rb_inplace_matches_outofplace(fields, reverse):
    from poissbox_tpu.ops.stencil_pallas import _sor_rb
    u, b, d = fields
    want = _sor_rb(u, b, d, 1.0, reverse, 8)
    got = si._sor_rb_inplace(u, b, d, 1.0, reverse)
    assert float(jnp.max(jnp.abs(got - want))) == 0.0


def test_available_gates_small_grids():
    # in-place is for beyond-VMEM grids only; CPU always falls back
    assert not si.available((64, 64, 64), jnp.float32)


@pytest.mark.parametrize("nsweeps", [2, 3])
@pytest.mark.parametrize("reverse", [False, True])
def test_multisweep_matches_repeated_single(fields, nsweeps, reverse):
    """Temporal blocking: k fused sweeps == k consecutive single sweeps."""
    u, b, d = fields
    want = u
    for _ in range(nsweeps):
        want = si._sor_rb_inplace(want, b, d, 1.0, reverse)
    got = si._sor_rb_multi_inplace(u, b, d, 1.0, reverse, nsweeps)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5


def test_sor_rb_zero_matches_sweep_from_zero(fields):
    """The fused zero-guess RB kernel == a generic sweep applied to x=0."""
    from poissbox_tpu.ops.stencil_pallas import (
        _sor_rb, sor_rb_zero_sweep_pallas)
    _, b, d = fields
    for reverse in (False, True):
        want = _sor_rb(jnp.zeros_like(b), b, d, 1.0, reverse, 8)
        got = sor_rb_zero_sweep_pallas(b, d, 1.0, reverse=reverse)
        # fma grouping differs between the two compilations -> f32 roundoff
        assert float(jnp.max(jnp.abs(got - want))) < 1e-9, reverse


class TestStreamingKernels:
    """Round-4 manual-pipeline kernels: the out-of-place streaming matvec
    and the two-in/two-out ALIASED CG fusion kernels (interpret mode runs
    the same DMA program a TPU runs)."""

    def test_stream_matvec_matches_rolls(self, fields):
        u, _, d = fields
        want = apply_laplacian(u, d)
        got = si.apply_laplacian_stream(u, d)
        assert float(jnp.max(jnp.abs(got - want))) == 0.0

    def test_stream_matvec_dot(self, fields):
        u, _, d = fields
        want = apply_laplacian(u, d)
        got, dot = si.apply_laplacian_dot_stream(u, d)
        assert float(jnp.max(jnp.abs(got - want))) == 0.0
        ref = float(jnp.sum(u * want))
        assert abs(float(dot) - ref) <= 1e-5 * abs(ref)

    def test_pupdate_matvec_stream(self, fields):
        u, b, d = fields
        beta, zs = 0.7, 0.013
        pn_want = (u - zs) + beta * b
        ap_want = apply_laplacian(pn_want, d)
        pn, ap, pap = si.pupdate_matvec_stream(u, b, beta, zs, d)
        assert float(jnp.max(jnp.abs(pn - pn_want))) < 1e-6
        scale = float(jnp.max(jnp.abs(ap_want)))
        assert float(jnp.max(jnp.abs(ap - ap_want))) < 1e-6 * scale
        ref = float(jnp.sum(pn_want * ap_want))
        assert abs(float(pap) - ref) <= 1e-4 * abs(ref)

    @pytest.mark.parametrize("out_dtype", [None, jnp.bfloat16])
    def test_zero_update_stream(self, fields, out_dtype):
        from poissbox_tpu.solvers.mg import MGConfig, _Level, _smooth_impl
        u, b, d = fields
        alpha = 0.37
        b_want = u - alpha * b
        n = u.shape[0]
        lvl = _Level((n, n, n), d, -2.0 * sum(1.0 / dd**2 for dd in d))
        cfg = MGConfig(smoother="sor", pre_smooth=1, post_smooth=1,
                       impl="roll")
        x1_want = _smooth_impl(None, b_want, lvl, cfg, 1, reverse=False)
        b2, x1, rr, sr = si.sor_rb_zero_update_stream(
            u, b, alpha, d, 1.0, out_dtype=out_dtype)
        # the RHS stays exact in the input precision regardless of x1's
        assert float(jnp.max(jnp.abs(b2 - b_want))) < 1e-6
        ref_rr = float(jnp.sum(b_want * b_want))
        assert abs(float(rr) - ref_rr) <= 1e-4 * ref_rr
        if out_dtype is None:
            assert x1.dtype == u.dtype
            tol = 1e-6
        else:
            assert x1.dtype == jnp.dtype(out_dtype)
            tol = 2e-2  # bf16 compute of the sweep
        scale = float(jnp.max(jnp.abs(x1_want)))
        err = float(jnp.max(jnp.abs(x1.astype(jnp.float64)
                                    - x1_want.astype(jnp.float64))))
        assert err <= tol * scale
