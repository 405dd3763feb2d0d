"""Pallas Thomas-kernel parity tests (interpret mode on CPU).

The VMEM-resident kernel must reproduce the XLA TridiagFactor solves
exactly — periodic and non-periodic, any axis, batched — continuing the
reference's white-box tridiagonal methodology (reference
tests/tridiag/test_tdma*.f90) at the kernel level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poissbox_tpu.ops.tridiag import TridiagFactor
from poissbox_tpu.ops.tridiag_pallas import PallasTridiagFactor


def _system(n, dtype=jnp.float64):
    a = jnp.full((n,), 9.0 / 62.0, dtype)
    b = jnp.ones((n,), dtype)
    c = jnp.full((n,), 9.0 / 62.0, dtype)
    return a, b, c


@pytest.mark.parametrize("periodic", [False, True])
def test_matches_xla_axis0(periodic):
    n = 32
    a, b, c = _system(n)
    d = jax.random.uniform(jax.random.PRNGKey(0), (n, 8, 128), jnp.float64)
    ref = TridiagFactor(a, b, c, periodic=periodic, method="seq").solve(d, axis=0)
    got = PallasTridiagFactor(a, b, c, periodic=periodic).solve(d, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("periodic", [False, True])
def test_babe_matches_thomas(periodic):
    # twisted (burn-at-both-ends) factorization: same solution as the
    # Thomas kernel to roundoff, half the sequential depth
    n = 32
    a, b, c = _system(n)
    d = jax.random.uniform(jax.random.PRNGKey(3), (n, 8, 128), jnp.float64)
    ref = PallasTridiagFactor(a, b, c, periodic=periodic).solve(d, axis=0)
    got = PallasTridiagFactor(a, b, c, periodic=periodic,
                              algorithm="babe").solve(d, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_babe_variable_coefficients(rng):
    # non-Toeplitz diagonally dominant system + odd length (asymmetric
    # elimination split)
    n = 33
    a = jnp.asarray(rng.uniform(0.05, 0.3, n))
    b = jnp.asarray(rng.uniform(1.5, 2.5, n))
    c = jnp.asarray(rng.uniform(0.05, 0.3, n))
    d = jnp.asarray(rng.standard_normal((n, 8, 128)))
    ref = TridiagFactor(a, b, c, periodic=True, method="seq").solve(d, axis=0)
    got = PallasTridiagFactor(a, b, c, periodic=True,
                              algorithm="babe").solve(d, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("axis", [1, 2])
def test_moved_axes(axis):
    n = 16
    a, b, c = _system(n)
    shape = [4, 4, 4]
    shape[axis] = n
    d = jax.random.uniform(jax.random.PRNGKey(1), tuple(shape), jnp.float64)
    ref = TridiagFactor(a, b, c, periodic=True, method="seq").solve(d, axis=axis)
    got = PallasTridiagFactor(a, b, c, periodic=True).solve(d, axis=axis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-13)


def test_random_diag_dominant(rng):
    # the reference fixture's randomized manufactured solution
    # (test_tdma_utils.f90:39-65)
    n = 24
    x = jnp.asarray(rng.uniform(-1, 1, n))
    a = jnp.asarray(rng.uniform(-1, 1, n))
    c = jnp.asarray(rng.uniform(-1, 1, n))
    b = jnp.asarray(10.0 * np.ones(n))  # diagonally dominant
    d = (b * x + a * jnp.roll(x, 1) + c * jnp.roll(x, -1))
    got = PallasTridiagFactor(a, b, c, periodic=True).solve(
        jnp.broadcast_to(d[:, None, None], (n, 8, 128)).copy(), axis=0)
    np.testing.assert_allclose(np.asarray(got[:, 0, 0]), np.asarray(x),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("method", ["pscan", "pallas"])
def test_factor_cache_safe_across_jits(method):
    # regression: the lru-cached Toeplitz factorization used to capture
    # tracers when first constructed inside a jit trace, leaking them into
    # any later trace with the same (n, alpha, dtype) key
    import poissbox_tpu.ops.compact as C
    from poissbox_tpu.ops.coefficients import compact_grad_coeffs
    C._toeplitz_factor.cache_clear()
    n = 32
    dx = 1.0 / n
    u = jax.random.uniform(jax.random.PRNGKey(3), (n, n, n), jnp.float64)
    co = compact_grad_coeffs(dx)
    f1 = jax.jit(lambda v: C._apply_compact(v, co, -1, 0, method=method))
    f2 = jax.jit(lambda v: C._apply_compact(v, co, -1, 0, method=method) * 2.0)
    a = f1(u)          # first construction happens inside this trace
    b = f2(u)          # second, distinct trace must not see leaked tracers
    np.testing.assert_allclose(np.asarray(b), 2.0 * np.asarray(a),
                               rtol=1e-13, atol=1e-13)


def test_layout_cycled_3d_ops_match():
    # the TPU layout-cycled grad/div/lapl (method='pallas') must equal the
    # per-axis formulation (method='pscan')
    from poissbox_tpu.ops import compact
    n = 32
    dx = 1.0 / n
    d = (dx, dx, dx)
    u = jax.random.uniform(jax.random.PRNGKey(4), (n, n, n), jnp.float64)
    g_ref = compact.grad(u, d, method="pscan")
    g_pal = compact.grad(u, d, method="pallas")
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-12, atol=1e-12)
    F = jax.random.uniform(jax.random.PRNGKey(5), (n, n, n, 3), jnp.float64)
    np.testing.assert_allclose(np.asarray(compact.div(F, d, method="pallas")),
                               np.asarray(compact.div(F, d, method="pscan")),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(compact.lapl(u, d, method="pallas")),
                               np.asarray(compact.lapl(u, d, method="pscan")),
                               rtol=1e-11, atol=1e-11)


def test_compact_pallas_method_matches():
    from poissbox_tpu.ops.coefficients import compact_grad_coeffs
    import poissbox_tpu.ops.compact as C
    n = 32
    dx = 1.0 / n
    u = jax.random.uniform(jax.random.PRNGKey(2), (n, n, n), jnp.float64)
    ref = C._apply_compact(u, compact_grad_coeffs(dx), -1, 0, method="pscan")
    got = C._apply_compact(u, compact_grad_coeffs(dx), -1, 0, method="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_pcr_matches_reference_f32():
    """Circulant-PCR algorithm (scan-free, auto-selected for constant
    symmetric periodic f32 systems) agrees with an f64 Thomas solve to
    f32 roundoff."""
    n = 64
    a, b, c = _system(n, jnp.float32)
    d = jax.random.uniform(jax.random.PRNGKey(5), (n, 8, 128), jnp.float32)
    ref = TridiagFactor(*_system(n), periodic=True, method="seq").solve(
        d.astype(jnp.float64), axis=0)
    fac = PallasTridiagFactor(a, b, c, periodic=True, algorithm="auto")
    assert fac.algorithm == "pcr"
    got = fac.solve(d, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-6, atol=3e-6)


def test_pcr_auto_fallbacks():
    n = 64
    # f64 -> thomas (dynamic_rotate is 32-bit-only)
    fac = PallasTridiagFactor(*_system(n, jnp.float64), periodic=True,
                              algorithm="auto")
    assert fac.algorithm == "thomas"
    # variable coefficients -> thomas
    key = jax.random.PRNGKey(7)
    b = 1.0 + jax.random.uniform(key, (n,), jnp.float32)
    a = c = jnp.full((n,), 0.1, jnp.float32)
    fac = PallasTridiagFactor(a, b, c, periodic=True, algorithm="auto")
    assert fac.algorithm == "thomas"
    # non-periodic -> thomas
    fac = PallasTridiagFactor(*_system(n, jnp.float32), periodic=False,
                              algorithm="auto")
    assert fac.algorithm == "thomas"
    # explicit pcr on an ineligible system must raise
    with pytest.raises(ValueError):
        PallasTridiagFactor(a, b, c, periodic=False, algorithm="pcr")
