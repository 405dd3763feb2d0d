"""Profiling — the `-log_view` analogue.

`trace` wraps `jax.profiler.trace` for TensorBoard-viewable device traces;
`kernel_time` measures steady-state per-application time of a field->field
function with the protocol that survives tunneled/async platforms: chain
applications in a device-side `fori_loop`, force execution with a scalar
readback, and difference two iteration counts so host<->device roundtrip
latency cancels. (Naive `block_until_ready` timing is unreliable on
remote-tunneled TPU platforms — it can return before execution finishes.)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/poissbox-trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    with jax.profiler.trace(logdir):
        yield logdir


def kernel_time(fn: Callable, example, lo: int = 10, hi: int = 40,
                reps: int = 3) -> float:
    """Steady-state seconds per application of `fn` on `example`.

    `hi` is grown until the differenced device time clearly dominates the
    host<->device jitter — without this, micro-kernels (e.g. 64^3 sweeps
    at ~us scale) difference to noise and report garbage. The loop bound
    stays STATIC (one jit per count): a traced bound compiles to a
    while-loop that XLA cannot unroll, which destroys the VMEM-resident
    chaining that defines the steady-state number on small grids.
    """

    def timed(iters: int) -> float:
        f = jax.jit(lambda v: jnp.sum(
            jax.lax.fori_loop(0, iters, lambda _, w: fn(w), v)))
        float(f(example))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(example))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(lo)
    t_hi = timed(hi)
    while hi < 20000 and (t_hi - t_lo) <= max(0.5 * t_lo, 0.020):
        hi *= 4
        t_hi = timed(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def solve_time(solve_fn: Callable, b, lo: int = 1, hi: int = 3,
               reps: int = 3) -> float:
    """Seconds per full solve via differenced device-side loops.

    Host-timing a single solve on a tunneled chip is hopeless: the
    host<->device roundtrip (tens of ms, load-dependent) rivals the solve
    itself and subtracting a separately-measured roundtrip leaves +-50%
    scatter. Instead the solve is repeated inside a `fori_loop` and
    t(hi)-t(lo) cancels the constant overhead exactly. The RHS is
    perturbed by the loop-carried residual norm scaled by 1e-30 — far
    below f32 resolution, so every trip solves the identical system, but
    data-dependent, so XLA cannot hoist the loop-invariant solve.
    `solve_fn(b)` must return an object with a `.residual_norm` scalar."""
    eps = jnp.asarray(1e-30, b.dtype)

    def timed(iters: int) -> float:
        # b must be an ARGUMENT of the jitted loop: a closed-over array is
        # inlined into the HLO as a constant (a 512^3 RHS is a 512 MB
        # literal, which the remote-compile path rejects outright)
        def loop(rhs, acc0):
            def body(_, acc):
                res = solve_fn(rhs * (1 + eps * acc))
                return res.residual_norm.astype(rhs.dtype)
            return jax.lax.fori_loop(0, iters, body, acc0)

        f = jax.jit(loop)
        zero = jnp.asarray(0.0, b.dtype)
        float(f(b, zero))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(b, zero))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(lo)
    t_hi = timed(hi)
    while hi < 256 and (t_hi - t_lo) <= max(0.5 * t_lo, 0.020):
        hi *= 4
        t_hi = timed(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def bandwidth_gbps(fn: Callable, example, passes: int = 2, **kw) -> float:
    """Effective HBM bandwidth assuming `passes` full-array passes per
    application (2 = read + write for a perfectly fused kernel)."""
    t = kernel_time(fn, example, **kw)
    return passes * example.size * example.dtype.itemsize / t / 1e9
