"""Runtime checking — the `-fcheck=all -ffpe-trap` analogue.

The reference's Debug build traps FPEs and bounds errors at compile-flag
level (reference CMakeLists.txt:17). JAX equivalents: `jax_debug_nans`
(trap NaN/Inf production inside jit, the -ffpe-trap analogue) and explicit
field validation (shape/dtype/finiteness — the bounds-check analogue, since
XLA is shape-safe by construction).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True) -> None:
    """Trap NaN production inside jitted code (-ffpe-trap=invalid analog).
    Significant performance cost; debug runs only."""
    jax.config.update("jax_debug_nans", enable)


def check_field(f: jax.Array, shape: Optional[Sequence[int]] = None,
                dtype=None, finite: bool = True, name: str = "field") -> jax.Array:
    """Validate a field eagerly; returns it unchanged (chainable).

    Host-side (forces a sync when finite=True) — use at API boundaries and
    in tests, not inside jit.
    """
    if shape is not None and tuple(f.shape) != tuple(shape):
        raise ValueError(f"{name}: shape {f.shape} != expected {tuple(shape)}")
    if dtype is not None and f.dtype != jnp.dtype(dtype):
        raise TypeError(f"{name}: dtype {f.dtype} != expected {jnp.dtype(dtype)}")
    if finite and not bool(jnp.isfinite(f).all()):
        raise FloatingPointError(f"{name}: contains NaN/Inf")
    return f
