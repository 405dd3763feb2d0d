"""ctypes bindings for the native (C++) runtime components.

The reference's native layer is PETSc + MPI (C); this package holds the
framework's host-side native equivalents — the grid-decomposition planner
(DMDA analogue, decomp.cpp) and the runtime options database (PETSc
options-DB analogue, options.cpp) — compiled into one shared library and
loaded via ctypes. Everything here has a pure-Python twin
(poissbox_tpu/parallel/decomp.py, poissbox_tpu/config.py) with identical
semantics, cross-checked by tests/test_native.py; callers use
:func:`available` to pick the native path when the library is built.

Build: `make -C poissbox_tpu/native` (or :func:`build`, which shells out to
the same Makefile). The build is not automatic at import time.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpoissbox_native.so")
_BOOL_TRUE = "\x01true"  # marker for value-less flags (options.cpp)

_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the shared library via the Makefile. Returns success."""
    try:
        r = subprocess.run(["make", "-C", _DIR],
                           capture_output=quiet, timeout=120)
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64, p64 = ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
    lib.pb_decompose_3d.restype = ctypes.c_int
    lib.pb_decompose_3d.argtypes = [i64, i64, i64, i64, p64, p64, p64]
    lib.pb_owned_box.restype = ctypes.c_int
    lib.pb_owned_box.argtypes = [i64] * 9 + [p64]
    lib.pb_dof_distribution.restype = ctypes.c_int
    lib.pb_dof_distribution.argtypes = [i64] * 6 + [p64]
    lib.pb_halo_bytes.restype = ctypes.c_int
    lib.pb_halo_bytes.argtypes = [i64] * 8 + [p64]
    lib.pb_options_create.restype = ctypes.c_void_p
    lib.pb_options_destroy.argtypes = [ctypes.c_void_p]
    lib.pb_options_parse.restype = ctypes.c_int
    lib.pb_options_parse.argtypes = [ctypes.c_void_p, i64,
                                     ctypes.POINTER(ctypes.c_char_p)]
    lib.pb_options_set.restype = ctypes.c_int
    lib.pb_options_set.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_char_p]
    lib.pb_options_has.restype = ctypes.c_int
    lib.pb_options_has.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.pb_options_get.restype = i64
    lib.pb_options_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_char_p, i64]
    lib.pb_options_count.restype = i64
    lib.pb_options_count.argtypes = [ctypes.c_void_p]
    lib.pb_options_key_at.restype = i64
    lib.pb_options_key_at.argtypes = [ctypes.c_void_p, i64, ctypes.c_char_p,
                                      i64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# -- decomposition planner ---------------------------------------------------

def decompose_3d(ndev: int, shape: Sequence[int]) -> tuple[int, int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run native.build())")
    px, py, pz = ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64()
    rc = lib.pb_decompose_3d(ndev, *map(int, shape),
                             ctypes.byref(px), ctypes.byref(py),
                             ctypes.byref(pz))
    if rc:
        raise ValueError(f"cannot decompose {ndev} devices over {tuple(shape)}")
    return (px.value, py.value, pz.value)


def owned_box(shape, pgrid, coord) -> tuple[tuple[int, int, int], tuple[int, int, int]]:
    lib = _load()
    out = (ctypes.c_int64 * 6)()
    rc = lib.pb_owned_box(*map(int, shape), *map(int, pgrid),
                          *map(int, coord), out)
    if rc:
        raise ValueError(f"bad owned-box query {pgrid} {coord}")
    return (int(out[0]), int(out[1]), int(out[2])), \
           (int(out[3]), int(out[4]), int(out[5]))


def dof_distribution(shape, pgrid) -> list[int]:
    lib = _load()
    n = int(pgrid[0] * pgrid[1] * pgrid[2])
    out = (ctypes.c_int64 * n)()
    rc = lib.pb_dof_distribution(*map(int, shape), *map(int, pgrid), out)
    if rc:
        raise ValueError(f"bad dof query {shape} {pgrid}")
    return [int(v) for v in out]


def halo_bytes(shape, pgrid, width: int = 1, itemsize: int = 4) -> list[int]:
    lib = _load()
    out = (ctypes.c_int64 * 3)()
    rc = lib.pb_halo_bytes(*map(int, shape), *map(int, pgrid),
                           width, itemsize, out)
    if rc:
        raise ValueError("bad halo query")
    return [int(v) for v in out]


# -- options database --------------------------------------------------------

class NativeOptions:
    """ctypes wrapper over the C++ options database (options.cpp).

    Same parse semantics as poissbox_tpu.config.Options; value-less boolean
    flags come back as Python True.
    """

    def __init__(self, argv: Sequence[str] | None = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (run native.build())")
        self._lib = lib
        self._db = lib.pb_options_create()
        if argv:
            enc = [a.encode() for a in argv]
            arr = (ctypes.c_char_p * len(enc))(*enc)
            lib.pb_options_parse(self._db, len(enc), arr)

    def __del__(self):
        if getattr(self, "_db", None):
            self._lib.pb_options_destroy(self._db)
            self._db = None

    def has(self, key: str) -> bool:
        return bool(self._lib.pb_options_has(self._db, key.encode()))

    def set(self, key: str, value) -> None:
        v = _BOOL_TRUE if value is True else str(value)
        self._lib.pb_options_set(self._db, key.encode(), v.encode())

    def get(self, key: str, default=None):
        need = self._lib.pb_options_get(self._db, key.encode(), None, 0)
        if need < 0:
            return default
        buf = ctypes.create_string_buffer(need + 1)
        self._lib.pb_options_get(self._db, key.encode(), buf, need + 1)
        val = buf.value.decode()
        return True if val == _BOOL_TRUE else val

    def keys(self) -> list[str]:
        n = int(self._lib.pb_options_count(self._db))
        out = []
        for i in range(n):
            need = self._lib.pb_options_key_at(self._db, i, None, 0)
            buf = ctypes.create_string_buffer(need + 1)
            self._lib.pb_options_key_at(self._db, i, buf, need + 1)
            out.append(buf.value.decode())
        return out

    def as_dict(self) -> dict:
        return {k: self.get(k) for k in self.keys()}
