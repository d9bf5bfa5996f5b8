"""Native (C) runtime helpers, compiled on demand with the system compiler.

The TPU compute path is JAX/Pallas; these cover host-side hot loops that are
inherently sequential/data-dependent (e.g. the CRP rejection walk).  Every
entry point has a pure-NumPy fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(__file__)
_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.join(_DIR, "crp_walk.c")
    out = os.path.join(_DIR, "_crp_walk.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cc = os.environ.get("CC") or "cc"
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=60)
        return out
    except Exception:
        return None


def crp_walk_lib():
    """ctypes handle to the compiled walk, or None (use the NumPy fallback)."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        path = _build()
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
                lib.crp_walk.restype = ctypes.c_longlong
                lib.crp_walk.argtypes = [
                    ctypes.POINTER(ctypes.c_uint64), ctypes.c_longlong,
                    ctypes.POINTER(ctypes.c_uint64),
                    ctypes.POINTER(ctypes.c_uint64), ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.POINTER(ctypes.c_uint64),
                ]
                _LIB = lib
            except OSError:
                _LIB = None
    return _LIB
