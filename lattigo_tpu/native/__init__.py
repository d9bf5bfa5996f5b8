"""Native (C) runtime helpers, compiled on demand with the system compiler.

The TPU compute path is JAX/Pallas; these cover host-side hot loops that are
inherently sequential/data-dependent (e.g. the CRP rejection walk).  Every
entry point has a pure-NumPy fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_DIR = os.path.dirname(__file__)
_LIB = None
_TRIED = False


def _build() -> str | None:
    """Compile crp_walk.c into a per-user cache dir, keyed by a hash of the
    source, so the binary in use always matches the checked-in C file (no
    prebuilt .so ships with the repo — a stale or divergent binary must
    never silently drive CRP generation)."""
    src = os.path.join(_DIR, "crp_walk.c")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.join(tempfile.gettempdir(), f"lattigo_tpu-{os.getuid()}")),
        "lattigo_tpu_native",
    )
    out = os.path.join(cache, f"_crp_walk-{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(cache, exist_ok=True)
    cc = os.environ.get("CC") or "cc"
    tmp = out + f".tmp{os.getpid()}"
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", tmp, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=60)
        os.replace(tmp, out)
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
