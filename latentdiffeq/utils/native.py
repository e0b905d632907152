"""ctypes loader for the native (C++) host-side components.

Builds ``native/rasterizer.cpp`` into a shared library on first use
(g++ -O3, cached next to the source) and exposes it with numpy-friendly
wrappers. The native path is the host-side twin of the JAX rasterizer
(examples/pendulum/create_data.py) — the role Luxor plays for the
reference (create_data.jl:65-117).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["native_render_trajectories", "load_native_lib"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB: Optional[ctypes.CDLL] = None

# Portable flags: no -march=native, so a .so left behind by another host
# (or leaked into a checkout) never traps a newer/older microarchitecture.
_CXXFLAGS = ["-O3", "-shared", "-fPIC"]


def _build(src: str, lib: str):
    cmd = ["g++", *_CXXFLAGS, src, "-o", lib]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _src_digest(src: str) -> str:
    h = hashlib.sha256()
    with open(src, "rb") as f:
        h.update(f.read())
    h.update(" ".join(_CXXFLAGS).encode())
    return h.hexdigest()


def load_native_lib() -> ctypes.CDLL:
    """Load (building if needed) the rasterizer shared library.

    The build is keyed on a content hash of the source + flags (sidecar
    ``.so.sha256``), not on mtimes, so a foreign or stale binary is always
    rebuilt; a binary that fails to dlopen is rebuilt once and retried.
    """
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_NATIVE_DIR, "rasterizer.cpp")
    lib = os.path.join(_NATIVE_DIR, "librasterizer.so")
    sha_file = lib + ".sha256"
    digest = _src_digest(src)

    def stamp_ok() -> bool:
        if not os.path.exists(lib) or not os.path.exists(sha_file):
            return False
        with open(sha_file) as f:
            return f.read().strip() == digest

    if not stamp_ok():
        _build(src, lib)
        with open(sha_file, "w") as f:
            f.write(digest)
    try:
        _LIB = ctypes.CDLL(lib)
    except OSError:
        # stale/foreign binary: rebuild once and retry
        _build(src, lib)
        with open(sha_file, "w") as f:
            f.write(digest)
        _LIB = ctypes.CDLL(lib)
    _LIB.ldq_render_trajectories.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    _LIB.ldq_render_trajectories.restype = None
    return _LIB


def native_render_trajectories(angles: np.ndarray, *,
                               pendulum_length: float = 19.0,
                               radius: float = 1.75,
                               rod_thickness: float = 3.75,
                               h: int = 28, w: int = 28) -> np.ndarray:
    """Render (n_traj, T) angles to (n_traj, T, h, w) float32 frames using
    the C++ rasterizer."""
    lib = load_native_lib()
    angles = np.ascontiguousarray(angles, dtype=np.float32)
    n, T = angles.shape
    out = np.empty((n, T, h, w), dtype=np.float32)
    lib.ldq_render_trajectories(
        angles.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, T, pendulum_length, radius, rod_thickness, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
