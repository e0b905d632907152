"""ctypes loader for the native (C++) host-side components.

Builds ``native/rasterizer.cpp`` into a shared library on first use
(g++ -O3, cached next to the source) and exposes it with numpy-friendly
wrappers. The native path is the host-side twin of the JAX rasterizer
(examples/pendulum/create_data.py) — the role Luxor plays for the
reference (create_data.jl:65-117).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["native_render_trajectories", "load_native_lib"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB: Optional[ctypes.CDLL] = None


def _build(src: str, lib: str):
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", lib]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_native_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_NATIVE_DIR, "rasterizer.cpp")
    lib = os.path.join(_NATIVE_DIR, "librasterizer.so")
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        _build(src, lib)
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
