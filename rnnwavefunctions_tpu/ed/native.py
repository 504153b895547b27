"""ctypes binding for the native Lanczos ED oracle (native/ed_lanczos.cpp).

Compiles the C++ source with g++ on first use (cached as a .so next to the
source); raises ImportError if no compiler is available so tests can skip.
Extends exact ground-state validation from the dense-eigh limit (N <= ~14)
up to N ~ 24.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "ed_lanczos.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "ed_lanczos.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError) as e:
            raise ImportError(f"cannot build native ED oracle: {e}") from e
    lib = ctypes.CDLL(_SO)
    lib.tfim1d_ground_energy.restype = ctypes.c_int
    lib.tfim1d_ground_energy.argtypes = [
        ctypes.c_int, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    lib.tfim2d_ground_energy.restype = ctypes.c_int
    lib.tfim2d_ground_energy.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    lib.j1j2_ground_energy.restype = ctypes.c_int
    lib.j1j2_ground_energy.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    _vec = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    _dp = ctypes.POINTER(ctypes.c_double)
    lib.tfim1d_ground_state.restype = ctypes.c_int
    lib.tfim1d_ground_state.argtypes = [
        ctypes.c_int, ctypes.c_double, _vec, ctypes.c_int, _dp, _vec, _dp,
    ]
    lib.tfim2d_ground_state.restype = ctypes.c_int
    lib.tfim2d_ground_state.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, _dp, _vec, _dp,
    ]
    lib.j1j2_ground_state.restype = ctypes.c_int
    lib.j1j2_ground_state.argtypes = [
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, _dp, _vec, _dp,
    ]
    _lib = lib
    return lib


def tfim1d_ground_energy(
    n: int, bx: float, jz=None, max_iter: int = 300
) -> float:
    """Lanczos ground-state energy of the 1D OBC TFIM (N up to ~24)."""
    lib = _load()
    if jz is None:
        jz = np.ones(max(n - 1, 1))
    jz = np.ascontiguousarray(jz, np.float64)
    out = ctypes.c_double()
    rc = lib.tfim1d_ground_energy(n, float(bx), jz, max_iter,
                                  ctypes.byref(out))
    if rc != 0:
        raise ValueError(f"native ED failed (rc={rc}, n={n})")
    return out.value


def tfim2d_ground_energy(
    nx: int, ny: int, bx: float, jz: float = 1.0, max_iter: int = 300
) -> float:
    """Lanczos ground-state energy of the 2D OBC TFIM (Nx*Ny up to ~24)."""
    lib = _load()
    out = ctypes.c_double()
    rc = lib.tfim2d_ground_energy(nx, ny, float(bx), float(jz), max_iter,
                                  ctypes.byref(out))
    if rc != 0:
        raise ValueError(f"native ED failed (rc={rc}, {nx}x{ny})")
    return out.value


def j1j2_ground_energy(
    n: int,
    j1: float = 1.0,
    j2: float = 0.0,
    bz: float = 0.0,
    periodic: bool = False,
    marshall_sign: bool = False,
    max_iter: int = 300,
) -> float:
    """Lanczos ground-state energy of the J1-J2 chain (N up to ~24)."""
    lib = _load()
    out = ctypes.c_double()
    rc = lib.j1j2_ground_energy(
        n, float(j1), float(j2), float(bz), int(periodic),
        int(marshall_sign), max_iter, ctypes.byref(out),
    )
    if rc != 0:
        raise ValueError(f"native ED failed (rc={rc}, n={n})")
    return out.value


# -- ground-state VECTORS (two-pass Lanczos) --------------------------------
# Extends ed.fidelity past the dense-eigh bound (N <= ~16) to N ~ 24:
# (energy, vector in ed/exact.py basis order, residual ||Hx - Ex||).  For a
# degenerate ground level the vector is one member of the degenerate
# subspace, so treat the fidelity against it as a lower bound.

def tfim1d_ground_state(n: int, bx: float, jz=None, max_iter: int = 300):
    lib = _load()
    if jz is None:
        jz = np.ones(max(n - 1, 1))
    jz = np.ascontiguousarray(jz, np.float64)
    e, r = ctypes.c_double(), ctypes.c_double()
    vec = np.zeros(1 << n, np.float64)
    rc = lib.tfim1d_ground_state(n, float(bx), jz, max_iter,
                                 ctypes.byref(e), vec, ctypes.byref(r))
    if rc != 0:
        raise ValueError(f"native ED failed (rc={rc}, n={n})")
    return e.value, vec, r.value


def tfim2d_ground_state(nx: int, ny: int, bx: float, jz: float = 1.0,
                        max_iter: int = 300):
    lib = _load()
    e, r = ctypes.c_double(), ctypes.c_double()
    vec = np.zeros(1 << (nx * ny), np.float64)
    rc = lib.tfim2d_ground_state(nx, ny, float(bx), float(jz), max_iter,
                                 ctypes.byref(e), vec, ctypes.byref(r))
    if rc != 0:
        raise ValueError(f"native ED failed (rc={rc}, {nx}x{ny})")
    return e.value, vec, r.value


def j1j2_ground_state(n: int, j1: float = 1.0, j2: float = 0.0,
                      bz: float = 0.0, periodic: bool = False,
                      marshall_sign: bool = False, max_iter: int = 300):
    lib = _load()
    e, r = ctypes.c_double(), ctypes.c_double()
    vec = np.zeros(1 << n, np.float64)
    rc = lib.j1j2_ground_state(
        n, float(j1), float(j2), float(bz), int(periodic),
        int(marshall_sign), max_iter, ctypes.byref(e), vec, ctypes.byref(r),
    )
    if rc != 0:
        raise ValueError(f"native ED failed (rc={rc}, n={n})")
    return e.value, vec, r.value
