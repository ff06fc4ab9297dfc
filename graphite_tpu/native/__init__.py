"""Native (C++) runtime components, exposed through ctypes.

Where the reference keeps plain C++ translation units outside the CUDA
compiler (src/stream.cpp, src/eigen_solver.cpp), this package keeps host-side
performance-critical pieces in C++: the BAL dataset parser (and future
structure builders). Libraries are compiled on demand with g++ into the
package directory and loaded with ctypes — no pybind11 required. Every
native entry point has a pure-Python fallback, so the framework works
without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


class NativeUnavailable(ImportError):
    pass


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        raise NativeUnavailable(
            f"could not build native library {name}: {e}"
        ) from e
    return out


def load_library(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name))
        return _LIBS[name]
