"""ctypes wrapper for the C++ BAL parser (bal_loader.cpp)."""

from __future__ import annotations

import ctypes
import os
import tempfile

import numpy as np

from . import NativeUnavailable, load_library


def _lib():
    lib = load_library("bal_loader")
    lib.bal_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.bal_header.restype = ctypes.c_int
    lib.bal_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.bal_parse.restype = ctypes.c_int
    return lib


def load(path: str):
    """Parse a BAL file; returns (cameras, points, cam_idx, point_idx, obs)
    or None when the native path can't handle it (caller falls back)."""
    try:
        lib = _lib()
    except NativeUnavailable:
        return None

    tmp = None
    try:
        if path.endswith((".gz", ".bz2")):
            import bz2
            import gzip

            opener = gzip.open if path.endswith(".gz") else bz2.open
            tmp = tempfile.NamedTemporaryFile(suffix=".txt", delete=False)
            with opener(path, "rb") as f:
                tmp.write(f.read())
            tmp.close()
            path = tmp.name

        n_cam = ctypes.c_int64()
        n_pt = ctypes.c_int64()
        n_obs = ctypes.c_int64()
        if lib.bal_header(path.encode(), ctypes.byref(n_cam),
                          ctypes.byref(n_pt), ctypes.byref(n_obs)) != 0:
            return None
        C, P, O = n_cam.value, n_pt.value, n_obs.value
        cam_idx = np.empty(O, dtype=np.int32)
        pt_idx = np.empty(O, dtype=np.int32)
        obs = np.empty((O, 2), dtype=np.float64)
        cams = np.empty((C, 9), dtype=np.float64)
        pts = np.empty((P, 3), dtype=np.float64)
        rc = lib.bal_parse(
            path.encode(), C, P, O,
            cam_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pt_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cams.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            return None
        return cams, pts, cam_idx.astype(np.int64), pt_idx.astype(np.int64), obs
    finally:
        if tmp is not None:
            os.unlink(tmp.name)
