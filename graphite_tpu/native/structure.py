"""ctypes wrapper for the C++ structure-discovery kernels (structure.cpp).

Freeze-time only — these replace the NumPy hot loops in
`build_hessian_structure` / `build_schur_structure` (the analogs of the
reference's setup passes hessian.hpp:48-85 and schur.hpp:397-476).
`GRAPHITE_TPU_NO_NATIVE=1` disables the native path; every caller has a
NumPy fallback and a parity test (tests/test_native_structure.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from . import NativeUnavailable, load_library

_I64P = ctypes.POINTER(ctypes.c_int64)


def available() -> bool:
    if os.environ.get("GRAPHITE_TPU_NO_NATIVE"):
        return False
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False


def _lib():
    lib = load_library("structure")
    if not getattr(lib, "_gx_typed", False):
        lib.gx_sort_unique.argtypes = [_I64P, ctypes.c_int64, _I64P]
        lib.gx_sort_unique.restype = ctypes.c_int64
        lib.gx_searchsorted.argtypes = [
            _I64P, ctypes.c_int64, _I64P, ctypes.c_int64, _I64P]
        lib.gx_searchsorted.restype = None
        lib.gx_attach_sort.argtypes = [
            _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, _I64P, _I64P]
        lib.gx_attach_sort.restype = ctypes.c_int64
        lib.gx_pair_fill.argtypes = [
            _I64P, ctypes.c_int64, _I64P, ctypes.c_int64,
            _I64P, _I64P, _I64P, _I64P]
        lib.gx_pair_fill.restype = None
        lib._gx_typed = True
    return lib


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_I64P)


def sort_unique(codes) -> np.ndarray:
    """np.unique for non-negative int64 codes (radix sort + dedup)."""
    codes = _as_i64(codes)
    n = codes.shape[0]
    if n == 0:
        return codes
    out = np.empty(n, dtype=np.int64)
    ns = _lib().gx_sort_unique(_ptr(codes), n, _ptr(out))
    return out[:ns].copy()


def searchsorted(sorted_arr, queries) -> np.ndarray:
    """np.searchsorted(sorted_arr, queries, side='left')."""
    sorted_arr = _as_i64(sorted_arr)
    queries = _as_i64(queries)
    pos = np.empty(queries.shape[0], dtype=np.int64)
    _lib().gx_searchsorted(_ptr(sorted_arr), sorted_arr.shape[0],
                           _ptr(queries), queries.shape[0], _ptr(pos))
    return pos


def attach_sort(att_lm, att_pose, n_lm: int):
    """np.lexsort((att_pose, att_lm)) + per-landmark counts + pair total.

    Returns (order, counts, total_pairs).
    """
    att_lm = _as_i64(att_lm)
    att_pose = _as_i64(att_pose)
    K = att_lm.shape[0]
    order = np.empty(K, dtype=np.int64)
    counts = np.empty(n_lm, dtype=np.int64)
    total = _lib().gx_attach_sort(_ptr(att_lm), _ptr(att_pose), K, n_lm,
                                  _ptr(order), _ptr(counts))
    return order, counts, int(total)


def pair_fill(counts, att_pose_s, n_pose: int, total_pairs: int):
    """All unordered pose pairs (a<=b) per landmark, NumPy-decode order.

    Returns (ai, bi, pair_lm, pair_codes), each (total_pairs,).
    """
    counts = _as_i64(counts)
    att_pose_s = _as_i64(att_pose_s)
    ai = np.empty(total_pairs, dtype=np.int64)
    bi = np.empty(total_pairs, dtype=np.int64)
    pair_lm = np.empty(total_pairs, dtype=np.int64)
    pair_codes = np.empty(total_pairs, dtype=np.int64)
    _lib().gx_pair_fill(_ptr(counts), counts.shape[0], _ptr(att_pose_s),
                        n_pose, _ptr(ai), _ptr(bi), _ptr(pair_lm),
                        _ptr(pair_codes))
    return ai, bi, pair_lm, pair_codes


def _typed2(lib):
    if not getattr(lib, "_gx_typed2", False):
        _I32P = ctypes.POINTER(ctypes.c_int32)
        lib.gx_sort_unique_inverse.argtypes = [
            _I64P, ctypes.c_int64, _I64P, _I64P]
        lib.gx_sort_unique_inverse.restype = ctypes.c_int64
        lib.gx_counting_sort_perm.argtypes = [
            _I64P, ctypes.c_int64, ctypes.c_int64, _I64P]
        lib.gx_counting_sort_perm.restype = None
        lib.gx_pair_fill2.argtypes = [
            _I64P, ctypes.c_int64, _I64P, ctypes.c_int64,
            _I32P, _I32P, _I32P, _I64P, _I32P, _I32P]
        lib.gx_pair_fill2.restype = None
        lib._gx_typed2 = True
    return lib


def _ptr32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def sort_unique_inverse(codes):
    """np.unique(codes, return_inverse=True) in one radix pass."""
    codes = _as_i64(codes)
    n = codes.shape[0]
    if n == 0:
        return codes, np.zeros(0, dtype=np.int64)
    uniq = np.empty(n, dtype=np.int64)
    inverse = np.empty(n, dtype=np.int64)
    ns = _typed2(_lib()).gx_sort_unique_inverse(
        _ptr(codes), n, _ptr(uniq), _ptr(inverse))
    return uniq[:ns].copy(), inverse


def counting_sort_perm(keys, n_buckets: int):
    """np.argsort(keys, kind='stable') for keys in [0, n_buckets)."""
    keys = _as_i64(keys)
    perm = np.empty(keys.shape[0], dtype=np.int64)
    _typed2(_lib()).gx_counting_sort_perm(
        _ptr(keys), keys.shape[0], n_buckets, _ptr(perm))
    return perm


def pair_fill2(counts, att_pose_s, n_pose: int, total_pairs: int):
    """pair_fill + pose ids, int32 indices.

    Returns (ai, bi, pair_lm, pair_codes, pose_a, pose_b).
    """
    counts = _as_i64(counts)
    att_pose_s = _as_i64(att_pose_s)
    ai = np.empty(total_pairs, dtype=np.int32)
    bi = np.empty(total_pairs, dtype=np.int32)
    pair_lm = np.empty(total_pairs, dtype=np.int32)
    pair_codes = np.empty(total_pairs, dtype=np.int64)
    pose_a = np.empty(total_pairs, dtype=np.int32)
    pose_b = np.empty(total_pairs, dtype=np.int32)
    _typed2(_lib()).gx_pair_fill2(
        _ptr(counts), counts.shape[0], _ptr(att_pose_s), n_pose,
        _ptr32(ai), _ptr32(bi), _ptr32(pair_lm), _ptr(pair_codes),
        _ptr32(pose_a), _ptr32(pose_b))
    return ai, bi, pair_lm, pair_codes, pose_a, pose_b


def pair_fill_vals(counts, att_pose_s, n_pose: int, total_pairs: int,
                   att_vals):
    """pair_fill emitting left/right attach VALUES directly (single-group
    fast path). Returns (left, right, pair_lm, pair_codes)."""
    lib = _typed2(_lib())
    if not getattr(lib, "_gx_typed5", False):
        _I32P = ctypes.POINTER(ctypes.c_int32)
        lib.gx_pair_fill_vals.argtypes = [
            _I64P, ctypes.c_int64, _I64P, ctypes.c_int64,
            _I32P, _I32P, _I32P, _I32P, _I64P]
        lib.gx_pair_fill_vals.restype = None
        lib._gx_typed5 = True
    counts = _as_i64(counts)
    att_pose_s = _as_i64(att_pose_s)
    att_vals = np.ascontiguousarray(att_vals, dtype=np.int32)
    left = np.empty(total_pairs, dtype=np.int32)
    right = np.empty(total_pairs, dtype=np.int32)
    pair_lm = np.empty(total_pairs, dtype=np.int32)
    pair_codes = np.empty(total_pairs, dtype=np.int64)
    lib.gx_pair_fill_vals(
        _ptr(counts), counts.shape[0], _ptr(att_pose_s), n_pose,
        _ptr32(att_vals), _ptr32(left), _ptr32(right), _ptr32(pair_lm),
        _ptr(pair_codes))
    return left, right, pair_lm, pair_codes


def pair_fill_sorted(counts, att_pose_s, att_vals, n_pose: int,
                     total_pairs: int, hpp_codes):
    """Fused pair fill + bounded unique + dst-sorted product plan.

    Returns (left, right, mid, dst, s_codes, hpp_pos) with the pair
    arrays already sorted by destination S block."""
    lib = _typed2(_lib())
    if not getattr(lib, "_gx_typed6", False):
        _I32P = ctypes.POINTER(ctypes.c_int32)
        lib.gx_pair_fill_sorted.argtypes = [
            _I64P, ctypes.c_int64, _I64P, _I32P, ctypes.c_int64,
            _I64P, ctypes.c_int64,
            _I32P, _I32P, _I32P, _I32P, _I64P, _I64P]
        lib.gx_pair_fill_sorted.restype = ctypes.c_int64
        lib._gx_typed6 = True
    counts = _as_i64(counts)
    att_pose_s = _as_i64(att_pose_s)
    att_vals = np.ascontiguousarray(att_vals, dtype=np.int32)
    hpp_codes = _as_i64(hpp_codes)
    left = np.empty(total_pairs, dtype=np.int32)
    right = np.empty(total_pairs, dtype=np.int32)
    mid = np.empty(total_pairs, dtype=np.int32)
    dst = np.empty(total_pairs, dtype=np.int32)
    ns_cap = min(total_pairs + hpp_codes.shape[0], n_pose * n_pose)
    s_codes = np.empty(ns_cap, dtype=np.int64)
    hpp_pos = np.empty(hpp_codes.shape[0], dtype=np.int64)
    ns = lib.gx_pair_fill_sorted(
        _ptr(counts), counts.shape[0], _ptr(att_pose_s), _ptr32(att_vals),
        n_pose, _ptr(hpp_codes), hpp_codes.shape[0],
        _ptr32(left), _ptr32(right), _ptr32(mid), _ptr32(dst),
        _ptr(s_codes), _ptr(hpp_pos))
    return left, right, mid, dst, s_codes[:ns].copy(), hpp_pos


def counting_sort_apply3_i32(keys, n_buckets: int, p0, p1, p2):
    """Stable counting sort of int32 ``keys`` in [0, n_buckets) applied to
    three int32 payloads in one pass. Returns (keys_sorted, q0, q1, q2)."""
    lib = _typed2(_lib())
    if not getattr(lib, "_gx_typed4", False):
        _I32P = ctypes.POINTER(ctypes.c_int32)
        lib.gx_counting_sort_apply3_i32.argtypes = [
            _I32P, ctypes.c_int64, ctypes.c_int64,
            _I32P, _I32P, _I32P, _I32P, _I32P, _I32P, _I32P]
        lib.gx_counting_sort_apply3_i32.restype = None
        lib._gx_typed4 = True
    keys = np.ascontiguousarray(keys, dtype=np.int32)
    p0 = np.ascontiguousarray(p0, dtype=np.int32)
    p1 = np.ascontiguousarray(p1, dtype=np.int32)
    p2 = np.ascontiguousarray(p2, dtype=np.int32)
    n = keys.shape[0]
    ks = np.empty(n, dtype=np.int32)
    q0 = np.empty(n, dtype=np.int32)
    q1 = np.empty(n, dtype=np.int32)
    q2 = np.empty(n, dtype=np.int32)
    lib.gx_counting_sort_apply3_i32(
        _ptr32(keys), n, n_buckets, _ptr32(p0), _ptr32(p1), _ptr32(p2),
        _ptr32(ks), _ptr32(q0), _ptr32(q1), _ptr32(q2))
    return ks, q0, q1, q2


def unique_inverse_bounded(codes, bound: int):
    """Bounded-range np.unique(return_inverse): flag + prefix-rank."""
    lib = _typed2(_lib())
    if not getattr(lib, "_gx_typed3", False):
        lib.gx_unique_inverse_bounded.argtypes = [
            _I64P, ctypes.c_int64, ctypes.c_int64, _I64P, _I64P]
        lib.gx_unique_inverse_bounded.restype = ctypes.c_int64
        lib._gx_typed3 = True
    codes = _as_i64(codes)
    n = codes.shape[0]
    if n == 0:
        return codes, np.zeros(0, dtype=np.int64)
    uniq = np.empty(min(n, bound), dtype=np.int64)
    inverse = np.empty(n, dtype=np.int64)
    ns = lib.gx_unique_inverse_bounded(_ptr(codes), n, bound, _ptr(uniq),
                                       _ptr(inverse))
    return uniq[:ns].copy(), inverse
