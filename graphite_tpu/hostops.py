"""Host structure-discovery primitives: native C++ with NumPy fallback.

Freeze-time sort/unique/searchsorted/pair-enumeration used by
`build_hessian_structure` and `build_schur_structure` (the analogs of the
reference's setup passes, hessian.hpp:48-85 / schur.hpp:397-476). The
native path (graphite_tpu/native/structure.cpp) is ~5-15x faster on the
Venice-Final-scale arrays (17M Schur pairs); `GRAPHITE_TPU_NO_NATIVE=1`
forces the NumPy fallback. Both paths produce bitwise-identical outputs
(tests/test_native_structure.py).
"""

from __future__ import annotations

import numpy as np

_NS = None
_NS_CHECKED = False


def _native():
    global _NS, _NS_CHECKED
    if not _NS_CHECKED:
        _NS_CHECKED = True
        try:
            from .native import structure as ns

            _NS = ns if ns.available() else None
        except Exception:
            _NS = None
    return _NS


def sorted_unique(codes: np.ndarray) -> np.ndarray:
    """np.unique for non-negative int64 codes."""
    ns = _native()
    if ns is not None and codes.size:
        return ns.sort_unique(codes)
    return np.unique(np.asarray(codes, dtype=np.int64))


def searchsorted(sorted_arr: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """np.searchsorted(sorted_arr, queries, side='left')."""
    ns = _native()
    if ns is not None and np.asarray(queries).size:
        return ns.searchsorted(sorted_arr, queries)
    return np.searchsorted(np.asarray(sorted_arr, dtype=np.int64),
                           np.asarray(queries, dtype=np.int64))


def unique_inverse(codes: np.ndarray, bound: int = 0):
    """(unique sorted values, inverse indices) — np.unique(return_inverse).

    `bound` (optional): exclusive upper bound on the codes; small bounds
    (<= 2^26) switch to a flag-array rank that beats any sort.
    """
    ns = _native()
    if ns is not None and np.asarray(codes).size:
        if 0 < bound <= (1 << 26):
            return ns.unique_inverse_bounded(codes, bound)
        return ns.sort_unique_inverse(codes)
    uniq = sorted_unique(codes)
    if codes.size == 0:
        return uniq, np.zeros(0, dtype=np.int64)
    return uniq, searchsorted(uniq, codes)


def stable_argsort(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """np.argsort(keys, kind='stable') for small non-negative keys."""
    ns = _native()
    if ns is not None and np.asarray(keys).size:
        return ns.counting_sort_perm(keys, n_buckets)
    return np.argsort(np.asarray(keys), kind="stable")


def schur_pair_plan(att_lm: np.ndarray, att_pose: np.ndarray, n_lm: int,
                    n_pose: int, vals: np.ndarray, hpp_codes: np.ndarray):
    """Fused single-group Schur plan: attach sort + pair fill + S
    sparsity + dst-sorted product plan in one native pass pair
    (schur.hpp:397-476 + 484-585). Returns (att_order, left, right, mid,
    dst, s_codes, hpp_pos) with the pair arrays already sorted by
    destination S block, or None when unavailable (no native library, or
    an unbounded pair-code range) — callers fall back to the stepwise
    path."""
    att_lm = np.asarray(att_lm, dtype=np.int64)
    ns = _native()
    if ns is None or not att_lm.size or n_pose * n_pose > (1 << 23):
        return None
    att_pose = np.asarray(att_pose, dtype=np.int64)
    # CSC-ordered loaders produce an attach list already sorted by
    # (lm, pose) — detect it (one vector pass) and skip the sort
    key = att_lm * n_pose + att_pose
    if np.all(np.diff(key) >= 0):
        att_order = None  # identity; no caller consumes it on this path
        counts = np.bincount(att_lm, minlength=n_lm)
        total = int((counts.astype(np.int64)
                     * (counts + 1) // 2).sum())
        vals_s = np.ascontiguousarray(vals, dtype=np.int32)
        att_pose_s = att_pose
    else:
        att_order, counts, total = ns.attach_sort(att_lm, att_pose, n_lm)
        vals_s = np.asarray(vals, dtype=np.int32)[att_order]
        att_pose_s = att_pose[att_order]
    if total >= (1 << 31):
        # the fused kernel's int32 cursors would overflow; stepwise path
        # (int64 positions) degrades gracefully instead
        return None
    left, right, mid, dst, s_codes, hpp_pos = ns.pair_fill_sorted(
        counts, att_pose_s, vals_s, n_pose, total, hpp_codes)
    return att_order, left, right, mid, dst, s_codes, hpp_pos


def attach_pairs_vals(att_lm: np.ndarray, att_pose: np.ndarray, n_lm: int,
                      n_pose: int, vals: np.ndarray):
    """`attach_pairs` for the single-(dp,dl)-group case: emits each pair's
    left/right attach VALUES (``vals[att_order][ai/bi]``) directly at
    pair-generation time instead of materializing ai/bi and gathering —
    saves two 17M-row random gathers at Venice-Final.

    Returns (att_order, left, right, pair_lm, pair_codes)."""
    att_lm = np.asarray(att_lm, dtype=np.int64)
    att_pose = np.asarray(att_pose, dtype=np.int64)
    ns = _native()
    if ns is not None and att_lm.size:
        att_order, counts, total = ns.attach_sort(att_lm, att_pose, n_lm)
        vals_s = np.asarray(vals, dtype=np.int32)[att_order]
        left, right, pair_lm, pair_codes = ns.pair_fill_vals(
            counts, att_pose[att_order], n_pose, total, vals_s)
        return att_order, left, right, pair_lm, pair_codes
    (att_order, counts, seg_off, ai, bi, pair_lm, pair_codes,
     pose_a, pose_b) = attach_pairs(att_lm, att_pose, n_lm, n_pose)
    vals_s = np.asarray(vals, dtype=np.int32)[att_order]
    return (att_order, vals_s[ai], vals_s[bi],
            np.asarray(pair_lm, dtype=np.int32), pair_codes)


def sort_apply3(keys: np.ndarray, n_buckets: int, p0, p1, p2):
    """Stable-sort ``keys`` (int32, in [0, n_buckets)) and apply the same
    permutation to three int32 payloads in one native pass. NumPy fallback:
    argsort + four gathers. Returns (keys_sorted, q0, q1, q2)."""
    ns = _native()
    if (ns is not None and np.asarray(keys).size
            and np.asarray(keys).shape[0] < (1 << 31)):
        return ns.counting_sort_apply3_i32(keys, n_buckets, p0, p1, p2)
    order = np.argsort(np.asarray(keys), kind="stable")
    return (np.asarray(keys, dtype=np.int32)[order],
            np.asarray(p0, dtype=np.int32)[order],
            np.asarray(p1, dtype=np.int32)[order],
            np.asarray(p2, dtype=np.int32)[order])


def attach_pairs(att_lm: np.ndarray, att_pose: np.ndarray, n_lm: int,
                 n_pose: int):
    """Sort the Hpl attach list by (lm, pose) and enumerate all unordered
    pose pairs (a <= b) per landmark — the Schur fill-in discovery
    (schur.hpp:397-476).

    Returns (att_order, counts, seg_off, ai, bi, pair_lm, pair_codes,
    pose_a, pose_b): `att_order` sorts the inputs; `ai`/`bi` index the
    *sorted* attach list; `pair_codes = pose_b * n_pose + pose_a`.
    """
    att_lm = np.asarray(att_lm, dtype=np.int64)
    att_pose = np.asarray(att_pose, dtype=np.int64)
    ns = _native()
    if ns is not None and att_lm.size:
        att_order, counts, total = ns.attach_sort(att_lm, att_pose, n_lm)
        seg_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ai, bi, pair_lm, pair_codes, pose_a, pose_b = ns.pair_fill2(
            counts, att_pose[att_order], n_pose, total)
        return (att_order, counts, seg_off, ai, bi, pair_lm, pair_codes,
                pose_a, pose_b)

    att_order = np.lexsort((att_pose, att_lm))
    att_lm_s = att_lm[att_order]
    att_pose_s = att_pose[att_order]
    counts = np.bincount(att_lm_s, minlength=n_lm)
    seg_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
    npairs = counts * (counts + 1) // 2
    total_pairs = int(npairs.sum())
    pair_lm = np.repeat(np.arange(n_lm), npairs)
    pair_off = np.concatenate([[0], np.cumsum(npairs)[:-1]])
    p_local = np.arange(total_pairs) - np.repeat(pair_off, npairs)
    jj = ((np.sqrt(8.0 * p_local + 1.0) - 1.0) // 2).astype(np.int64)
    # guard float roundoff at triangular boundaries
    jj = np.where(jj * (jj + 1) // 2 > p_local, jj - 1, jj)
    jj = np.where((jj + 1) * (jj + 2) // 2 <= p_local, jj + 1, jj)
    ii = p_local - jj * (jj + 1) // 2
    ai = seg_off[pair_lm] + ii
    bi = seg_off[pair_lm] + jj
    pose_a = att_pose_s[ai]
    pose_b = att_pose_s[bi]
    pair_codes = pose_b * n_pose + pose_a
    return (att_order, counts, seg_off, ai, bi, pair_lm, pair_codes,
            pose_a, pose_b)
