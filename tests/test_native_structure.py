"""Native C++ structure-discovery kernels vs NumPy fallback (VERDICT r1
item 6). Both paths must be bitwise identical — the native path is a pure
freeze-time accelerator (reference setup passes: hessian.hpp:48-85,
schur.hpp:397-476)."""

import dataclasses

import numpy as np
import pytest

import graphite_tpu as gt
from graphite_tpu import hostops
from graphite_tpu.hessian import build_hessian_structure
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.schur import build_schur_structure

try:
    from graphite_tpu.native import structure as native_structure

    HAVE_NATIVE = native_structure.available()
except Exception:  # pragma: no cover - no compiler in env
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason="native structure lib unavailable")


@needs_native
def test_primitives_match_numpy():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 1 << 40, size=200_000)
    np.testing.assert_array_equal(native_structure.sort_unique(codes),
                                  np.unique(codes))
    uniq = np.unique(codes)
    q = rng.integers(0, 1 << 40, size=50_000)
    np.testing.assert_array_equal(native_structure.searchsorted(uniq, q),
                                  np.searchsorted(uniq, q))
    # empty and single-element edges
    np.testing.assert_array_equal(
        native_structure.sort_unique(np.asarray([7], dtype=np.int64)), [7])


@needs_native
def test_sort_unique_inverse_all_paths():
    """Every internal strategy of gx_sort_unique_inverse: packed single
    int64, chunked pack+merge (wide keys), struct-payload fallback."""
    rng = np.random.default_rng(2)
    for codes in (
        rng.integers(0, 1 << 22, size=300_000),        # packed (small keys)
        rng.integers(1 << 40, 1 << 41, size=300_000),  # packed (kb+ob<=63)
        # chunked pack+merge: kb=43, n=2^21+5 > chunk=2^20 -> 3 chunks,
        # genuine cross-chunk k-way merge + local->global rank remap
        rng.integers(1 << 42, 1 << 43, size=(1 << 21) + 5),
        # duplicate-heavy chunked case: every key repeats across chunks
        rng.integers(1 << 42, (1 << 42) + 997, size=(1 << 21) + 5),
        rng.integers(1 << 61, 1 << 62, size=100_000),  # KV fallback
        np.asarray([5, 5, 5], dtype=np.int64),
        np.asarray([0], dtype=np.int64),
    ):
        u, inv = native_structure.sort_unique_inverse(codes)
        u2, inv2 = np.unique(codes, return_inverse=True)
        np.testing.assert_array_equal(u, u2)
        np.testing.assert_array_equal(inv, inv2)


@needs_native
def test_counting_sort_perm_matches_stable_argsort():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 97, size=200_000)
    np.testing.assert_array_equal(
        native_structure.counting_sort_perm(keys, 97),
        np.argsort(keys, kind="stable"))


@needs_native
def test_attach_pairs_matches_numpy_fallback():
    rng = np.random.default_rng(1)
    K, n_lm, n_pose = 30_000, 5_000, 40
    att_lm = rng.integers(0, n_lm, size=K)
    att_pose = rng.integers(0, n_pose, size=K)
    res_native = hostops.attach_pairs(att_lm, att_pose, n_lm, n_pose)

    saved = (hostops._NS, hostops._NS_CHECKED)
    hostops._NS, hostops._NS_CHECKED = None, True
    try:
        res_numpy = hostops.attach_pairs(att_lm, att_pose, n_lm, n_pose)
    finally:
        hostops._NS, hostops._NS_CHECKED = saved
    for a, b in zip(res_native, res_numpy):
        np.testing.assert_array_equal(a, b)


def _structures():
    ds = synthetic.make_bal("mini", seed=3, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    return build_hessian_structure(problem), build_schur_structure(problem)


def _assert_equal_tree(a, b, path=""):
    if isinstance(a, np.ndarray):
        np.testing.assert_array_equal(a, b, err_msg=path)
    elif isinstance(a, dict):
        assert set(a) == set(b), path
        for k in a:
            _assert_equal_tree(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_equal_tree(x, y, f"{path}[{i}]")
    elif dataclasses.is_dataclass(a) and not isinstance(a, type):
        for f in dataclasses.fields(a):
            _assert_equal_tree(getattr(a, f.name), getattr(b, f.name),
                               f"{path}.{f.name}")
    else:
        assert a == b, (path, a, b)


@needs_native
def test_full_structures_bitwise_identical():
    hs_n, ss_n = _structures()
    saved = (hostops._NS, hostops._NS_CHECKED)
    hostops._NS, hostops._NS_CHECKED = None, True
    try:
        hs_f, ss_f = _structures()
    finally:
        hostops._NS, hostops._NS_CHECKED = saved
    _assert_equal_tree(ss_n, ss_f, "schur")
    for f in dataclasses.fields(hs_n):
        a, b = getattr(hs_n, f.name), getattr(hs_f, f.name)
        if callable(a):
            continue
        _assert_equal_tree(a, b, f"hessian.{f.name}")


@needs_native
def test_schur_pair_plan_matches_stepwise():
    """Fused pair_fill_sorted ≡ attach_pairs + bounded unique + stable
    counting sort (the r3 freeze-path fusion)."""
    rng = np.random.default_rng(7)
    n_lm, n_pose, K = 400, 37, 6_000
    att_lm = rng.integers(0, n_lm, K)
    att_pose = rng.integers(0, n_pose, K)
    vals = rng.integers(0, 1 << 20, K).astype(np.int32)
    hpp_codes = np.unique(rng.integers(0, n_pose * n_pose, 150))

    plan = hostops.schur_pair_plan(att_lm, att_pose, n_lm, n_pose, vals,
                                   hpp_codes)
    assert plan is not None
    att_order, left, right, mid, dst, s_codes, hpp_pos = plan

    # stepwise reference
    (att_order2, counts, seg_off, ai, bi, pair_lm, pair_codes,
     pose_a, pose_b) = hostops.attach_pairs(att_lm, att_pose, n_lm, n_pose)
    np.testing.assert_array_equal(att_order, att_order2)
    s_codes2, s_inv = hostops.unique_inverse(
        np.concatenate([hpp_codes, pair_codes]), bound=n_pose * n_pose)
    np.testing.assert_array_equal(s_codes, s_codes2)
    np.testing.assert_array_equal(hpp_pos, s_inv[: hpp_codes.shape[0]])
    pair_pos = s_inv[hpp_codes.shape[0]:]
    vals_s = vals[att_order2]
    order = np.argsort(pair_pos, kind="stable")
    np.testing.assert_array_equal(dst, pair_pos[order])
    np.testing.assert_array_equal(left, vals_s[ai][order])
    np.testing.assert_array_equal(right, vals_s[bi][order])
    np.testing.assert_array_equal(mid, np.asarray(pair_lm)[order])
