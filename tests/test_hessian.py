"""Block-sparse Hessian assembly vs dense NumPy reference
(reference tests/factor.cu:854-967 multi-descriptor block assembly)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import graphite_tpu as gt
from graphite_tpu.hessian import (
    apply_damping,
    build_hessian_structure,
    compute_hessian_values,
    csc_values,
    hessian_to_dense,
)
from graphite_tpu.linearize import linearize

from common import BINARY, POINT2, build_circle_graph
from test_linearize import PTS, dense_from_blocks


def _problem(fixed=(), disabled=()):
    g, *_ = build_circle_graph(PTS, fixed_ids=fixed, disabled=disabled)
    fs = g.add_factor_set(BINARY)
    P = np.array([[2.0, 0.3], [0.3, 1.0]])
    for i in range(5):
        fs.add([10 + i, 10 + (i + 1) % 5], obs=[0.5, -0.2], precision=P)
    return g.freeze()


def test_block_assembly_matches_dense():
    problem = _problem()
    lin = linearize(problem, problem.params0)
    hs = build_hessian_structure(problem)
    vals = compute_hessian_values(problem, hs, lin)
    H = hessian_to_dense(problem, hs, vals)
    Href, _ = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(H, Href, rtol=1e-12, atol=1e-13)


def test_block_assembly_with_masking():
    problem = _problem(fixed=(12,), disabled=(1,))
    lin = linearize(problem, problem.params0)
    hs = build_hessian_structure(problem)
    vals = compute_hessian_values(problem, hs, lin)
    H = hessian_to_dense(problem, hs, vals)
    Href, _ = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(H, Href, rtol=1e-12, atol=1e-13)


def test_diag_blocks_last_in_column():
    problem = _problem()
    hs = build_hessian_structure(problem)
    # CSC invariant (hessian.hpp:121-127): per column, diagonal block last.
    for j in range(problem.n_blocks):
        in_col = np.nonzero(hs.block_cols == j)[0]
        assert in_col.size > 0
        last = in_col[-1]
        assert hs.block_rows[last] == j


def test_damping():
    problem = _problem()
    lin = linearize(problem, problem.params0)
    hs = build_hessian_structure(problem)
    vals = compute_hessian_values(problem, hs, lin)
    mu = 0.37
    damped = apply_damping(problem, hs, vals, lin.diag, mu, False)
    H0 = hessian_to_dense(problem, hs, vals)
    H1 = hessian_to_dense(problem, hs, damped)
    d0 = np.diag(H0)
    expected = d0 + mu * np.clip(d0, 1e-6, 1e32)
    np.testing.assert_allclose(np.diag(H1), expected, rtol=1e-12)
    np.testing.assert_allclose(H1 - np.diag(np.diag(H1)),
                               H0 - np.diag(np.diag(H0)), rtol=1e-12)
    # identity damping
    damped_i = apply_damping(problem, hs, vals, lin.diag, mu, True)
    H2 = hessian_to_dense(problem, hs, damped_i)
    np.testing.assert_allclose(np.diag(H2), d0 + mu, rtol=1e-12)


def test_csc_export():
    problem = _problem(fixed=(12,))
    lin = linearize(problem, problem.params0)
    hs = build_hessian_structure(problem)
    vals = compute_hessian_values(problem, hs, lin)
    v = np.asarray(csc_values(problem, hs, vals))
    M = sp.csc_matrix((v, hs.csc_indices, hs.csc_indptr),
                      shape=(problem.dim_h, problem.dim_h))
    Href, _ = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(M.toarray(), Href, rtol=1e-12, atol=1e-13)


def test_bal_loader_produces_sorted_reduction_destinations():
    """The CSC-aligned observation order (io/bal.py) must keep the
    point-diagonal and point-camera contribution destinations and the
    Schur product plan sorted — the streaming reduction kernels depend on
    it to skip per-iteration permutation gathers."""
    import graphite_tpu as gt
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.schur import build_schur_structure

    ds = synthetic.make_bal("mini", seed=1)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    p = g.freeze()
    hs = build_hessian_structure(p)
    for cm in hs.contribs:
        if cm.s == 0 and cm.t == 0:
            continue  # camera diagonal: unsorted, few-segments path
        assert cm.direct_idx is not None
        assert np.all(np.diff(cm.direct_idx) >= 0), (cm.s, cm.t)
    ss = build_schur_structure(p)
    assert np.all(np.diff(ss.products[0]["dst"]) >= 0)
