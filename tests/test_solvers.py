"""Linear-solver correctness: dense Cholesky vs NumPy, PCG vs direct
(the reference's cross-solver oracle, tests/schur.cu:242-389)."""

import jax.numpy as jnp
import numpy as np

import graphite_tpu as gt
from graphite_tpu.linearize import linearize, hessian_matvec
from graphite_tpu.preconditioners import (
    BlockJacobiPreconditioner,
    IdentityPreconditioner,
)
from graphite_tpu.solvers import DenseCholeskySolver, PCGSolver
from graphite_tpu.solvers.dense_cholesky import (
    assemble_dense_hessian,
    damp_hessian,
)

from common import BINARY, CIRCLE_AUTO, POINT2, build_circle_graph
from test_linearize import PTS, dense_from_blocks


def _problem():
    g, *_ = build_circle_graph(PTS, fixed_ids=(14,))
    # add binary factors so H has off-diagonal blocks
    fs = g.add_factor_set(BINARY)
    P = np.array([[2.0, 0.3], [0.3, 1.0]])
    for i in range(4):
        fs.add([10 + i, 10 + (i + 1) % 5], obs=[0.5, -0.2], precision=P)
    return g.freeze()


def test_dense_assembly_matches_numpy():
    problem = _problem()
    lin = linearize(problem, problem.params0)
    H = np.asarray(assemble_dense_hessian(problem, lin))
    Href, bref = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(H, Href, rtol=1e-12, atol=1e-13)


def test_hessian_matvec_matches_dense():
    problem = _problem()
    lin = linearize(problem, problem.params0)
    Href, _ = dense_from_blocks(problem, lin)
    rng = np.random.default_rng(0)
    x = np.zeros(problem.dim_x)
    x[: problem.dim_h] = rng.normal(size=problem.dim_h)
    y = np.asarray(hessian_matvec(problem, lin, jnp.asarray(x)))
    np.testing.assert_allclose(y[: problem.dim_h], Href @ x[: problem.dim_h],
                               rtol=1e-10, atol=1e-12)


def test_dense_cholesky_vs_numpy():
    problem = _problem()
    lin = linearize(problem, problem.params0)
    solver = DenseCholeskySolver()
    state = solver.prepare(problem, lin)
    mu = 1e-3
    x, ok = solver.solve(problem, lin, state, mu, False)
    assert bool(ok)
    Href, bref = dense_from_blocks(problem, lin)
    Hd = np.asarray(damp_hessian(jnp.asarray(Href), mu, False))
    expected = np.linalg.solve(Hd, bref)
    np.testing.assert_allclose(np.asarray(x)[: problem.dim_h], expected,
                               rtol=1e-9, atol=1e-12)


def _pcg_vs_direct(precond, tol_match):
    problem = _problem()
    lin = linearize(problem, problem.params0)
    direct = DenseCholeskySolver()
    xd, _ = direct.solve(problem, lin, direct.prepare(problem, lin), 1e-2, False)
    pcg = PCGSolver(max_iter=512, tol=1e-24, rejection_ratio=1e6,
                    preconditioner=precond)
    xp, ok = pcg.solve(problem, lin, pcg.prepare(problem, lin), 1e-2, False)
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(xp)[: problem.dim_h], np.asarray(xd)[: problem.dim_h],
        rtol=tol_match, atol=1e-10,
    )


def test_pcg_identity_vs_direct():
    _pcg_vs_direct(IdentityPreconditioner(), 1e-6)


def test_pcg_block_jacobi_vs_direct():
    _pcg_vs_direct(BlockJacobiPreconditioner(), 1e-6)


def test_block_jacobi_blocks_match_dense():
    from graphite_tpu.preconditioners.block_jacobi import (
        compute_block_diagonal,
    )

    problem = _problem()
    lin = linearize(problem, problem.params0)
    blocks = compute_block_diagonal(problem, lin)["point2"]
    Href, _ = dense_from_blocks(problem, lin)
    off = problem.host.vertex_col_offset["point2"]
    act = problem.host.vertex_active["point2"]
    for v in range(5):
        if not act[v]:
            continue
        c = off[v]
        np.testing.assert_allclose(
            np.asarray(blocks[v]).reshape(2, 2), Href[c:c + 2, c:c + 2],
            rtol=1e-10, atol=1e-12,
        )


def test_schur_to_dense_chunked_interleave_matches():
    """The bounded-transient dense-S build (large pose counts) is exact
    vs the one-shot transpose path."""
    import graphite_tpu.solvers.dense_cholesky_schur as dcs
    from graphite_tpu.hessian import (
        apply_damping, build_hessian_structure, compute_hessian_values)
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.linearize import linearize
    from graphite_tpu.schur import build_schur_structure, schur_values

    ds = synthetic.make_bal((30, 200, 1500), seed=0, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    hs = build_hessian_structure(problem)
    ss = build_schur_structure(problem)
    hv = apply_damping(problem, hs,
                       compute_hessian_values(problem, hs, lin),
                       lin.diag, 1e-3, False)
    sv = schur_values(problem, ss, hv)
    S1 = np.asarray(dcs.schur_to_dense(problem, ss, sv))
    saved = dcs._DENSE_INTERLEAVE_NPB
    try:
        dcs._DENSE_INTERLEAVE_NPB = 4  # force the chunked path
        problem._cache.pop("schur_dense_map", None)
        S2 = np.asarray(dcs.schur_to_dense(problem, ss, sv))
    finally:
        dcs._DENSE_INTERLEAVE_NPB = saved
    np.testing.assert_array_equal(S1, S2)
