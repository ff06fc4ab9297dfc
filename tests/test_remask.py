"""Runtime remasking: levels / factor activity / fixed flags changed AFTER
freeze without structure rediscovery or retracing.

Reference parity: the reference re-runs ``initialize_optimization(level)``
per optimize call (graph.hpp:92-167) and exposes ``set_active``
(factor.hpp:419) / ``set_fixed`` (vertex.hpp:262) between runs; here a
``freeze(remaskable=True)`` problem supports the same mutations at O(masks)
cost via `Problem.remask` — asserted to produce results identical to a
fresh freeze AND to reuse the already-compiled executable (no retrace).
"""

import numpy as np

import graphite_tpu as gt
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.preconditioners import IdentityPreconditioner
from graphite_tpu.solvers import PCGSolver, PCGSchurSolver

from common import build_circle_graph

RNG = np.random.default_rng(7)
R = 4.0
ANGLES = RNG.uniform(0, 2 * np.pi, size=5)
PTS = np.stack(
    [R * np.cos(ANGLES) + RNG.normal(0, 0.3, 5),
     R * np.sin(ANGLES) + RNG.normal(0, 0.3, 5)], axis=1
)


def _solver():
    return PCGSolver(max_iter=60, tol=1e-20, rejection_ratio=10.0,
                     preconditioner=IdentityPreconditioner())


def _run(problem, solver=None, iters=60):
    opts = LevenbergMarquardtOptions(iterations=iters, initial_damping=1e-6,
                                     jit_loop=True)
    return levenberg_marquardt(problem, solver or _solver(), options=opts)


def test_remaskable_matches_classic_freeze():
    """A remaskable freeze (columns for ALL vertices, zero contributions +
    damping-only diagonals for inactive ones) optimizes to the same result
    as a classic freeze."""
    g1, *_ = build_circle_graph(PTS, fixed_ids=(14,), disabled=(2,))
    res_classic = _run(g1.freeze())
    g2, *_ = build_circle_graph(PTS, fixed_ids=(14,), disabled=(2,))
    res_mask = _run(g2.freeze(remaskable=True))
    np.testing.assert_allclose(res_mask.chi2, res_classic.chi2, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res_mask.params["point2"]),
        np.asarray(res_classic.params["point2"]), rtol=1e-7, atol=1e-9,
    )
    # fixed / disabled points stayed exactly put
    np.testing.assert_array_equal(
        np.asarray(res_mask.params["point2"])[4], PTS[4])
    np.testing.assert_array_equal(
        np.asarray(res_mask.params["point2"])[2], PTS[2])


def test_level_flip_no_retrace():
    """Flip optimization levels between two LM runs on one frozen problem:
    identical results to fresh freezes and ZERO recompilation."""
    g, vs, fs, handles = build_circle_graph(PTS)
    # factor 2 at level 1: inactive at opt level 0, active at level 1
    fs.set_active(handles[2], 0x1)
    problem = g.freeze(opt_level=0, remaskable=True)
    solver = _solver()
    res_l0 = _run(problem, solver)

    problem.set_opt_level(1)
    res_l1 = _run(problem, solver)

    # executable reused: the jit cache of the LM program has exactly one entry
    lm_wrappers = [v for k, v in problem._cache.items()
                   if isinstance(k, tuple) and k and k[0] == "lm"]
    assert lm_wrappers, "LM program not cached"
    for w in lm_wrappers:
        assert w._cell["f"]._cache_size() == 1

    # oracle: fresh remaskable freezes at each level
    for level, res in ((0, res_l0), (1, res_l1)):
        g2, _, fs2, h2 = build_circle_graph(PTS)
        fs2.set_active(h2[2], 0x1)
        ref = _run(g2.freeze(opt_level=level, remaskable=True))
        np.testing.assert_allclose(res.chi2, ref.chi2, rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(res.params["point2"]),
            np.asarray(ref.params["point2"]), rtol=1e-7, atol=1e-9,
        )

    # and flipping BACK reproduces the level-0 result bit-for-bit
    problem.set_opt_level(0)
    res_l0b = _run(problem, solver)
    np.testing.assert_array_equal(
        np.asarray(res_l0.params["point2"]),
        np.asarray(res_l0b.params["point2"]))


def test_set_factor_active_and_fixed_post_freeze():
    g, vs, fs, handles = build_circle_graph(PTS)
    problem = g.freeze(remaskable=True)
    solver = _solver()
    _run(problem, solver)  # compile + run once at full activity

    problem.set_factor_active("circle_auto", handles[2], 0x80)  # disable
    problem.set_vertex_fixed("point2", 14, True)
    res = _run(problem, solver)

    g2, *_ = build_circle_graph(PTS, fixed_ids=(14,), disabled=(2,))
    ref = _run(g2.freeze())
    np.testing.assert_allclose(res.chi2, ref.chi2, rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(res.params["point2"])[4], PTS[4])
    np.testing.assert_array_equal(np.asarray(res.params["point2"])[2], PTS[2])

    # un-fix and re-enable: back to the full problem
    problem.set_factor_active("circle_auto", handles[2], 0x0)
    problem.set_vertex_fixed("point2", 14, False)
    res_full = _run(problem, solver)
    g3, *_ = build_circle_graph(PTS)
    ref_full = _run(g3.freeze(remaskable=True))
    np.testing.assert_allclose(res_full.chi2, ref_full.chi2, rtol=1e-9)


def test_remask_schur_landmark_deactivation():
    """Remasking with Schur elimination: deactivating factors leaves some
    landmarks with damping-only diagonals — solves stay well-posed and
    match a fresh freeze."""
    from graphite_tpu.io import synthetic
    from graphite_tpu.io.bal import build_graph

    ds = synthetic.make_bal("toy", seed=0, noise=0.5)
    solver = PCGSchurSolver(max_iter=40, tol=1e-12, rejection_ratio=1e6)
    opts = LevenbergMarquardtOptions(iterations=6, initial_damping=1e-4,
                                     jit_loop=True)

    g, cams, pts, fs = build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze(remaskable=True)
    res_full = levenberg_marquardt(problem, solver, options=opts)

    # disable every factor observing point 0 (its landmark goes inactive);
    # bulk-added factor handles are the contiguous observation indices
    fname = next(iter(problem.factor_meta))
    off = np.nonzero(ds.point_idx == 0)[0].tolist()
    for h in off:
        problem.set_factor_active(fname, h, 0x80)
    res_m = levenberg_marquardt(problem, solver, options=opts)
    assert np.isfinite(res_m.chi2)

    g2, *_ = build_graph(ds, precision=gt.FP64_FP64)
    fs2 = g2.factor_sets[fname]
    for h in off:
        fs2.set_active(h, 0x80)
    res_ref = levenberg_marquardt(g2.freeze(remaskable=True), solver,
                                  options=opts)
    np.testing.assert_allclose(res_m.chi2, res_ref.chi2, rtol=1e-9)
    # the now-unconstrained landmark kept its initial value
    np.testing.assert_array_equal(
        np.asarray(res_m.params["bal_point"])[0],
        np.asarray(problem.params0["bal_point"])[0])
