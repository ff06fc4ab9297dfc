"""Robust-loss end-to-end: Huber BA shrugs off gross outliers that break
quadratic BA (the reference's Huber reweighting applied at system level,
loss.hpp:27-51 + chi2-derivative reweighting)."""

import numpy as np

import graphite_tpu as gt
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.solvers import PCGSchurSolver


def _corrupted(seed=0, frac=0.08, magnitude=300.0):
    ds = synthetic.make_bal("mini", seed=seed, noise=0.3)
    rng = np.random.default_rng(seed + 1)
    n = ds.num_observations
    bad = rng.random(n) < frac
    ds.observations[bad] += rng.normal(0, magnitude, (int(bad.sum()), 2))
    return ds


def _camera_error(ds, params):
    return float(np.abs(
        np.asarray(params["bal_camera"]) - ds.cameras
    ).mean())


def test_huber_beats_quadratic_under_outliers():
    results = {}
    for name, loss, delta in [("l2", None, None),
                              ("huber", gt.HuberLoss(), 5.0)]:
        ds = _corrupted()
        g, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64, loss=loss,
                                   loss_param=delta)
        problem = g.freeze()
        solver = PCGSchurSolver(max_iter=50, tol=1e-10, rejection_ratio=1e6)
        res = levenberg_marquardt(
            problem, solver,
            options=LevenbergMarquardtOptions(iterations=25,
                                              initial_damping=1e-4),
        )
        # measure reprojection error against the INLIER observations only
        pred = synthetic.project_np(
            np.asarray(res.params["bal_camera"])[ds.cam_idx],
            np.asarray(res.params["bal_point"])[ds.point_idx],
        )
        r = np.linalg.norm(pred - ds.observations, axis=1)
        results[name] = np.median(r)
    # Huber's median inlier error must be clearly better than quadratic's
    assert results["huber"] < 0.7 * results["l2"], results
