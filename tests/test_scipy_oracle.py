"""Independent optimizer oracle: graphite_tpu LM vs scipy.optimize on the
same nonlinear least-squares problem (an oracle the reference doesn't have —
its tests only cross-check its own solvers)."""

import numpy as np
import scipy.optimize

import graphite_tpu as gt
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.io.synthetic import project_np
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.solvers import DenseCholeskySchurSolver


def test_lm_matches_scipy_least_squares():
    ds = synthetic.make_bal("mini", seed=3, noise=0.2)
    g, cams, pts, fs = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    res = levenberg_marquardt(
        problem, DenseCholeskySchurSolver(),
        options=LevenbergMarquardtOptions(iterations=60,
                                          initial_damping=1e-4),
    )

    # scipy on the identical residual stack (flattened parameters)
    n_cam, n_pt = ds.num_cameras, ds.num_points

    def residuals(x):
        cams_ = x[: n_cam * 9].reshape(n_cam, 9)
        pts_ = x[n_cam * 9:].reshape(n_pt, 3)
        pred = project_np(cams_[ds.cam_idx], pts_[ds.point_idx])
        return (pred - ds.observations).ravel()

    x0 = np.concatenate([ds.cameras.ravel(), ds.points.ravel()])
    out = scipy.optimize.least_squares(residuals, x0, method="trf",
                                       xtol=1e-14, ftol=1e-14, gtol=1e-14)
    scipy_cost = float(np.sum(out.fun**2))  # chi2 convention (no 1/2)

    # same basin, same final cost to 1e-6 relative (BASELINE criterion)
    np.testing.assert_allclose(res.chi2, scipy_cost, rtol=1e-6)
