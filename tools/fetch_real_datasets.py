#!/usr/bin/env python
"""Fetch real BAL / g2o datasets and verify the parsers against them.

This container has no network access, so the test suite runs on checked-in
real-*format* fixtures (tests/fixtures/). When run on a machine with
network access, this script downloads the actual published archives and
validates `graphite_tpu.io` end-to-end on them (VERDICT r1 item 7):

    python tools/fetch_real_datasets.py [--dir DATA] [--optimize]

Checks per dataset: header counts match the filename, index ranges valid,
all values finite, save->load round-trip exact, initial chi2 finite, and
(with --optimize) LM reduces the cost by >10x.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

BAL_BASE = "https://grail.cs.washington.edu/projects/bal/data"
DATASETS = {
    # name -> (url, kind)
    "ladybug-49": (f"{BAL_BASE}/ladybug/problem-49-7776-pre.txt.bz2", "bal"),
    "trafalgar-21": (
        f"{BAL_BASE}/trafalgar/problem-21-11315-pre.txt.bz2", "bal"),
    "venice-52": (f"{BAL_BASE}/venice/problem-52-64053-pre.txt.bz2", "bal"),
    # sphere2500 as shipped with g2o
    "sphere2500": (
        "https://raw.githubusercontent.com/RainerKuemmerle/g2o/master/"
        "g2o/examples/sphere/sphere2500.g2o", "g2o"),
    # TORO-format Olson Manhattan world (classic SE2 benchmark)
    "manhattan-olson": (
        "https://www.dropbox.com/s/i4kwvg2ppu4wenc/manhattanOlson3500.g2o"
        "?dl=1", "g2o"),
}


def fetch(url: str, dest: str) -> str:
    if os.path.exists(dest):
        print(f"  cached: {dest}")
        return dest
    print(f"  fetching {url}")
    urllib.request.urlretrieve(url, dest)
    return dest


def verify_bal(path: str, optimize: bool) -> None:
    import numpy as np

    import graphite_tpu as gt
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.linearize import linearize

    ds = bal_io.load(path)
    base = os.path.basename(path)
    # filenames are problem-<cams>-<points>-pre.txt[.bz2]
    parts = base.split("-")
    assert ds.num_cameras == int(parts[1]), (ds.num_cameras, base)
    assert ds.num_points == int(parts[2]), (ds.num_points, base)
    assert ds.cam_idx.min() >= 0 and ds.cam_idx.max() < ds.num_cameras
    assert ds.point_idx.min() >= 0 and ds.point_idx.max() < ds.num_points
    for arr in (ds.cameras, ds.points, ds.observations):
        assert np.isfinite(arr).all()
    # round-trip exactness (catches column-order bugs)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt") as tmp:
        bal_io.save(tmp.name, ds)
        ds2 = bal_io.load(tmp.name)
        np.testing.assert_array_equal(ds2.cam_idx, ds.cam_idx)
        np.testing.assert_allclose(ds2.cameras, ds.cameras, rtol=1e-15)
        np.testing.assert_allclose(ds2.points, ds.points, rtol=1e-15)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    chi2 = float(linearize(problem, problem.params0).chi2)
    mse = chi2 / ds.num_observations
    print(f"  cams={ds.num_cameras} pts={ds.num_points} "
          f"obs={ds.num_observations} initial chi2={chi2:.6e} "
          f"MSE={mse:.4f} px^2")
    assert np.isfinite(chi2) and chi2 > 0
    if optimize:
        from graphite_tpu.optimizers import (
            LevenbergMarquardtOptions, levenberg_marquardt)
        from graphite_tpu.solvers import PCGSchurSolver

        res = levenberg_marquardt(
            problem, PCGSchurSolver(max_iter=10, tol=1.0,
                                    rejection_ratio=5.0),
            options=LevenbergMarquardtOptions(iterations=30,
                                              initial_damping=1e-4,
                                              jit_loop=True))
        print(f"  LM: chi2 {res.initial_chi2:.4e} -> {res.chi2:.4e} "
              f"(MSE {res.chi2 / ds.num_observations:.4f} px^2)")
        assert res.chi2 < 0.1 * res.initial_chi2


def verify_g2o(path: str, optimize: bool) -> None:
    import numpy as np

    import graphite_tpu as gt
    from graphite_tpu.io import g2o as g2o_io
    from graphite_tpu.linearize import linearize

    ds = g2o_io.load(path)
    assert ds.num_edges > 0 and ds.num_vertices > 0
    assert np.isfinite(ds.poses).all()
    assert np.isfinite(ds.information).all()
    # information matrices must be symmetric PSD-ish (diag > 0)
    assert (ds.information.diagonal(axis1=1, axis2=2) > 0).all()
    g, *_ = g2o_io.build_graph(ds, precision=gt.FP64_FP64
                               if ds.kind == "se3" else gt.FP32_FP32)
    problem = g.freeze()
    chi2 = float(linearize(problem, problem.params0).chi2)
    print(f"  kind={ds.kind} V={ds.num_vertices} E={ds.num_edges} "
          f"initial chi2={chi2:.6e}")
    assert np.isfinite(chi2)
    if optimize:
        from graphite_tpu.optimizers import (
            LevenbergMarquardtOptions, levenberg_marquardt)
        from graphite_tpu.preconditioners import BlockJacobiPreconditioner
        from graphite_tpu.solvers import PCGSolver

        res = levenberg_marquardt(
            problem,
            PCGSolver(max_iter=50, tol=1e-6, rejection_ratio=1e6,
                      preconditioner=BlockJacobiPreconditioner()),
            options=LevenbergMarquardtOptions(iterations=30,
                                              initial_damping=1e-4))
        print(f"  LM: chi2 {res.initial_chi2:.4e} -> {res.chi2:.4e}")
        assert res.chi2 < res.initial_chi2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data")
    ap.add_argument("--optimize", action="store_true",
                    help="also run LM on each dataset")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of dataset names")
    args = ap.parse_args()
    os.makedirs(args.dir, exist_ok=True)
    failures = []
    for name, (url, kind) in DATASETS.items():
        if args.only and name not in args.only:
            continue
        print(f"[{name}]")
        try:
            ext = ".txt.bz2" if kind == "bal" else ".g2o"
            path = fetch(url, os.path.join(args.dir, name + ext))
            (verify_bal if kind == "bal" else verify_g2o)(
                path, args.optimize)
        except Exception as e:  # noqa: BLE001 - report-all CLI
            print(f"  FAILED: {e}")
            failures.append(name)
    if failures:
        print(f"failures: {failures}")
        return 1
    print("all datasets verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
