"""Real-format IO fixtures (VERDICT r1 item 7).

The fixtures in tests/fixtures/ reproduce the *published file layouts*
byte-for-byte-style (BAL: one parameter per line after the observation
block, grail.cs.washington.edu/projects/bal; g2o: EDGE_SE2/EDGE_SE3:QUAT
row-major upper-tri information; TORO: EDGE2 with its reordered
information I_xx I_xy I_yy I_tt I_xt I_yt). The values are synthetic but
the *formats* are the real ones — these tests would catch a column-order
or info-matrix-ordering bug that synthetic round-trips cannot
(reference format ground truth: examples/bal.cu:63-131).

`tools/fetch_real_datasets.py` downloads and verifies the actual archives
when network access exists.
"""

import bz2
import os

import numpy as np

import graphite_tpu as gt
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import g2o as g2o_io
from graphite_tpu.linearize import linearize

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _bal_checks(ds):
    assert ds.num_cameras == 2
    assert ds.num_points == 3
    assert ds.num_observations == 5
    np.testing.assert_array_equal(ds.cam_idx, [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(ds.point_idx, [0, 1, 2, 0, 2])
    # column order: cam point x y
    np.testing.assert_allclose(ds.observations[0], [-332.65, 262.09])
    np.testing.assert_allclose(ds.observations[3], [73.315, 27.155])
    # 9 camera params, one per line: R(3) t(3) f k1 k2
    np.testing.assert_allclose(ds.cameras[0, 0], -1.5741515942940262e-02)
    np.testing.assert_allclose(ds.cameras[0, 6], 3.9975152639358436e+02)
    np.testing.assert_allclose(ds.cameras[1, 8], 6.0147337811043612e-13)
    np.testing.assert_allclose(ds.points[0],
                               [-0.61200015717226911, 0.57175904776028286,
                                -1.8470812764548823])
    np.testing.assert_allclose(ds.points[2, 2], -1.4183511531618731)


def test_bal_real_format():
    path = os.path.join(FIXTURES, "bal_head_real_format.txt")
    _bal_checks(bal_io.load(path))  # native parser when built
    _bal_checks(bal_io._load_numpy(path))  # NumPy fallback explicitly


def test_bal_real_format_bz2(tmp_path):
    src = os.path.join(FIXTURES, "bal_head_real_format.txt")
    dst = str(tmp_path / "head.txt.bz2")
    with open(src, "rb") as f, bz2.open(dst, "wb") as out:
        out.write(f.read())
    _bal_checks(bal_io._load_numpy(dst))


def test_bal_real_format_builds_and_linearizes():
    ds = bal_io.load(os.path.join(FIXTURES, "bal_head_real_format.txt"))
    g, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    chi2 = float(linearize(problem, problem.params0).chi2)
    assert np.isfinite(chi2) and chi2 > 0


def test_g2o_se2_info_ordering_and_fix():
    ds = g2o_io.load(os.path.join(FIXTURES, "se2_real_format.g2o"))
    assert ds.kind == "se2"
    np.testing.assert_array_equal(ds.vertex_ids, [0, 1, 2])
    np.testing.assert_array_equal(ds.fixed_ids, [0])
    np.testing.assert_array_equal(ds.edges, [[0, 1], [1, 2], [0, 2]])
    np.testing.assert_allclose(ds.measurements[1],
                               [1.0139, -0.058639, 0.013225])
    # row-major upper-tri: I00 I01 I02 I11 I12 I22
    np.testing.assert_allclose(
        ds.information[2],
        [[10.0, 1.0, 2.0], [1.0, 20.0, 3.0], [2.0, 3.0, 30.0]],
    )
    # FIX line pins vertex 0 in the built graph
    g, vs, *_ = g2o_io.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    chi2 = float(linearize(problem, problem.params0).chi2)
    assert np.isfinite(chi2)


def test_toro_edge2_info_reordering():
    """TORO's EDGE2 info order differs from g2o's EDGE_SE2; the two
    fixtures encode the SAME matrices in both layouts."""
    g2o_ds = g2o_io.load(os.path.join(FIXTURES, "se2_real_format.g2o"))
    toro_ds = g2o_io.load(
        os.path.join(FIXTURES, "se2_toro_real_format.graph"))
    assert toro_ds.kind == "se2"
    np.testing.assert_allclose(toro_ds.information,
                               g2o_ds.information[:2])
    np.testing.assert_allclose(toro_ds.measurements,
                               g2o_ds.measurements[:2])
    # distinct entries pin the reorder: I_xt is 5th, I_tt is 4th
    np.testing.assert_allclose(toro_ds.information[0, 0, 2], 0.25)
    np.testing.assert_allclose(toro_ds.information[0, 1, 2], 0.30)
    np.testing.assert_allclose(toro_ds.information[0, 2, 2], 44.721360)


def test_g2o_se3_quat_info_ordering():
    ds = g2o_io.load(os.path.join(FIXTURES, "se3_quat_real_format.g2o"))
    assert ds.kind == "se3"
    assert ds.poses.shape == (2, 7)
    assert ds.measurements.shape == (2, 7)
    # measurement column order: x y z qx qy qz qw
    np.testing.assert_allclose(ds.measurements[0, 6], 0.999260)
    info = ds.information[0]
    # 21 row-major upper-tri values 1..21
    expect = np.zeros((6, 6))
    expect[np.triu_indices(6)] = np.arange(1, 22)
    expect = expect + np.triu(expect, 1).T
    np.testing.assert_allclose(info, expect)
    np.testing.assert_allclose(ds.information[1].diagonal(),
                               [100, 100, 100, 400, 400, 400])


def test_g2o_roundtrip_preserves_fix_and_info(tmp_path):
    ds = g2o_io.load(os.path.join(FIXTURES, "se2_real_format.g2o"))
    path = str(tmp_path / "rt.g2o")
    g2o_io.save(path, ds)
    ds2 = g2o_io.load(path)
    np.testing.assert_array_equal(ds2.fixed_ids, ds.fixed_ids)
    np.testing.assert_allclose(ds2.information, ds.information, rtol=1e-12)
    np.testing.assert_allclose(ds2.measurements, ds.measurements,
                               rtol=1e-12)


def test_bal_loader_handle_mappings():
    """build_graph reorders observations (CSC-aligned); the exposed
    handle<->dataset-row mappings must be mutual inverses and consistent
    with the stored observation data."""
    import numpy as np

    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic

    ds = synthetic.make_bal("mini", seed=3)
    g, cams, pts, fs = bal_io.build_graph(ds)
    order = fs.input_order
    inv = fs.handle_of_input
    n = ds.num_observations
    assert np.array_equal(np.sort(order), np.arange(n))
    assert np.array_equal(order[inv], np.arange(n))
    # handle h stores dataset row order[h]'s observation
    obs_arr = fs.obs_array()
    np.testing.assert_allclose(obs_arr, ds.observations[order])
