"""SE2/SE3 Lie ops and pose-graph optimization end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

import graphite_tpu as gt
from graphite_tpu.io import g2o, synthetic
from graphite_tpu.models import lie, pose_graph as pg
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.preconditioners import BlockJacobiPreconditioner
from graphite_tpu.solvers import PCGSolver, SparseDirectSolver


RNG = np.random.default_rng(7)


def rand_quat():
    q = RNG.normal(size=4)
    return q / np.linalg.norm(q)


def rand_se3():
    return np.concatenate([RNG.normal(0, 2, 3), rand_quat()])


class TestLieOps:
    def test_exp_log_roundtrip(self):
        for _ in range(10):
            xi = RNG.normal(0, 1.0, 6)
            x = lie.se3_exp(jnp.asarray(xi))
            back = np.asarray(lie.se3_log(x))
            np.testing.assert_allclose(back, xi, rtol=1e-9, atol=1e-10)

    def test_exp_log_small_angle(self):
        xi = jnp.asarray([1e-9, -2e-9, 3e-9, 1e-10, -1e-10, 2e-10])
        back = np.asarray(lie.se3_log(lie.se3_exp(xi)))
        np.testing.assert_allclose(back, np.asarray(xi), atol=1e-15)

    def test_compose_inverse(self):
        a, b = jnp.asarray(rand_se3()), jnp.asarray(rand_se3())
        ab = lie.se3_compose(a, b)
        ident = lie.se3_compose(lie.se3_inverse(ab), ab)
        np.testing.assert_allclose(
            np.asarray(ident), np.asarray(lie.se3_identity(jnp.float64)),
            atol=1e-12,
        )

    def test_retract_zero_is_identity(self):
        x = jnp.asarray(rand_se3())
        out = lie.se3_retract(x, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-12)

    def test_retract_jacfwd_finite_at_zero(self):
        x = jnp.asarray(rand_se3())

        def f(d):
            return lie.se3_retract(x, d)

        J = np.asarray(jax.jacfwd(f)(jnp.zeros(6)))
        assert np.all(np.isfinite(J))
        assert np.linalg.matrix_rank(J) == 6

    def test_quat_rotate_matches_matrix(self):
        q = jnp.asarray(rand_quat())
        v = jnp.asarray(RNG.normal(size=3))
        # rotate via composition: q * (0,v) * q^-1
        qv = jnp.concatenate([v, jnp.zeros(1)])
        out2 = lie.quat_mul(lie.quat_mul(q, qv), lie.quat_conj(q))[:3]
        np.testing.assert_allclose(
            np.asarray(lie.quat_rotate(q, v)), np.asarray(out2), atol=1e-12
        )

    def test_se2_relative(self):
        a = jnp.asarray([1.0, 2.0, 0.3])
        b = jnp.asarray([2.0, 1.0, -0.4])
        rel = lie.se2_relative(a, b)
        back = lie.se2_retract(a, rel)
        # retract applies R(theta) d_t which matches relative's frame
        np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-12)


def test_between_residual_zero_at_truth():
    a = jnp.asarray(rand_se3())
    delta = jnp.asarray(np.concatenate([RNG.normal(0, 1, 3),
                                        RNG.normal(0, 0.5, 3)]))
    b = lie.se3_retract(a, delta)
    z = lie.se3_compose(lie.se3_inverse(a), b)
    r = pg.se3_between_residual(a, b, z)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


def _optimize_pose_graph(ds, solver=None, iters=30):
    g, *_ = g2o.build_graph(ds, precision=gt.FP64_FP64)
    problem = g.freeze()
    solver = solver or PCGSolver(
        max_iter=50, tol=1e-10, rejection_ratio=1e6,
        preconditioner=BlockJacobiPreconditioner(),
    )
    opts = LevenbergMarquardtOptions(iterations=iters, initial_damping=1e-4)
    return problem, levenberg_marquardt(problem, solver, options=opts)


def test_se2_pose_graph_converges():
    ds = synthetic.make_pose_graph_2d(n_poses=60, seed=0)
    problem, res = _optimize_pose_graph(ds)
    assert res.chi2 < 0.02 * res.initial_chi2
    # first pose fixed (gauge)
    np.testing.assert_array_equal(
        np.asarray(res.params["se2_pose"])[0], ds.poses[0]
    )


def test_se3_pose_graph_converges():
    ds = synthetic.make_sphere_se3(n_poses=120, seed=0, loop_every=7)
    problem, res = _optimize_pose_graph(ds, iters=40)
    assert res.chi2 < 0.05 * res.initial_chi2
    # quaternions stay normalized through retraction
    q = np.asarray(res.params["se3_pose"])[:, 3:]
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, rtol=1e-9)


def test_se3_pose_graph_sparse_direct():
    ds = synthetic.make_sphere_se3(n_poses=60, seed=1, loop_every=6)
    p1, res1 = _optimize_pose_graph(ds, iters=20)
    p2, res2 = _optimize_pose_graph(ds, solver=SparseDirectSolver(), iters=20)
    np.testing.assert_allclose(res2.chi2, res1.chi2, rtol=1e-5)


def test_g2o_roundtrip(tmp_path):
    for make, name in [
        (lambda: synthetic.make_pose_graph_2d(20, seed=2), "se2"),
        (lambda: synthetic.make_sphere_se3(20, seed=2, loop_every=5), "se3"),
    ]:
        ds = make()
        path = str(tmp_path / f"{name}.g2o")
        g2o.save(path, ds)
        ds2 = g2o.load(path)
        assert ds2.kind == ds.kind
        np.testing.assert_allclose(ds2.poses, ds.poses, rtol=1e-10)
        np.testing.assert_array_equal(ds2.edges, ds.edges)
        np.testing.assert_allclose(ds2.measurements, ds.measurements,
                                   rtol=1e-10)
        np.testing.assert_allclose(ds2.information, ds.information,
                                   rtol=1e-10)


def test_prior_factor_gauge():
    ds = synthetic.make_pose_graph_2d(n_poses=30, seed=3)
    g, *_ = g2o.build_graph(
        ds, precision=gt.FP64_FP64, prior_information=np.eye(3) * 1e6
    )
    problem = g.freeze()
    solver = SparseDirectSolver()
    opts = LevenbergMarquardtOptions(iterations=25, initial_damping=1e-4)
    res = levenberg_marquardt(problem, solver, options=opts)
    assert res.chi2 < 0.05 * res.initial_chi2
    # prior keeps the first pose near its anchor
    np.testing.assert_allclose(
        np.asarray(res.params["se2_pose"])[0], ds.poses[0], atol=1e-2
    )
