"""N-ary custom factors and irregular block sparsity (BASELINE config 5).

A 3-ary bundle-adjustment variant: pose (6) + point (3) + shared camera
intrinsics (3: f, k1, k2) — one intrinsics vertex referenced by ALL factors
(a hub vertex creating a dense Hessian row), mixing three block dims in one
problem. Plus a 4-ary "parallax" factor to exercise arity > 3.
"""

import jax
import jax.numpy as jnp
import numpy as np

import graphite_tpu as gt
from graphite_tpu.linearize import linearize
from graphite_tpu.optimizers import (
    LevenbergMarquardtOptions,
    levenberg_marquardt,
)
from graphite_tpu.preconditioners import BlockJacobiPreconditioner
from graphite_tpu.solvers import DenseCholeskySolver, PCGSolver

from graphite_tpu.models import lie
from test_linearize import dense_from_blocks

POSE = gt.vertex_type("nary_pose", 6, ambient_dim=7, retract=lie.se3_retract)
POINT = gt.vertex_type("nary_point", 3)
INTRINSICS = gt.vertex_type("nary_intr", 3)


def reproj3(pose, point, intr, obs):
    Pc = lie.quat_rotate(lie.quat_conj(pose[3:7]), point - pose[:3])
    p = Pc[:2] / Pc[2]
    r2 = jnp.dot(p, p)
    d = 1.0 + intr[1] * r2 + intr[2] * r2 * r2
    return intr[0] * d * p - obs


REPROJ3 = gt.factor_type("reproj3", 2, [POSE, POINT, INTRINSICS], reproj3,
                         obs_shape=(2,))


def quad_residual(a, b, c, d):
    # 4-ary: sum of the four points should vanish (toy closure constraint)
    return a + b + c + d


QUAD = gt.factor_type("quad", 3, [POINT, POINT, POINT, POINT], quad_residual)


def _make_problem(seed=0, n_poses=4, n_points=30, n_obs=120):
    rng = np.random.default_rng(seed)
    g = gt.Graph(precision=gt.FP64_FP64)
    poses = g.add_vertex_set(POSE)
    pts = g.add_vertex_set(POINT)
    intr = g.add_vertex_set(INTRINSICS)

    pts_true = rng.normal(0, 0.5, (n_points, 3))
    intr_true = np.array([500.0, 1e-3, -1e-4])
    pose_params = []
    for i in range(n_poses):
        t = np.array([2 * np.cos(i), 2 * np.sin(i), 5.0])
        q = np.array([0.0, 0.0, 0.0, 1.0])
        pose_params.append(np.concatenate([t, q]))
        poses.add(i, pose_params[-1])
    for j in range(n_points):
        pts.add(1000 + j, pts_true[j] + rng.normal(0, 0.02, 3))
    intr.add(5000, intr_true * np.array([1.02, 1.0, 1.0]))

    fs = g.add_factor_set(REPROJ3)
    for _ in range(n_obs):
        i = rng.integers(0, n_poses)
        j = rng.integers(0, n_points)
        pose = pose_params[i]
        Pc = pts_true[j] - pose[:3]
        p = Pc[:2] / Pc[2]
        r2 = p @ p
        d = 1.0 + intr_true[1] * r2 + intr_true[2] * r2 * r2
        obs = intr_true[0] * d * p + rng.normal(0, 0.3, 2)
        fs.add([i, 1000 + j, 5000], obs=obs)
    poses.set_fixed(0, True)
    return g


def test_nary_linearize_matches_dense():
    g = _make_problem()
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    H, b = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(np.asarray(lin.b)[: problem.dim_h], b,
                               rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lin.diag)[: problem.dim_h],
                               np.diag(H), rtol=1e-9, atol=1e-12)


def test_nary_hessian_blocks():
    from graphite_tpu.hessian import (
        build_hessian_structure,
        compute_hessian_values,
        hessian_to_dense,
    )

    g = _make_problem()
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    hs = build_hessian_structure(problem)
    # three block dims present: 6 (pose), 3 (point/intr)
    assert (6, 6) in hs.group_sizes and (3, 3) in hs.group_sizes
    vals = compute_hessian_values(problem, hs, lin)
    H = hessian_to_dense(problem, hs, vals)
    Href, _ = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(H, Href, rtol=1e-10, atol=1e-11)


def test_nary_lm_reduces_chi2():
    g = _make_problem()
    problem = g.freeze()
    solver = PCGSolver(max_iter=100, tol=1e-12, rejection_ratio=1e6,
                       preconditioner=BlockJacobiPreconditioner())
    res = levenberg_marquardt(
        problem, solver,
        options=LevenbergMarquardtOptions(iterations=15, initial_damping=1e-3),
    )
    assert res.chi2 < 0.05 * res.initial_chi2
    # the intrinsics hub vertex must agree with a direct solve: PCG with the
    # dense-row intrinsics block still converges to the same optimum
    res_direct = levenberg_marquardt(
        problem, DenseCholeskySolver(),
        options=LevenbergMarquardtOptions(iterations=15, initial_damping=1e-3),
    )
    np.testing.assert_allclose(res.chi2, res_direct.chi2, rtol=1e-6)


def test_quad_4ary_factor():
    rng = np.random.default_rng(1)
    g = gt.Graph(precision=gt.FP64_FP64)
    pts = g.add_vertex_set(POINT)
    vals = rng.normal(0, 1, (8, 3))
    for i in range(8):
        pts.add(i, vals[i])
    fs = g.add_factor_set(QUAD)
    fs.add([0, 1, 2, 3])
    fs.add([2, 3, 4, 5])
    fs.add([4, 5, 6, 7])
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    H, b = dense_from_blocks(problem, lin)
    np.testing.assert_allclose(np.asarray(lin.b)[: problem.dim_h], b,
                               rtol=1e-12, atol=1e-13)
    res = levenberg_marquardt(
        problem, DenseCholeskySolver(),
        options=LevenbergMarquardtOptions(iterations=20,
                                          initial_damping=1e-6),
    )
    assert res.chi2 < 1e-12 * max(1.0, res.initial_chi2)
