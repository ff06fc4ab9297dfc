"""Analytic BAL reprojection Jacobian vs the jacfwd oracle.

The analytic 2x9/2x3 blocks (models/bal.py:reprojection_jacobian) replace
jacfwd as the default differentiation for the BAL factor (the reference
ships generated analytic kernels the same way,
examples/projection_jacobians.cuh). These tests pin them to the jacfwd
oracle across the rotation-angle regimes the small-angle branches carve
out, in f64 (tight) and f32 (storage precision), and check the full
linearize pass produces identical H/b under either mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphite_tpu as gt
from graphite_tpu.models import bal as bal_model
from graphite_tpu.linearize import linearize


def _jacfwd_blocks(camera, point, obs, dtype):
    def g(deltas):
        dc, dp = deltas
        return bal_model.reprojection_residual(
            camera + dc, point + dp, obs)

    zeros = (jnp.zeros(9, dtype), jnp.zeros(3, dtype))
    return jax.jacfwd(g)(zeros)


THETAS = [0.0, 1e-13, 1e-7, 1e-3, 0.0999, 0.1001, 0.7, 2.9]


@pytest.mark.parametrize("theta", THETAS)
def test_analytic_matches_jacfwd_f64(theta):
    rng = np.random.default_rng(hash(("balj", theta)) % 2**32)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    cam = np.concatenate([
        axis * theta,
        rng.normal(size=3) * 0.3 + [0.0, 0.0, 2.0],
        [500.0 + rng.normal() * 50, -1e-7, 1e-13],
    ])
    pt = rng.normal(size=3)
    obs = rng.normal(size=2) * 100
    cam_j = jnp.asarray(cam, jnp.float64)
    pt_j = jnp.asarray(pt, jnp.float64)
    obs_j = jnp.asarray(obs, jnp.float64)
    Jc, Jp = bal_model.reprojection_jacobian(cam_j, pt_j, obs_j)
    Jc_o, Jp_o = _jacfwd_blocks(cam_j, pt_j, obs_j, jnp.float64)
    scale = max(1.0, float(np.abs(np.asarray(Jc_o)).max()))
    np.testing.assert_allclose(np.asarray(Jc), np.asarray(Jc_o),
                               rtol=1e-9, atol=1e-9 * scale)
    np.testing.assert_allclose(np.asarray(Jp), np.asarray(Jp_o),
                               rtol=1e-9, atol=1e-9 * scale)


@pytest.mark.parametrize("theta", THETAS)
def test_analytic_matches_jacfwd_f32(theta):
    rng = np.random.default_rng(hash(("balj32", theta)) % 2**32)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    cam = np.concatenate([
        axis * theta,
        rng.normal(size=3) * 0.3 + [0.0, 0.0, 2.0],
        [500.0, -1e-7, 1e-13],
    ])
    pt = rng.normal(size=3)
    obs = np.zeros(2)
    # f64 analytic is the truth; both f32 forms must sit within a few
    # f32 ulps of it
    truth_c, truth_p = bal_model.reprojection_jacobian(
        jnp.asarray(cam, jnp.float64), jnp.asarray(pt, jnp.float64),
        jnp.asarray(obs, jnp.float64))
    Jc, Jp = bal_model.reprojection_jacobian(
        jnp.asarray(cam, jnp.float32), jnp.asarray(pt, jnp.float32),
        jnp.asarray(obs, jnp.float32))
    scale = max(1.0, float(np.abs(np.asarray(truth_c)).max()))
    np.testing.assert_allclose(np.asarray(Jc, np.float64),
                               np.asarray(truth_c), rtol=2e-4,
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(Jp, np.float64),
                               np.asarray(truth_p), rtol=2e-4,
                               atol=2e-4 * scale)


def test_linearize_matches_auto_mode():
    """Full linearize with the analytic factor == jacfwd factor (H diag,
    b, chi2, stored J blocks) on a small synthetic BA problem."""
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic

    ds = synthetic.make_bal((4, 30, 150), seed=11, noise=0.5)

    g1, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64)
    p1 = g1.freeze()
    lin1 = linearize(p1, p1.params0)

    g2, *_ = bal_io.build_graph(ds, precision=gt.FP64_FP64,
                                factor=bal_model.REPROJECTION_AUTO)
    p2 = g2.freeze()
    lin2 = linearize(p2, p2.params0)

    assert p1.factor_meta and "bal_reprojection" in p1.factor_meta
    np.testing.assert_allclose(float(lin1.chi2), float(lin2.chi2),
                               rtol=1e-12)
    # rtol 1e-7: at small rotation angles the jacfwd oracle inherits the
    # residual's (1 - cos th) cancellation, while the analytic form uses
    # Taylor-stable coefficients — the residual error is the ORACLE's
    # (~2e-8 rel on a few elements), not the analytic blocks'.
    np.testing.assert_allclose(np.asarray(lin1.b), np.asarray(lin2.b),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lin1.diag),
                               np.asarray(lin2.diag),
                               rtol=1e-7, atol=1e-10)
    for (n1, j1), (n2, j2) in zip(sorted(lin1.jacobians.items()),
                                  sorted(lin2.jacobians.items())):
        for a, b in zip(j1, j2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-10)
