"""BAL (Bundle Adjustment in the Large) camera model.

TPU-native analog of the reference's BAL example traits
(reference: examples/bal.cuh:11-89, examples/reprojection_error.cuh:61-126):

- camera vertex: 9 parameters [angle-axis rvec(3), translation t(3), focal f,
  distortion k1, k2] with full-state backup (bal.cuh:31-53);
- point vertex: 3 parameters, additive;
- reprojection factor (E=2): Rodrigues rotation, perspective division with
  the BAL -P/P.z convention, radial distortion, minus the observed pixel
  (https://grail.cs.washington.edu/projects/bal/ model).

Jacobians: analytic 2x9/2x3 blocks (``reprojection_jacobian``) — the
closed-form chain-rule derivative matching the reference's
wrenfold-generated kernels (examples/projection_jacobians.cuh,
examples/reprojection_error.py). ``jax.jacfwd`` of the residual remains
the oracle (``REPROJECTION_AUTO``; tests/test_bal_jacobian.py) and the
``GRAPHITE_TPU_BAL_AUTODIFF=1`` kill switch restores it as the default:
the analytic form computes the shared projection chain once instead of
pushing 12 forward tangents through it (~2.5x fewer VPU FLOPs at 5M
factors, the dominant linearize cost at Venice-Final scale).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ..factors import factor_type
from ..vertices import vertex_type

CAMERA = vertex_type("bal_camera", 9)
POINT = vertex_type("bal_point", 3)


def rodrigues_rotate(rvec, X):
    """R(rvec) @ X via the Rodrigues formula, safe to differentiate at
    theta -> 0 (the reference's Taylor branch, reprojection_error.cuh:17-35).
    """
    theta2 = jnp.dot(rvec, rvec)
    # Guard the sqrt so jacfwd at theta == 0 stays finite; the small-angle
    # branch is selected by the where below.
    theta2_safe = jnp.where(theta2 < 1e-24, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    axis = rvec / theta
    cth = jnp.cos(theta)
    sth = jnp.sin(theta)
    axx = jnp.cross(axis, X)
    adx = jnp.dot(axis, X)
    rotated = X * cth + axx * sth + axis * adx * (1.0 - cth)
    small = X + jnp.cross(rvec, X)  # first-order expansion
    return jnp.where(theta2 < 1e-24, small, rotated)


def project(camera, X):
    """BAL projection: pixel = f * distortion * (-P.xy / P.z)."""
    rvec = camera[:3]
    t = camera[3:6]
    f, k1, k2 = camera[6], camera[7], camera[8]
    P = rodrigues_rotate(rvec, X) + t
    p = -P[:2] / P[2]
    r2 = jnp.dot(p, p)
    distortion = 1.0 + k1 * r2 + k2 * r2 * r2
    return f * distortion * p


def reprojection_residual(camera, point, obs):
    return project(camera, point) - obs


def _cross_mat(v):
    """[v]x such that [v]x @ y == cross(v, y)."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.array([
        [z, -v[2], v[1]],
        [v[2], z, -v[0]],
        [-v[1], v[0], z],
    ])


def reprojection_jacobian(camera, point, obs):
    """Analytic (2, 9) / (2, 3) reprojection Jacobian blocks.

    Chain rule through v = R(w) X, P = v + t, p = -P.xy / P.z,
    res = f * (1 + k1 r2 + k2 r2^2) * p — the closed form of the
    reference's generated kernels (examples/projection_jacobians.cuh).

    The Rodrigues derivative uses the sinc-form coefficients
    c = cos(th), a = sinc(th), b = (1-c)/th^2 with

        dv/dw = -a [X]x + b ((w.X) I + w X^T)
                + ((c - a)/th^2 (w x X) - a X + (a - 2b)/th^2 (w.X) w) w^T

    whose cancelling ratios switch to Taylor series below th < 0.1
    (truncation ~th^6: below f32 eps at the cutoff; the closed form above
    it has >= 3e-3 magnitude against ~1e-7 rounding). Consistent at w = 0
    with the residual's first-order branch (dv/dw -> -[X]x = d(X + w x X)).
    """
    w = camera[:3]
    t = camera[3:6]
    f, k1, k2 = camera[6], camera[7], camera[8]
    X = point

    th2 = jnp.dot(w, w)
    small = th2 < 0.01  # th < 0.1
    # guard the exact-form denominators/sqrt so the unselected branch is
    # finite; every small-branch coefficient (including cos) is a Taylor
    # series in th2, so th never enters it
    th2_g = jnp.where(small, 1.0, th2)
    th = jnp.sqrt(th2_g)
    c = jnp.where(small,
                  1.0 - th2 / 2.0 + th2 * th2 / 24.0
                  - th2 * th2 * th2 / 720.0,
                  jnp.cos(th))
    alpha = jnp.where(small,
                      1.0 - th2 / 6.0 + th2 * th2 / 120.0,
                      jnp.sin(th) / th)
    beta = jnp.where(small,
                     0.5 - th2 / 24.0 + th2 * th2 / 720.0,
                     (1.0 - c) / th2_g)
    gamma = jnp.where(small,
                      -1.0 / 3.0 + th2 / 30.0 - th2 * th2 / 840.0,
                      (c - alpha) / th2_g)
    delta = jnp.where(small,
                      -1.0 / 12.0 + th2 / 180.0 - th2 * th2 / 6720.0,
                      (alpha - 2.0 * beta) / th2_g)

    wxX = jnp.cross(w, X)
    wdX = jnp.dot(w, X)
    v = c * X + alpha * wxX + beta * wdX * w
    # exact consistency with the residual's th -> 0 guard
    v = jnp.where(th2 < 1e-24, X + wxX, v)
    P = v + t

    iz = 1.0 / P[2]
    p = -P[:2] * iz
    r2 = jnp.dot(p, p)
    dist = 1.0 + k1 * r2 + k2 * r2 * r2

    # A = dres/dp (2,2); B = dp/dP (2,3); G = A @ B = dres/dP (2,3)
    dd = 2.0 * (k1 + 2.0 * k2 * r2)
    A = f * (dist * jnp.eye(2, dtype=p.dtype) + dd * jnp.outer(p, p))
    B = iz * jnp.concatenate(
        [-jnp.eye(2, dtype=p.dtype), -p[:, None]], axis=1)
    G = A @ B

    # dv/dw (3,3): see docstring
    col = gamma * wxX - alpha * X + delta * wdX * w
    dv_dw = (-alpha * _cross_mat(X)
             + beta * (wdX * jnp.eye(3, dtype=p.dtype) + jnp.outer(w, X))
             + jnp.outer(col, w))
    dv_dw = jnp.where(th2 < 1e-24, -_cross_mat(X), dv_dw)

    R = (c * jnp.eye(3, dtype=p.dtype) + alpha * _cross_mat(w)
         + beta * jnp.outer(w, w))

    J_cam = jnp.concatenate([
        G @ dv_dw,                       # d/d rvec (2,3)
        G,                               # d/d t    (2,3)
        (dist * p)[:, None],             # d/d f    (2,1)
        (f * r2 * p)[:, None],           # d/d k1   (2,1)
        (f * r2 * r2 * p)[:, None],      # d/d k2   (2,1)
    ], axis=1)
    J_pt = G @ R
    return J_cam, J_pt


REPROJECTION = factor_type(
    "bal_reprojection", 2, [CAMERA, POINT], reprojection_residual,
    obs_shape=(2,),
    jacobian_fn=(None if os.environ.get("GRAPHITE_TPU_BAL_AUTODIFF")
                 else reprojection_jacobian),
)

#: jacfwd-differentiated variant — the oracle the analytic blocks are
#: tested against (and the pre-round-5 default).
REPROJECTION_AUTO = factor_type(
    "bal_reprojection_auto", 2, [CAMERA, POINT], reprojection_residual,
    obs_shape=(2,),
)
