"""BAL (Bundle Adjustment in the Large) camera model.

TPU-native analog of the reference's BAL example traits
(reference: examples/bal.cuh:11-89, examples/reprojection_error.cuh:61-126):

- camera vertex: 9 parameters [angle-axis rvec(3), translation t(3), focal f,
  distortion k1, k2] with full-state backup (bal.cuh:31-53);
- point vertex: 3 parameters, additive;
- reprojection factor (E=2): Rodrigues rotation, perspective division with
  the BAL -P/P.z convention, radial distortion, minus the observed pixel
  (https://grail.cs.washington.edu/projects/bal/ model).

Jacobians come from ``jax.jacfwd`` of this residual — replacing the
reference's wrenfold-generated analytic 2x9/2x3 blocks
(examples/projection_jacobians.cuh, examples/reprojection_error.py): XLA is
the code generator here, and tests check jacfwd against finite differences.
"""

from __future__ import annotations

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


REPROJECTION = factor_type(
    "bal_reprojection", 2, [CAMERA, POINT], reprojection_residual,
    obs_shape=(2,),
)
