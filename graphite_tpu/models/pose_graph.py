"""Pose-graph (SLAM) model families: SE2 and SE3 relative-pose factors.

The reference framework's primary workload class besides BAL (it is a
general factor-graph library — docs/markdown/main.md; ORB-SLAM-style staged
optimization hooks at factor.hpp:419, optimizer/levenberg_marquardt.hpp:255).
These models provide the standard g2o-style pose graph:

- SE2 vertex (3 params, 3-dim tangent) / SE3 vertex (7 params [t, quat],
  6-dim tangent, right-perturbation retract with quaternion renorm);
- binary relative-pose factors r = Log(Z^{-1} X_a^{-1} X_b) with per-edge
  information matrices (the factor `precision`);
- unary prior factors to gauge-fix the first pose.

Jacobians are jacfwd through the retraction (lift-solve-retract), i.e. true
tangent-space Jacobians.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..factors import factor_type
from ..vertices import vertex_type
from . import lie

# --------------------------------------------------------------------------
# SE2
# --------------------------------------------------------------------------

SE2 = vertex_type("se2_pose", 3, retract=lie.se2_retract)


def se2_between_residual(xa, xb, obs):
    """r = (a^{-1} b) - z with wrapped angle; obs = (dx, dy, dtheta)."""
    rel = lie.se2_relative(xa, xb)
    return jnp.stack([
        rel[0] - obs[0],
        rel[1] - obs[1],
        lie.angle_wrap(rel[2] - obs[2]),
    ])


SE2_BETWEEN = factor_type("se2_between", 3, [SE2, SE2], se2_between_residual,
                          obs_shape=(3,))


def se2_prior_residual(x, obs):
    return jnp.stack([
        x[0] - obs[0], x[1] - obs[1], lie.angle_wrap(x[2] - obs[2])
    ])


SE2_PRIOR = factor_type("se2_prior", 3, [SE2], se2_prior_residual,
                        obs_shape=(3,))

# --------------------------------------------------------------------------
# SE3
# --------------------------------------------------------------------------

SE3 = vertex_type("se3_pose", 6, ambient_dim=7, retract=lie.se3_retract)


def se3_between_residual(xa, xb, obs):
    """r = Log(Z^{-1} a^{-1} b); obs = 7-param measured relative pose."""
    rel = lie.se3_compose(lie.se3_inverse(xa), xb)
    err = lie.se3_compose(lie.se3_inverse(obs), rel)
    return lie.se3_log(err)


SE3_BETWEEN = factor_type("se3_between", 6, [SE3, SE3], se3_between_residual,
                          obs_shape=(7,))


def se3_prior_residual(x, obs):
    return lie.se3_log(lie.se3_compose(lie.se3_inverse(obs), x))


SE3_PRIOR = factor_type("se3_prior", 6, [SE3], se3_prior_residual,
                        obs_shape=(7,))
