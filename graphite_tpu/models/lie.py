"""SO(3)/SE(3)/SE(2) Lie-group operations, safe under jacfwd at identity.

These power the pose-graph model families (the reference framework is
workload-agnostic — docs/markdown/main.md shows users defining arbitrary
vertex/factor traits; SLAM pose graphs are its primary use case alongside
BAL). Quaternions are stored (x, y, z, w); SE3 vertices are 7 parameters
(tx ty tz qx qy qz qw) with a 6-dim tangent (rho, phi); retractions are the
standard right-perturbation X * Exp(delta).

Every branch around theta -> 0 is written with "safe" denominators +
``where`` so forward-mode differentiation (jacfwd) never sees NaN —
the JAX analog of the reference's Taylor-expansion branch
(examples/reprojection_error.cuh:17-35).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-16  # squared-angle cutoff for small-angle branches


# --------------------------------------------------------------------------
# quaternion (x, y, z, w)
# --------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_mul(q1, q2):
    x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
    x2, y2, z2, w2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def quat_conj(q):
    return jnp.stack([-q[0], -q[1], -q[2], q[3]])


def quat_normalize(q):
    return q / jnp.sqrt(jnp.dot(q, q))


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q."""
    u = q[:3]
    w = q[3]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def so3_exp_quat(phi):
    """Exp: axis-angle (3,) -> unit quaternion."""
    theta2 = jnp.dot(phi, phi)
    theta2_safe = jnp.where(theta2 < _EPS2, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    # sin(t/2)/t with Taylor fallback 1/2 - t^2/48
    k = jnp.where(theta2 < _EPS2, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(theta2 < _EPS2, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([k * phi, jnp.reshape(w, (1,))])


def so3_log(q):
    """Log: unit quaternion -> axis-angle (3,)."""
    u = q[:3]
    w = q[3]
    n2 = jnp.dot(u, u)
    n2_safe = jnp.where(n2 < _EPS2, 1.0, n2)
    n = jnp.sqrt(n2_safe)
    w_abs = jnp.abs(w)
    # theta = 2 atan2(|u|, |w|); sign fixed so result matches sign(w) branch
    theta = 2.0 * jnp.arctan2(n, w_abs)
    # k = theta / sin(theta/2) ~ 2/w at small angles; times sign(w)
    k = jnp.where(n2 < _EPS2, 2.0 / jnp.where(w_abs < 1e-12, 1.0, w),
                  theta / n * jnp.sign(w))
    return k * u


# --------------------------------------------------------------------------
# SE(3): params (tx ty tz qx qy qz qw), tangent (rho(3), phi(3))
# --------------------------------------------------------------------------

def se3_identity(dtype=jnp.float32):
    return jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), quat_identity(dtype)]
    )


def se3_t(x):
    return x[:3]


def se3_q(x):
    return x[3:7]


def se3_compose(a, b):
    """a * b."""
    qa = se3_q(a)
    return jnp.concatenate(
        [se3_t(a) + quat_rotate(qa, se3_t(b)),
         quat_mul(qa, se3_q(b))]
    )


def se3_inverse(x):
    qi = quat_conj(se3_q(x))
    return jnp.concatenate([-quat_rotate(qi, se3_t(x)), qi])


def se3_exp(xi):
    """Exp: tangent (rho, phi) -> SE3 params. First-order V ~= I coupling is
    NOT used — this is the exact exponential with V(phi) rho translation."""
    rho, phi = xi[:3], xi[3:6]
    q = so3_exp_quat(phi)
    theta2 = jnp.dot(phi, phi)
    theta2_safe = jnp.where(theta2 < _EPS2, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # V = I + (1-cos)/t^2 [phi]x + (t - sin)/t^3 [phi]x^2
    a = jnp.where(theta2 < _EPS2, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    b = jnp.where(theta2 < _EPS2, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    px = jnp.cross(phi, rho)
    ppx = jnp.cross(phi, px)
    t = rho + a * px + b * ppx
    return jnp.concatenate([t, q])


def se3_log(x):
    """Log: SE3 params -> tangent (rho, phi)."""
    phi = so3_log(se3_q(x))
    t = se3_t(x)
    theta2 = jnp.dot(phi, phi)
    theta2_safe = jnp.where(theta2 < _EPS2, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    # V^{-1} = I - 1/2 [phi]x + (1/t^2 - cot(t/2)/(2t)) [phi]x^2
    cot_term = jnp.where(
        theta2 < _EPS2,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / theta2_safe,
    )
    px = jnp.cross(phi, t)
    ppx = jnp.cross(phi, px)
    rho = t - 0.5 * px + cot_term * ppx
    return jnp.concatenate([rho, phi])


def se3_retract(x, delta):
    """x * Exp(delta), quaternion re-normalized."""
    out = se3_compose(x, se3_exp(delta))
    return jnp.concatenate([out[:3], quat_normalize(out[3:7])])


# --------------------------------------------------------------------------
# SE(2): params (x, y, theta), tangent (dx, dy, dtheta) — g2o convention
# --------------------------------------------------------------------------

def se2_retract(x, delta):
    """Local perturbation: t += R(theta) dt, theta += dtheta (wrapped)."""
    c, s = jnp.cos(x[2]), jnp.sin(x[2])
    dx = c * delta[0] - s * delta[1]
    dy = s * delta[0] + c * delta[1]
    theta = x[2] + delta[2]
    theta = jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
    return jnp.stack([x[0] + dx, x[1] + dy, theta])


def se2_relative(a, b):
    """b expressed in a's frame: a^{-1} * b as (dx, dy, dtheta)."""
    c, s = jnp.cos(a[2]), jnp.sin(a[2])
    dx = b[0] - a[0]
    dy = b[1] - a[1]
    theta = b[2] - a[2]
    return jnp.stack([
        c * dx + s * dy,
        -s * dx + c * dy,
        jnp.arctan2(jnp.sin(theta), jnp.cos(theta)),
    ])


def angle_wrap(theta):
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
