"""Shared tiny fixtures mirroring the reference's hand-computable factors
(reference tests/factor.cu:9-108, tests/common_types.hpp)."""

import jax.numpy as jnp
import numpy as np

from graphite_tpu import (
    FP64_FP64,
    Graph,
    HuberLoss,
    factor_type,
    vertex_type,
)

# 2D Euclidean point (reference Vec2 fixtures).
POINT2 = vertex_type("point2", 2)


def unary_residual(p, obs):
    # E=1: r = x^2 + y^2 - obs^2 (the circle factor, circle.cu:51-57)
    return jnp.array([p[0] ** 2 + p[1] ** 2 - obs**2])


def unary_jacobian(p, obs):
    return (jnp.array([[2.0 * p[0], 2.0 * p[1]]]),)


CIRCLE_AUTO = factor_type("circle_auto", 1, [POINT2], unary_residual,
                          obs_shape=())
CIRCLE_MANUAL = factor_type("circle_manual", 1, [POINT2], unary_residual,
                            jacobian_fn=unary_jacobian, obs_shape=())


def binary_residual(a, b, obs):
    # E=2: r = a - b - obs (relative 2D constraint)
    return a - b - obs


BINARY = factor_type("binary2", 2, [POINT2, POINT2], binary_residual,
                     obs_shape=(2,))


def coupled_residual(p):
    # E=2 unary with cross terms: r = [x*y, x+3y] — exercises dense 2x2 J.
    return jnp.array([p[0] * p[1], p[0] + 3.0 * p[1]])


COUPLED = factor_type("coupled", 2, [POINT2], coupled_residual)

HUBER_CIRCLE = factor_type("circle_huber", 1, [POINT2], unary_residual,
                           obs_shape=(), loss=HuberLoss())


def build_circle_graph(points, radius=4.0, fixed_ids=(), disabled=(),
                       manual=False, precision=FP64_FP64, scale=True):
    """5-point circle-fit graph (examples/circle.cu:75-179)."""
    g = Graph(precision=precision)
    g.scale_system(scale)
    vs = g.add_vertex_set(POINT2)
    for i, p in enumerate(points):
        vs.add(10 + i, p)
    for gid in fixed_ids:
        vs.set_fixed(gid, True)
    fs = g.add_factor_set(CIRCLE_MANUAL if manual else CIRCLE_AUTO)
    handles = [fs.add([10 + i], obs=radius) for i in range(len(points))]
    for i in disabled:
        fs.set_active(handles[i], 0x1)  # level 1 > opt level 0 => inactive
    return g, vs, fs, handles
