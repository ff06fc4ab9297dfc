"""Matrix-free preconditioned conjugate gradients.

TPU-native analog of ``PCGSolver`` (reference: solver/pcg.hpp:12-233), with
the host PCG loop replaced by a ``lax.while_loop`` over a functional state.
Semantics preserved exactly:

- implicit Hessian product ``H p = J^T dL P (J p) + damping``
  (pcg.hpp:141-168), with damping ``mu * clamp(diag,1e-6,1e32) * p`` or
  ``mu * p`` for identity damping (pcg.hpp:102-104, ops/vector.hpp:26-39);
- the residual is **normalized** before every preconditioner application
  (pcg.hpp:109-121, 184-193);
- divergence guard: if ``|rz_new| > rejection_ratio * rz_0`` or NaN, restore
  the previous x and stop (pcg.hpp:198-206); ``rz_0`` tracks the running
  minimum of ``|rz|`` (pcg.hpp:206);
- termination on ``rz == 0``, ``|rz_new| < tol``, or max_iter; always
  returns ok=True (pcg.hpp:230-231).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..linearize import DIAG_MIN, DIAG_MAX, Linearization, hessian_matvec
from ..preconditioners.identity import IdentityPreconditioner


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PCGState:
    precond_state: object


@dataclasses.dataclass(frozen=True)
class PCGSolver:
    """max_iter/tol/rejection_ratio as in the reference ctor (pcg.hpp:35-39)."""

    max_iter: int = 10
    tol: float = 1.0
    rejection_ratio: float = 5.0
    preconditioner: object = dataclasses.field(
        default_factory=IdentityPreconditioner
    )

    def prepare(self, problem, lin: Linearization, params=None) -> PCGState:
        return PCGState(
            precond_state=self.preconditioner.prepare(problem, lin, params)
        )

    def solve(self, problem, lin: Linearization, state: PCGState,
              damping, use_identity: bool, params=None):
        gdt = problem.precision.graph_dtype
        dim_x = problem.dim_x
        damping = jnp.asarray(damping, dtype=gdt)

        pstate = self.preconditioner.set_damping(
            problem, lin, state.precond_state, damping, use_identity
        )

        diag = jnp.clip(lin.diag, DIAG_MIN, DIAG_MAX)
        if use_identity:
            damp_vec = jnp.ones_like(diag) * damping
        else:
            damp_vec = diag * damping

        def matvec(p):
            return hessian_matvec(problem, lin, p, params) + damp_vec * p

        def precondition(r):
            # Normalize r before preconditioning (pcg.hpp:109-121).
            rnorm = jnp.sqrt(jnp.dot(r, r))
            y = r / jnp.where(rnorm == 0, 1.0, rnorm)
            return self.preconditioner.apply(problem, lin, pstate, y)

        b = lin.b
        x0 = jnp.zeros(dim_x, dtype=gdt)
        r0 = b
        z0 = precondition(r0)
        p0 = z0
        rz0_dot = jnp.dot(r0, z0)
        inf = jnp.asarray(jnp.inf, dtype=gdt)

        # carry: (k, x, r, p, z, rz, rz_min, done)
        def cond(c):
            k, x, r, p, z, rz, rz_min, done = c
            return (k < self.max_iter) & (~done) & (rz != 0)

        def body(c):
            k, x, r, p, z, rz, rz_min, done = c
            v2 = matvec(p)
            pv = jnp.dot(p, v2)
            alpha = rz / pv
            x_new = x + alpha * p
            r_new = r - alpha * v2
            z_new = precondition(r_new)
            rz_new = jnp.dot(r_new, z_new)

            reject = (jnp.abs(rz_new) > self.rejection_ratio * rz_min) | jnp.isnan(
                rz_new
            )
            # On rejection restore previous x and stop (pcg.hpp:198-206).
            x_out = jnp.where(reject, x, x_new)
            rz_min_new = jnp.minimum(rz_min, jnp.abs(rz_new))
            beta = rz_new / rz
            p_new = z_new + beta * p
            converged = jnp.abs(rz_new) < self.tol
            done_new = reject | converged
            return (
                k + 1,
                x_out,
                jnp.where(reject, r, r_new),
                jnp.where(reject, p, p_new),
                jnp.where(reject, z, z_new),
                jnp.where(reject, rz, rz_new),
                rz_min_new,
                done_new,
            )

        init = (jnp.asarray(0), x0, r0, p0, z0, rz0_dot, inf, jnp.asarray(False))
        _, x, *_ = jax.lax.while_loop(cond, body, init)
        x = x.at[problem.dim_h:].set(0.0)
        return x, jnp.asarray(True)
