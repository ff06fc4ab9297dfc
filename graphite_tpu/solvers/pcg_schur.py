"""PCG on the explicit Schur system — the flagship bundle-adjustment path.

TPU-native analog of ``PCGSchurSolver`` (reference: solver/pcg_schur.hpp:24-169):

- per solve: damp H, rebuild Schur values + preconditioner (:81-84);
- PCG loop on ``S dx_p = b_S`` with the same normalization / rejection
  semantics as the matrix-free PCG (:108-163);
- landmark back-substitution after convergence (:166).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..hessian import (
    HessianValues,
    apply_damping,
    build_hessian_structure,
    compute_hessian_values,
)
from ..linearize import Linearization
from ..ops.pcg_loop import run_pcg
from ..preconditioners.block_jacobi_schur import (
    BlockJacobiSchurPreconditioner,
)
from ..schur import SchurOps, build_schur_structure, schur_values


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SchurSolverState:
    hvals: HessianValues  # undamped Hessian block values


@dataclasses.dataclass(frozen=True)
class PCGSchurSolver:
    max_iter: int = 10
    tol: float = 1.0
    rejection_ratio: float = 5.0
    preconditioner: object = dataclasses.field(
        default_factory=BlockJacobiSchurPreconditioner
    )

    def prepare(self, problem, lin: Linearization, params=None):
        hs = build_hessian_structure(problem)
        build_schur_structure(problem)  # cache structure on first use
        return SchurSolverState(hvals=compute_hessian_values(problem, hs, lin))

    def solve(self, problem, lin: Linearization, state: SchurSolverState,
              damping, use_identity: bool, params=None):
        gdt = problem.precision.graph_dtype
        hs = build_hessian_structure(problem)
        ss = build_schur_structure(problem)

        hv = apply_damping(problem, hs, state.hvals, lin.diag, damping,
                           use_identity)
        sv = schur_values(problem, ss, hv)
        ops = SchurOps(problem, ss, hv, sv)
        b_s = ops.b_schur(lin.b)

        pstate = self.preconditioner.prepare(problem, ss, sv)

        def precond(y):
            return self.preconditioner.apply(problem, ss, pstate, y)

        dx_p = run_pcg(b_s, ops.s_matvec, precond, self.max_iter, self.tol,
                       self.rejection_ratio)
        dx_l_rows = ops.landmark_update(lin.b, dx_p)
        return ops.compose_delta(dx_p, dx_l_rows), jnp.asarray(True)
