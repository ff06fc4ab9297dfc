"""Direct solver on the FULL system H dx = b.

Two paths, mirroring the reference's two full-matrix direct solvers:

- **On-device** (TPU default, ``cudssSolver`` analog, cudss.hpp:53-269):
  block values are densified into (dim_h, dim_h) and factorized by the
  recursive blocked Cholesky (ops/blocked_cholesky.py) — the matrix
  stays HBM-resident and only panel tiles stream through VMEM, the TPU
  analog of cudss's hybrid-memory mode (cudss.hpp:112-127). Gated on
  ``on_device_limit`` (dense dim_h x dim_h storage). Required on the
  axon TPU runtime, which does not support host callbacks at all.
- **Host callback** (CPU backend, ``EigenLDLTSolver`` analog,
  eigen.hpp:12-99, src/eigen_solver.cpp:8-103): scalar CSC values are
  assembled on device (one scatter) and factorized host-side with
  scipy's sparse LU per solve — exactly the reference's
  CPU-copy-per-iteration design (eigen.hpp:41-44).

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
    # solve() reads only lin.b / lin.diag -> slim LM carry
    slim_carry = True
    # Above this dim_h the dense on-device factorization is skipped
    # (dim_h^2 storage). 24576 covers BAL Ladybug-49's full system
    # (dim_h = 23,769 -> 2.26 GB f32 dense + the factor; measured to fit
    # one 16 GB v5e chip, ~100x scoped VMEM — the hybrid-memory analog,
    # cudss.hpp:112-127). The dense-index builder uses int32 flat
    # offsets, so the hard ceiling is dim_h <= 46,340.
    on_device_limit: int = 24576
    # None: on-device on TPU (host callbacks unavailable there), host
    # callback on CPU. True/False forces.
    on_device: object = None

    # None: nested-dissection multifrontal (ops/nd_multifrontal.py) when
    # dim_h exceeds the dense limit on a device backend (the TPU-native
    # analog of cuDSS's sparse factorization at any size,
    # cudss.hpp:53-269). True/False forces it on/off at any size.
    multifrontal: object = None

    def _on_device(self, problem) -> bool:
        if problem.dim_h > self.on_device_limit:
            return False
        if self.on_device is not None:
            return bool(self.on_device)
        return jax.default_backend() != "cpu"

    def _use_nd(self, problem) -> bool:
        import os

        if self.multifrontal is not None:
            return bool(self.multifrontal)
        if os.environ.get("GRAPHITE_TPU_ND"):
            return True
        return (problem.dim_h > self.on_device_limit
                and jax.default_backend() != "cpu")

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

        if self._use_nd(problem):
            from ..ops.nd_multifrontal import (
                build_nd_plan,
                nd_factor,
                nd_solve,
            )

            if "nd_plan" not in problem._cache:
                problem._cache["nd_plan"] = build_nd_plan(problem, hs)
            plan = problem._cache["nd_plan"]
            inv_dt = problem.precision.inv_dtype
            factors = nd_factor(problem, plan, hv, dtype=inv_dt)
            x = nd_solve(problem, plan, factors,
                         lin.b[: problem.dim_h])
            ok = jnp.all(jnp.isfinite(x))
            x = jnp.where(ok, x, 0.0).astype(gdt)
            out = jnp.zeros(problem.dim_x, dtype=gdt)
            out = out.at[: problem.dim_h].set(x)
            return out, ok

        if self._on_device(problem):
            from ..hessian import dense_hessian_matrix

            H = dense_hessian_matrix(problem, hs, hv)
            b = lin.b[: problem.dim_h].astype(H.dtype)
            if problem.dim_h >= 1024:
                from ..ops.blocked_cholesky import (
                    blocked_cho_solve,
                    blocked_cholesky,
                )

                L = blocked_cholesky(H)
                x = blocked_cho_solve(L, b)
            else:
                L, low = jax.scipy.linalg.cho_factor(H, lower=True)
                x = jax.scipy.linalg.cho_solve((L, low), b)
            ok = jnp.all(jnp.isfinite(x))
            x = jnp.where(ok, x, 0.0).astype(gdt)
            out = jnp.zeros(problem.dim_x, dtype=gdt)
            out = out.at[: problem.dim_h].set(x)
            return out, ok

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
