"""Marginal / joint covariance recovery at the current linearization point.

Beyond-reference extension: the reference framework stops at MAP point
estimates (its optimizers return only the solution and chi2 history,
optimizer/levenberg_marquardt.hpp:120-199); uncertainty quantification is
the standard companion capability in factor-graph frameworks, and it falls
out naturally of the machinery built here — selected columns of the inverse
Gauss-Newton Hessian ``H = J^T dL P J`` recovered through the same dense /
Schur elimination paths the direct solvers use (solver/cudss_schur.hpp
analog: factorize the pose system once, back-substitute per column).

Semantics
---------
- The returned covariance is the inverse of the (robust-reweighted)
  Gauss-Newton Hessian at the linearization point in ORIGINAL parameter
  units: the solvers all work on the Jacobi-scaled system (the reference
  scales columns by 1/(eps+sqrt(diag)), graph.hpp:254-281), so selected
  inverse entries are unscaled by ``lin.scales`` on the way out.
- ``damping=0`` (the default) is the statistically meaningful covariance;
  it requires the problem to be gauge-fixed (fixed vertices or priors).
  ``damping>0`` returns the Tikhonov-regularized inverse — the practical
  fallback for gauge-deficient problems (same diagonal augmentation as the
  LM step, hessian.hpp:136-176).
- For manifold-valued vertices the covariance lives in the tangent space at
  the current estimate (the columns of H are tangent coordinates).

Paths
-----
- ``method="dense"``: densify H (O(dim_h^2) memory), one Cholesky, solve the
  requested unit columns. Exact; for small/medium graphs; any structure.
- ``method="schur"``: eliminate the landmark block exactly as the Schur
  solvers do — dense pose-system Cholesky + per-column back-substitution
  through ``SchurOps`` (b_schur / landmark_update / compose_delta). Costs
  O(dim_p^2) memory regardless of landmark count, so it scales to BA-sized
  problems; requires an eliminated vertex type.
- ``method="auto"``: schur when the problem has an eliminated type, else
  dense.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .linearize import Linearization

Target = Tuple[str, int]  # (vertex type name, global id)


def _target_columns(problem, targets: Sequence[Target]):
    """Resolve (vname, gid) targets to scaled-Hessian column indices.

    Returns (cols, spans): ``cols`` is the concatenated column list,
    ``spans[i] = (start, dim)`` locates target i inside it.
    """
    cols: List[int] = []
    spans: List[Tuple[int, int]] = []
    for vname, gid in targets:
        if vname not in problem.vertex_meta:
            raise KeyError(f"unknown vertex type {vname!r}")
        local = problem.host_local_index(vname, gid)
        c0 = int(problem.host.vertex_col_offset[vname][local])
        # fixed/inactive vertices point at the trash pad region past dim_h
        # (masking-not-compaction layout); they carry no Hessian columns
        if c0 < 0 or c0 >= problem.dim_h:
            raise ValueError(
                f"vertex ({vname!r}, {gid}) has no Hessian columns — it is "
                "fixed or inactive; its covariance is zero by definition")
        d = problem.vertex_meta[vname].vtype.dim
        spans.append((len(cols), d))
        cols.extend(range(c0, c0 + d))
    return np.asarray(cols, dtype=np.int64), spans


def _unit_columns(dim: int, cols: np.ndarray, dtype) -> jax.Array:
    """(k, dim) batch of unit vectors e_{cols[j]}."""
    k = cols.shape[0]
    return (jnp.zeros((k, dim), dtype=dtype)
            .at[jnp.arange(k), jnp.asarray(cols)].set(1))


def _dense_selected_inverse(problem, lin: Linearization,
                            cols: np.ndarray, damping: float,
                            use_identity: bool) -> jax.Array:
    """(k, k) = H_scaled^{-1}[cols, cols] via one dense Cholesky."""
    from .solvers.dense_cholesky import assemble_dense_hessian, damp_hessian

    def run(lin_):
        H = assemble_dense_hessian(problem, lin_)
        if damping:
            H = damp_hessian(H, jnp.asarray(damping, H.dtype), use_identity)
        E = _unit_columns(problem.dim_h, cols, H.dtype)  # (k, dim_h)
        L = jax.scipy.linalg.cho_factor(H, lower=True)
        X = jax.scipy.linalg.cho_solve(L, E.T)  # (dim_h, k)
        return X[jnp.asarray(cols), :]  # (k, k)

    return problem.jit_with_consts(run)(lin)


def _schur_selected_inverse(problem, lin: Linearization,
                            cols: np.ndarray, damping: float,
                            use_identity: bool) -> jax.Array:
    """(k, k) = H_scaled^{-1}[cols, cols] via Schur elimination.

    Solves H x = e per requested column with the same block elimination the
    Schur direct solvers use (solver/cudss_schur.hpp:13-235 analog):
    x_p = S^{-1}(e_p - Hpl Hll^{-1} e_l), x_l = Hll^{-1}(e_l - Hpl^T x_p).
    """
    from .hessian import (apply_damping, build_hessian_structure,
                          compute_hessian_values)
    from .schur import SchurOps, build_schur_structure, schur_values
    from .solvers.dense_cholesky_schur import schur_to_dense

    hs = build_hessian_structure(problem)
    ss = build_schur_structure(problem)

    def run(lin_):
        hv = compute_hessian_values(problem, hs, lin_)
        if damping:
            hv = apply_damping(problem, hs, hv, lin_.diag,
                               jnp.asarray(damping), use_identity)
        sv = schur_values(problem, ss, hv)
        ops = SchurOps(problem, ss, hv, sv)
        S = schur_to_dense(problem, ss, sv)
        L = jax.scipy.linalg.cho_factor(S, lower=True)
        gdt = problem.precision.graph_dtype

        def col(e):  # e: (dim_x,) unit vector -> (dim_x,) H^{-1} e
            b_s = ops.b_schur(e)
            x_p = jax.scipy.linalg.cho_solve(
                L, b_s.astype(S.dtype)).astype(gdt)
            x_l_rows = ops.landmark_update(e, x_p)
            return ops.compose_delta(x_p, x_l_rows)

        E = _unit_columns(problem.dim_x, cols, gdt)  # (k, dim_x)
        X = jax.vmap(col)(E)  # (k, dim_x)
        return X[:, jnp.asarray(cols)].T  # (k, k), [i, j] = (H^-1)_{ci, cj}

    return problem.jit_with_consts(run)(lin)


def _resolve_method(problem, method: str) -> str:
    if method not in ("auto", "dense", "schur"):
        raise ValueError(f"unknown method {method!r}")
    has_elim = problem.elimination_block < problem.n_blocks
    if method == "schur" and not has_elim:
        raise ValueError(
            "method='schur' requires an eliminated vertex type "
            "(VertexSet.set_eliminate)")
    if method == "auto":
        return "schur" if has_elim else "dense"
    return method


def joint_covariance(problem, lin: Linearization,
                     targets: Sequence[Target], *,
                     method: str = "auto", damping: float = 0.0,
                     use_identity: bool = False) -> jax.Array:
    """Joint covariance over the requested vertices.

    Returns the (D, D) block of ``H^{-1}`` (original units) spanning the
    targets' tangent coordinates in the order given, D = sum of vertex
    dims. Marginals are its diagonal blocks; off-diagonal blocks are the
    cross-covariances.
    """
    if not targets:
        raise ValueError("no targets given")
    cols, _ = _target_columns(problem, targets)
    fn = (_dense_selected_inverse if _resolve_method(problem, method)
          == "dense" else _schur_selected_inverse)
    sub = fn(problem, lin, cols, float(damping), use_identity)
    # unscale: H_unscaled^{-1} = S H_scaled^{-1} S with S = diag(lin.scales)
    s = lin.scales[jnp.asarray(cols)].astype(sub.dtype)
    sub = sub * s[:, None] * s[None, :]
    return 0.5 * (sub + sub.T)  # exact-symmetry cleanup


def marginal_covariances(problem, lin: Linearization,
                         targets: Sequence[Target], *,
                         method: str = "auto", damping: float = 0.0,
                         use_identity: bool = False
                         ) -> Dict[Target, jax.Array]:
    """Per-vertex (d, d) marginal covariance blocks (original units).

    One batched selected-inverse solve over all targets' columns; see the
    module docstring for semantics and method selection.
    """
    joint = joint_covariance(problem, lin, targets, method=method,
                             damping=damping, use_identity=use_identity)
    _, spans = _target_columns(problem, targets)
    return {
        t: jax.lax.dynamic_slice(joint, (s, s), (d, d))
        for t, (s, d) in zip(targets, spans)
    }
