"""Whole-PCG MATRIX-FREE Pallas kernel for the pose-graph regime.

The generic ``PCGSolver`` path runs each of the ~50 inner CG iterations
as ~20 XLA ops (two row gathers, two block products, two segment_sums,
a block-Jacobi apply, vector updates) — at sphere2500 scale every one of
those ops is a few microseconds of work behind a fixed per-op overhead,
so the solve is launch/overhead-bound, not compute-bound. This kernel
runs the ENTIRE preconditioned-CG loop in one Pallas program with
everything VMEM-resident:

- the (scaled, masked, loss/precision-FOLDED) Jacobian blocks of every
  factor block: H p = J'^T (J' p) + damp * p with
  J' = sqrt(max(dL, 0)) * chol(P)^T * J, folded once per solve in XLA
  (dL >= 0 for valid robust losses; P symmetric positive definite);
- the state vectors x/r/p/z as slot-PACKED row tables (segmv.slot_geom
  — 16 SE3 rows per 128-lane row), so gathers/scatters run as full-lane
  one-hot MXU products and the CG vector algebra is dense VPU work;
- the block-Jacobi preconditioner as 2d-1 DIAGONAL-SHIFT planes:
  z[., s*dw+i] = sum_j Minv[i, j] y[., s*dw+j] becomes
  sum_delta plane_delta * (y @ Shift_delta) — eleven tiny exact one-hot
  lane-shift dots for SE3, no gather at all (rows stay aligned).

Loop semantics mirror ``ops.pcg_loop.run_pcg`` exactly (normalization
before preconditioning, divergence rejection with state restore,
running-minimum rz_0, tol/rz==0 termination) — fixed trip count with a
``done`` mask, like ops/pallas/pcg_dense.py.

Feasible when the problem has ONE vertex type, every factor block has
materialized Jacobians with arity*E*d <= 128 lanes, the row table fits
the in-kernel gather limit, and the folded J fits VMEM
(`J_BYTES_LIMIT`). Pose graphs (sphere2500: 2500 SE3 poses, ~9800
edges, J = 5 MB) are the target; larger-than-VMEM J falls back to the
XLA path.

Reference parity: solver/pcg.hpp:61-232 (the PCG loop and its implicit
J^T dL P (J p) product, ops/product.hpp:49-288) — restated as one
resident kernel instead of a stream of CUDA kernel launches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .segmv import (
    TB,
    TABLE_ROWS_LIMIT,
    _expand_mv,
    _slot_mask,
    exact_dot,
    pack_chunk_ids,
    pack_rows,
    parts_dot,
    slot_geom,
    tpad,
    value_parts,
)

# folded-J VMEM budget: beyond this the J blocks cannot stay resident
J_BYTES_LIMIT = 6 << 20
CF = 2048  # factor chunk


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_v(idx_row, ptab, npk: int, chunk: int, dw: int, nslot: int,
              tb: int = TB):
    """packed_gather against a VALUE table (static slices)."""
    prow = idx_row // jnp.int32(nslot)
    acc = None
    for t0 in range(0, npk, tb):
        nrow = min(tb, npk - t0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, chunk), 0) + t0
        oh = (rows == prow).astype(jnp.bfloat16)
        part = exact_dot(oh, ptab[t0:t0 + nrow, :],
                         (((0,), (0,)), ((), ())), onehot_left=True)
        acc = part if acc is None else acc + part
    sel = acc * _slot_mask(idx_row, dw, nslot, chunk)
    f_l = jax.lax.broadcasted_iota(jnp.int32, (128, dw), 0)
    f_j = jax.lax.broadcasted_iota(jnp.int32, (128, dw), 1)
    F = (f_l % dw == f_j).astype(jnp.bfloat16)
    return exact_dot(F, sel, (((1,), (0,)), ((), ())), onehot_left=False)


def _scatter_v(prod, dst_row, npk: int, chunk: int, d: int, dw: int,
               nslot: int, tb: int = TB):
    """packed_scatter returning the (npk, 128) accumulation as a VALUE."""
    t_j = jax.lax.broadcasted_iota(jnp.int32, (d, 128), 0)
    t_l = jax.lax.broadcasted_iota(jnp.int32, (d, 128), 1)
    T2 = (t_l % dw == t_j).astype(jnp.bfloat16)
    prod_t = exact_dot(T2, prod, (((1,), (0,)), ((), ())),
                       onehot_left=False)
    pexp = prod_t * _slot_mask(dst_row, dw, nslot, chunk)
    pparts = value_parts(pexp)
    prow = dst_row // jnp.int32(nslot)
    outs = []
    for t0 in range(0, npk, tb):
        nrow = min(tb, npk - t0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, chunk), 0) + t0
        oh = (rows == prow).astype(jnp.bfloat16)
        outs.append(parts_dot(pparts, oh, (((1,), (0,)), ((), ())),
                              onehot_left=True))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _shift_mat(delta: int, dw: int):
    """(128, 128) 0/1 lane shift WITHIN slots: y @ S moves lane
    s*dw + (i - delta) -> s*dw + i."""
    src = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return ((dst == src + delta)
            & (src // dw == dst // dw)).astype(jnp.bfloat16)


def _kernel(b_ref, damp_ref, mask_ref, msh_ref, *rest, npk, d, dw, nslot,
            blocks, max_iter, tol, rejection_ratio, use_mshift):
    x_ref = rest[-1]
    fb_refs = rest[:-1]
    f32 = jnp.float32
    b = b_ref[:].astype(f32)
    damp = damp_ref[:].astype(f32)
    mask = mask_ref[:].astype(f32)

    def vdot(u, v):
        return jnp.sum(u * v)

    def precondition(r):
        rnorm = jnp.sqrt(vdot(r, r))
        y = r / jnp.where(rnorm == 0, 1.0, rnorm)
        if not use_mshift:
            return y
        z = jnp.zeros_like(y)
        for di, delta in enumerate(range(-(d - 1), d)):
            plane = msh_ref[pl.ds(di * npk, npk), :].astype(f32)
            z = z + plane * exact_dot(_shift_mat(delta, dw), y,
                                      (((1,), (0,)), ((), ())),
                                      onehot_left=False)
        return z * mask

    def matvec(p):
        hp = damp * p
        for bi, (E, arity, n_chunks, cf) in enumerate(blocks):
            j_ref = fb_refs[2 * bi]
            ids_ref = fb_refs[2 * bi + 1]
            ed = E * d
            for ci in range(n_chunks):
                jc = j_ref[pl.ds(ci * cf, cf), :]
                lw = jc.shape[1]
                v = None
                xs_rows = []
                for s in range(arity):
                    idx = ids_ref[pl.ds(s * _round_up(n_chunks, 8) + ci,
                                        1), :]
                    xs_rows.append(idx)
                    xg = _gather_v(idx, p, npk, cf, dw, nslot)
                    # slot s occupies lanes [s*ed, (s+1)*ed) of the flat
                    # row; the window rides the expansion one-hots (off=)
                    vs = _expand_mv(jc, xg, E, d, lw, dw,
                                    transpose=False, off=s * ed)
                    v = vs if v is None else v + vs
                for s in range(arity):
                    g = _expand_mv(jc, v, E, d, lw, E,
                                   transpose=True, off=s * ed)
                    hp = hp + _scatter_v(g, xs_rows[s], npk, cf, d, dw,
                                         nslot)
        return hp * mask

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precondition(r0)
    p0 = z0
    rz0 = vdot(r0, z0)

    def body(k, c):
        x, r, p, z, rz, rz_min, done = c
        active = jnp.logical_not(done) & (rz != 0)
        v2 = matvec(p)
        alpha = rz / vdot(p, v2)
        x_new = x + alpha * p
        r_new = r - alpha * v2
        z_new = precondition(r_new)
        rz_new = vdot(r_new, z_new)
        reject = ((jnp.abs(rz_new) > rejection_ratio * rz_min)
                  | jnp.isnan(rz_new))
        keep = jnp.logical_not(active) | reject
        rz_min_new = jnp.where(active,
                               jnp.minimum(rz_min, jnp.abs(rz_new)),
                               rz_min)
        beta = rz_new / rz
        p_new = z_new + beta * p
        converged = jnp.abs(rz_new) < tol
        pick = lambda old, new: jnp.where(keep, old, new)  # noqa: E731
        return (pick(x, x_new), pick(r, r_new), pick(p, p_new),
                pick(z, z_new), pick(rz, rz_new), rz_min_new,
                done | (active & (reject | converged)))

    init = (x0, r0, p0, z0, rz0, jnp.asarray(jnp.inf, f32),
            jnp.asarray(False))
    x, *_ = jax.lax.fori_loop(0, max_iter, body, init)
    x_ref[:] = x


@functools.partial(
    jax.jit, static_argnames=("npk", "d", "dw", "nslot", "blocks",
                              "max_iter", "tol", "rejection_ratio",
                              "use_mshift"))
def _run(b_tab, damp_tab, mask_tab, msh, fb_arrays, *, npk, d, dw, nslot,
         blocks, max_iter, tol, rejection_ratio, use_mshift):
    n_msh = (2 * d - 1) if use_mshift else 1
    in_specs = [
        pl.BlockSpec((npk, 128), lambda i: (0, 0)),
        pl.BlockSpec((npk, 128), lambda i: (0, 0)),
        pl.BlockSpec((npk, 128), lambda i: (0, 0)),
        pl.BlockSpec((n_msh * npk, 128), lambda i: (0, 0)),
    ]
    for (E, arity, n_chunks, cf), (j_pad, ids) in zip(blocks, fb_arrays):
        in_specs.append(pl.BlockSpec(j_pad.shape, lambda i: (0, 0)))
        in_specs.append(pl.BlockSpec(ids.shape, lambda i: (0, 0)))
    flat = [a for pair in fb_arrays for a in pair]
    out = pl.pallas_call(
        functools.partial(_kernel, npk=npk, d=d, dw=dw, nslot=nslot,
                          blocks=blocks, max_iter=max_iter, tol=tol,
                          rejection_ratio=rejection_ratio,
                          use_mshift=use_mshift),
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((npk, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((npk, 128), jnp.float32),
    )(b_tab, damp_tab, mask_tab, msh, *flat)
    return out


def plan_pcg_mf(problem, lin) -> dict | None:
    """Feasibility + host-side id packing (cached on the problem)."""
    import os

    if os.environ.get("GRAPHITE_TPU_NO_PCG_MF"):
        return None
    cache = problem._cache.setdefault("pcg_mf_site", {})
    if "site" in cache:
        return cache["site"]
    site = None
    vnames = [n for n, vm in problem.vertex_meta.items() if vm.count]
    if len(vnames) == 1:
        vt_name = vnames[0]
        d = problem.vertex_meta[vt_name].vtype.dim
        dw, nslot = slot_geom(d)
        n = problem.seg_rows[vt_name]
        t_rows = tpad(n + 1)
        j_bytes = 0
        blocks = []
        ok = t_rows <= TABLE_ROWS_LIMIT and d <= dw
        for fname, fm in problem.factor_meta.items():
            E = fm.ftype.residual_dim
            arity = fm.ftype.arity
            if (lin.jacobians.get(fname) is None or arity * E * d > 128
                    or any(vt.name != vt_name
                           for vt in fm.ftype.vertex_types)):
                ok = False
                break
            from ...linearize import _host_factor_rows

            F = problem.data.factors[fname].factor_mask.shape[0]
            cf = min(CF, max(_round_up(F, 512), 512))
            f_pad = _round_up(F, cf)
            n_chunks = f_pad // cf
            j_bytes += f_pad * 128 * 4
            ids = np.stack([
                pack_chunk_ids(
                    _host_factor_rows(problem, fname, s, vt_name),
                    f_pad, cf, fill=n)
                for s in range(arity)
            ]).reshape(arity * _round_up(n_chunks, 8), cf)
            blocks.append(dict(fname=fname, E=E, arity=arity,
                               n_chunks=n_chunks, cf=cf, f_pad=f_pad,
                               ids=ids))
        if ok and j_bytes <= J_BYTES_LIMIT and blocks:
            site = dict(vt_name=vt_name, d=d, dw=dw, nslot=nslot,
                        n=n, t_rows=t_rows, npk=t_rows // nslot,
                        blocks=blocks)
    cache["site"] = site
    return site


def solve_pcg_mf(problem, lin, site, damp_vec, inv_blocks_rows,
                 max_iter: int, tol: float,
                 rejection_ratio: float) -> jax.Array:
    """Fold J, pack the tables, run the kernel; returns (dim_x,) x.

    ``inv_blocks_rows``: (n_rows, d*d) row-ordered block-Jacobi inverse
    blocks, or None for the identity preconditioner.
    """
    from ..blockfmt import unflatten_blocks

    d, dw, nslot = site["d"], site["dw"], site["nslot"]
    n, t_rows, npk = site["n"], site["t_rows"], site["npk"]
    vt_name = site["vt_name"]
    f32 = jnp.float32

    def pack_vec(rows, width=dw):
        tab = jnp.zeros((t_rows, width), f32)
        tab = jax.lax.dynamic_update_slice(tab, rows.astype(f32), (0, 0))
        return pack_rows(tab, 128 // width)

    b_tab = pack_vec(problem.rows_view(lin.b, vt_name))
    damp_tab = pack_vec(problem.rows_view(damp_vec, vt_name))
    mask_rows = jnp.ones((n, d), f32)
    mask_tab = pack_vec(mask_rows)

    use_mshift = inv_blocks_rows is not None
    if use_mshift:
        inv3 = unflatten_blocks(inv_blocks_rows.astype(f32), d, d)
        planes = []
        for delta in range(-(d - 1), d):
            cols = np.arange(d) - delta
            valid = (cols >= 0) & (cols < d)
            plane = jnp.where(
                jnp.asarray(valid)[None, :],
                inv3[:, np.arange(d), np.clip(cols, 0, d - 1)], 0.0)
            planes.append(pack_vec(plane))
        msh = jnp.concatenate(planes, axis=0)
    else:
        msh = jnp.zeros((npk, 128), f32)

    fb_arrays = []
    blocks_static = []
    for blk in site["blocks"]:
        fname, E, arity = blk["fname"], blk["E"], blk["arity"]
        cf, f_pad, n_chunks = blk["cf"], blk["f_pad"], blk["n_chunks"]
        fa = problem.data.factors[fname]
        J = lin.jacobians[fname]
        dl = jnp.sqrt(jnp.maximum(
            lin.chi2_deriv[fname].astype(f32), 0.0))
        if fa.precision is not None:
            P = unflatten_blocks(fa.precision.astype(f32), E, E)
            C = jnp.linalg.cholesky(P)
        else:
            C = None
        parts = []
        for s in range(arity):
            J3 = unflatten_blocks(J[s].astype(f32), E, d)
            if C is not None:
                J3 = jnp.einsum("fji,fjd->fid", C, J3,
                                preferred_element_type=f32)
            J3 = J3 * dl[:, None, None]
            parts.append(J3.reshape(J3.shape[0], E * d))
        j_flat = jnp.concatenate(parts, axis=1)  # (F, arity*E*d)
        j_pad = jnp.zeros((f_pad, 128), f32)
        j_pad = jax.lax.dynamic_update_slice(j_pad, j_flat, (0, 0))
        ids = problem.const(("pcg_mf_ids", fname), blk["ids"])
        fb_arrays.append((j_pad, ids))
        blocks_static.append((E, arity, n_chunks, cf))

    out = _run(b_tab, damp_tab, mask_tab, msh, tuple(fb_arrays),
               npk=npk, d=d, dw=dw, nslot=nslot,
               blocks=tuple(blocks_static), max_iter=max_iter,
               tol=float(tol), rejection_ratio=float(rejection_ratio),
               use_mshift=use_mshift)
    rows = out.reshape(-1, dw)[:n, :d]
    gdt = problem.precision.graph_dtype
    return problem.flat_from_rows({vt_name: rows.astype(gdt)}, dtype=gdt)
