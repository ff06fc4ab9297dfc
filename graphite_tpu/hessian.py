"""Block-sparse Hessian container.

TPU-native analog of ``Hessian<T,S>`` / ``HessianBlocks`` / CSC utilities
(reference: include/graphite/hessian.hpp:15-324, csc_utils.hpp:16-193).

Structure discovery runs **once per topology** on the host in NumPy
(`build_hessian_structure`), mirroring the reference's GPU sort/unique of
block coordinates (hessian.hpp:48-85) and host offset maps (:270-278):

- upper-triangular blocks keyed by (block_row, block_col), stored CSC-sorted
  by (col, row) so the diagonal block is always last in its column — the
  invariant the reference's diagonal backup relies on (hessian.hpp:121-127);
- blocks are grouped by (row_dim, col_dim) so each group is one dense
  ``(n_blocks+1, dr, dc)`` array (the +1 is a trash block absorbing masked
  contributions — the static-shape analog of ``is_vertex_active`` guards);
- per (factor type, slot pair) scatter maps tell the jitted value update
  where each factor's ``J_s^T dL P J_t`` lands, with orientation handled by
  direct/transposed target maps (the reference's transposed-rectangular
  handling, ops/hessian.hpp:39-49).

Value recomputation (`compute_hessian_values`) is pure jit: batched einsums
on the MXU + deterministic segment_sums, replacing per-block atomicAdd
kernels (ops/hessian.hpp:9-78, factor.hpp:771-853).

LM damping (`apply_damping`) augments diagonal-block diagonals from the
pre-damping backup: ``d + mu`` or ``d + mu*clamp(d, 1e-6, 1e32)``
(hessian.hpp:136-176). The backup is ``lin.diag`` (the scaled-system
diagonal) — identical to the reference's backup_diagonal (:102-134).

Scalar CSC export (`build_hessian_structure` precomputes the scatter;
`csc_values` fills it) mirrors csc_utils.hpp:73-193 but exports the FULL
symmetric matrix, which is what host sparse direct solvers consume.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .linearize import DIAG_MIN, DIAG_MAX, Linearization
from .ops.segment import scatter_add_flat


@dataclasses.dataclass
class ContribMap:
    """Where one (factor type, slot s, slot t) pair's products go."""

    fname: str
    s: int
    t: int
    # group keys and per-factor block indices (trash = n_blocks of group)
    direct_group: Tuple[int, int]
    direct_idx: Optional[np.ndarray]  # (F,) int32 or None if all-trash
    trans_group: Tuple[int, int]
    trans_idx: Optional[np.ndarray]


@dataclasses.dataclass
class HessianStructure:
    """Static (host) description of the block-sparse Hessian."""

    # block bookkeeping, CSC order (sorted by (col, row))
    block_rows: np.ndarray  # (NB,) block-column ids
    block_cols: np.ndarray
    n_blocks: int
    # storage grouping
    group_keys: List[Tuple[int, int]]  # [(dr, dc)]
    group_of_block: np.ndarray  # (NB,) index into group_keys
    index_in_group: np.ndarray  # (NB,)
    group_sizes: Dict[Tuple[int, int], int]
    # contribution scatter maps
    contribs: List[ContribMap]
    # diagonal-block lookup: for block column j, (group, idx)
    diag_group: np.ndarray  # (n_block_cols,) group index (-1 if absent)
    diag_idx: np.ndarray
    # scalar CSC (full symmetric) export
    csc_indptr: np.ndarray  # (dim_h+1,)
    csc_indices: np.ndarray  # (nnz,)
    nnz: int
    # per group: flat scatter destinations for block entries (and their
    # transposes for off-diagonal blocks); trash entries -> nnz
    csc_dst: Dict[Tuple[int, int], np.ndarray]  # (n_g, dr, dc) int64
    csc_dst_t: Dict[Tuple[int, int], np.ndarray]  # transpose scatter


def _block_ids_for(problem, fname: str):
    """Per-factor block ids for each slot ((F,) arrays), -1 when inactive."""
    fm = problem.factor_meta[fname]
    ids = problem.host.factor_ids[fname]
    smask = problem.host.slot_mask[fname]
    out = []
    for s, vt in enumerate(fm.ftype.vertex_types):
        bid = problem.host.vertex_block_id[vt.name][ids[:, s]].copy()
        bid[~smask[:, s]] = -1
        out.append(bid)
    return out


def build_hessian_structure(problem) -> HessianStructure:
    if "hessian_structure" in problem._cache:
        return problem._cache["hessian_structure"]

    block_dims = problem.block_dims
    n_cols = problem.n_blocks

    # 1. Collect upper-triangular block coordinates from all factor
    # slot-pairs (hessian.hpp:48-85).
    coords = set()
    pair_sources = []  # (fname, s, t, bs (F,), bt (F,))
    for fname, fm in problem.factor_meta.items():
        bids = _block_ids_for(problem, fname)
        n = fm.ftype.arity
        for s in range(n):
            for t in range(s, n):
                bs, bt = bids[s], bids[t]
                valid = (bs >= 0) & (bt >= 0)
                lo = np.minimum(bs, bt)[valid]
                hi = np.maximum(bs, bt)[valid]
                coords.update(zip(lo.tolist(), hi.tolist()))
                pair_sources.append((fname, s, t, bs, bt))

    # CSC order: sort by (col, row); diagonal block last in each column.
    block_list = sorted(coords, key=lambda rc: (rc[1], rc[0]))
    block_rows = np.asarray([r for r, _ in block_list], dtype=np.int64)
    block_cols = np.asarray([c for _, c in block_list], dtype=np.int64)
    nb = len(block_list)
    block_index = {rc: i for i, rc in enumerate(block_list)}

    # 2. Group by (dr, dc).
    group_keys: List[Tuple[int, int]] = []
    group_map: Dict[Tuple[int, int], int] = {}
    group_of_block = np.zeros(nb, dtype=np.int64)
    index_in_group = np.zeros(nb, dtype=np.int64)
    group_counts: Dict[Tuple[int, int], int] = {}
    for i, (r, c) in enumerate(block_list):
        key = (int(block_dims[r]), int(block_dims[c]))
        if key not in group_map:
            group_map[key] = len(group_keys)
            group_keys.append(key)
            group_counts[key] = 0
        group_of_block[i] = group_map[key]
        index_in_group[i] = group_counts[key]
        group_counts[key] += 1

    # 3. Contribution maps: direct (bs<=bt) and transposed (bs>=bt, plus the
    # self-block transpose when bs==bt and s<t).
    contribs: List[ContribMap] = []
    for fname, s, t, bs, bt in pair_sources:
        fm = problem.factor_meta[fname]
        ds = fm.ftype.vertex_types[s].dim
        dt_ = fm.ftype.vertex_types[t].dim
        F = fm.count
        dkey, tkey = (ds, dt_), (dt_, ds)
        d_trash = group_counts.get(dkey, 0)
        t_trash = group_counts.get(tkey, 0)
        direct_idx = np.full(F, d_trash, dtype=np.int64)
        trans_idx = np.full(F, t_trash, dtype=np.int64)
        valid = (bs >= 0) & (bt >= 0)
        for f in np.nonzero(valid)[0]:
            r, c = int(bs[f]), int(bt[f])
            if r <= c:
                direct_idx[f] = index_in_group[block_index[(r, c)]]
            if r > c or (r == c and s < t):
                trans_idx[f] = index_in_group[block_index[(c, r)]]
        if not np.any(direct_idx != d_trash):
            direct_idx = None
        if not np.any(trans_idx != t_trash):
            trans_idx = None
        contribs.append(
            ContribMap(fname, s, t, dkey,
                       None if direct_idx is None else direct_idx.astype(np.int32),
                       tkey,
                       None if trans_idx is None else trans_idx.astype(np.int32))
        )

    # 4. Diagonal-block lookup per block column.
    diag_group = np.full(n_cols, -1, dtype=np.int64)
    diag_idx = np.zeros(n_cols, dtype=np.int64)
    for j in range(n_cols):
        bi = block_index.get((j, j))
        if bi is not None:
            diag_group[j] = group_of_block[bi]
            diag_idx[j] = index_in_group[bi]

    # 5. Scalar CSC (full symmetric) structure + per-group scatter maps
    # (csc_utils.hpp:73-193, extended to the full matrix).
    dim_h = problem.dim_h
    offsets = problem.block_offsets
    rows_all: List[np.ndarray] = []
    cols_all: List[np.ndarray] = []
    which_block: List[np.ndarray] = []
    transposed: List[np.ndarray] = []
    for i, (r, c) in enumerate(block_list):
        dr, dc = int(block_dims[r]), int(block_dims[c])
        rr = np.repeat(np.arange(dr), dc) + offsets[r]
        cc = np.tile(np.arange(dc), dr) + offsets[c]
        rows_all.append(rr)
        cols_all.append(cc)
        which_block.append(np.full(dr * dc, i))
        transposed.append(np.zeros(dr * dc, dtype=bool))
        if r != c:
            rows_all.append(cc)
            cols_all.append(rr)
            which_block.append(np.full(dr * dc, i))
            transposed.append(np.ones(dr * dc, dtype=bool))
    if rows_all:
        rows_cat = np.concatenate(rows_all)
        cols_cat = np.concatenate(cols_all)
        blk_cat = np.concatenate(which_block)
        tr_cat = np.concatenate(transposed)
    else:
        rows_cat = cols_cat = blk_cat = np.zeros(0, dtype=np.int64)
        tr_cat = np.zeros(0, dtype=bool)

    order = np.lexsort((rows_cat, cols_cat))  # CSC: by col, then row
    nnz = rows_cat.shape[0]
    csc_indices = rows_cat[order]
    counts = np.bincount(cols_cat, minlength=dim_h)
    csc_indptr = np.zeros(dim_h + 1, dtype=np.int64)
    np.cumsum(counts, out=csc_indptr[1:])
    # position of each (block entry, orientation) in the CSC values array
    pos_of = np.empty(nnz, dtype=np.int64)
    pos_of[order] = np.arange(nnz)

    csc_dst: Dict[Tuple[int, int], np.ndarray] = {}
    csc_dst_t: Dict[Tuple[int, int], np.ndarray] = {}
    for key in group_keys:
        dr, dc = key
        ng = group_counts[key]
        csc_dst[key] = np.full((ng + 1, dr, dc), nnz, dtype=np.int64)
        csc_dst_t[key] = np.full((ng + 1, dr, dc), nnz, dtype=np.int64)
    entry_cursor = 0
    for i, (r, c) in enumerate(block_list):
        dr, dc = int(block_dims[r]), int(block_dims[c])
        key = (dr, dc)
        k = index_in_group[i]
        n_entries = dr * dc
        csc_dst[key][k] = pos_of[entry_cursor:entry_cursor + n_entries].reshape(
            dr, dc
        )
        entry_cursor += n_entries
        if r != c:
            csc_dst_t[key][k] = pos_of[
                entry_cursor:entry_cursor + n_entries
            ].reshape(dr, dc)
            entry_cursor += n_entries

    hs = HessianStructure(
        block_rows=block_rows,
        block_cols=block_cols,
        n_blocks=nb,
        group_keys=group_keys,
        group_of_block=group_of_block,
        index_in_group=index_in_group,
        group_sizes=group_counts,
        contribs=contribs,
        diag_group=diag_group,
        diag_idx=diag_idx,
        csc_indptr=csc_indptr,
        csc_indices=csc_indices,
        nnz=nnz,
        csc_dst=csc_dst,
        csc_dst_t=csc_dst_t,
    )
    problem._cache["hessian_structure"] = hs
    return hs


# --------------------------------------------------------------------------
# Value computation (jit)
# --------------------------------------------------------------------------

HessianValues = Dict[Tuple[int, int], jax.Array]  # group -> (n_g+1, dr, dc)


def compute_hessian_values(problem, hs: HessianStructure,
                           lin: Linearization) -> HessianValues:
    """H = J^T dL P J into grouped block storage (hessian.hpp:210-220,
    factor.hpp:771-853). Jacobians are already scaled & masked."""
    acc = problem.precision.acc_dtype
    inv_dt = problem.precision.inv_dtype
    values: HessianValues = {
        key: jnp.zeros((hs.group_sizes[key] + 1, key[0], key[1]), dtype=inv_dt)
        for key in hs.group_keys
    }
    # cache P J_t per (fname, t)
    pj_cache: Dict[Tuple[str, int], jax.Array] = {}

    def pj(fname, t):
        k = (fname, t)
        if k not in pj_cache:
            fa = problem.data.factors[fname]
            Jt = lin.jacobians[fname][t].astype(acc)
            pj_cache[k] = (
                Jt
                if fa.precision is None
                else jnp.einsum(
                    "fij,fjc->fic", fa.precision.astype(acc), Jt,
                    preferred_element_type=acc,
                )
            )
        return pj_cache[k]

    for cm in hs.contribs:
        if cm.direct_idx is None and cm.trans_idx is None:
            continue
        fa = problem.data.factors[cm.fname]
        J = lin.jacobians[cm.fname]
        if J is None:
            raise ValueError(
                f"explicit Hessian requires stored Jacobians "
                f"('{cm.fname}' is dynamic)"
            )
        dL = lin.chi2_deriv[cm.fname].astype(acc)
        Js = J[cm.s].astype(acc)
        blk = jnp.einsum(
            "fer,fec->frc", Js, pj(cm.fname, cm.t), preferred_element_type=acc
        ) * dL[:, None, None]
        n_local = blk.shape[0]
        if cm.direct_idx is not None:
            idx = problem.shard_slice(jnp.asarray(cm.direct_idx), n_local)
            values[cm.direct_group] = values[cm.direct_group] + jax.ops.segment_sum(
                blk.astype(inv_dt), idx,
                num_segments=hs.group_sizes[cm.direct_group] + 1,
            )
        if cm.trans_idx is not None:
            idx = problem.shard_slice(jnp.asarray(cm.trans_idx), n_local)
            values[cm.trans_group] = values[cm.trans_group] + jax.ops.segment_sum(
                jnp.swapaxes(blk, -1, -2).astype(inv_dt), idx,
                num_segments=hs.group_sizes[cm.trans_group] + 1,
            )
    return {k: problem.allreduce(v) for k, v in values.items()}


def apply_damping(problem, hs: HessianStructure, values: HessianValues,
                  diag_backup: jax.Array, damping, use_identity: bool
                  ) -> HessianValues:
    """Damped copy of the block values (hessian.hpp:136-176).

    ``diag_backup`` is the pre-damping scaled diagonal — ``lin.diag``.
    """
    out = dict(values)
    offsets = problem.block_offsets
    dims = problem.block_dims
    # group diag columns by dimension for batched updates
    for gi, key in enumerate(hs.group_keys):
        dr, dc = key
        if dr != dc:
            continue
        cols = np.nonzero(
            (hs.diag_group == gi)
        )[0]
        if cols.size == 0:
            continue
        idxs = jnp.asarray(hs.diag_idx[cols], dtype=jnp.int32)
        col_off = jnp.asarray(offsets[cols], dtype=jnp.int32)
        gather_cols = col_off[:, None] + jnp.arange(dr)[None, :]
        d0 = diag_backup[gather_cols].astype(values[key].dtype)  # (K, d)
        if use_identity:
            dnew = d0 + damping
        else:
            dnew = d0 + damping * jnp.clip(d0, DIAG_MIN, DIAG_MAX)
        blocks = values[key][idxs]
        # overwrite diagonal entries with the damped backup values
        old_diag_mat = jax.vmap(jnp.diag)(
            jnp.diagonal(blocks, axis1=-2, axis2=-1)
        )
        blocks = blocks - old_diag_mat + jax.vmap(jnp.diag)(dnew)
        out[key] = out[key].at[idxs].set(blocks)
    return out


def csc_values(problem, hs: HessianStructure, values: HessianValues) -> jax.Array:
    """Scatter block values into the full-symmetric scalar CSC value array
    (csc_utils.hpp:149-193)."""
    acc = problem.precision.inv_dtype
    out = jnp.zeros(hs.nnz + 1, dtype=acc)
    for key in hs.group_keys:
        v = values[key].astype(acc)
        # csc_dst_t[k][i, j] is the CSC position of the transposed copy's
        # (j, i) entry, i.e. where original entry (i, j) lands — so both
        # scatters consume the block in its original entry order.
        out = out.at[jnp.asarray(hs.csc_dst[key]).reshape(-1)].add(
            v.reshape(-1)
        )
        out = out.at[jnp.asarray(hs.csc_dst_t[key]).reshape(-1)].add(
            v.reshape(-1)
        )
    return out[: hs.nnz]


def hessian_to_dense(problem, hs: HessianStructure,
                     values: HessianValues) -> np.ndarray:
    """Dense reconstruction for tests/oracles."""
    n = problem.dim_h
    H = np.zeros((n, n))
    offsets = problem.block_offsets
    dims = problem.block_dims
    for i in range(hs.n_blocks):
        r, c = int(hs.block_rows[i]), int(hs.block_cols[i])
        key = hs.group_keys[hs.group_of_block[i]]
        blk = np.asarray(values[key][hs.index_in_group[i]], dtype=np.float64)
        r0, c0 = int(offsets[r]), int(offsets[c])
        H[r0:r0 + key[0], c0:c0 + key[1]] += blk
        if r != c:
            H[c0:c0 + key[1], r0:r0 + key[0]] += blk.T
    return H
