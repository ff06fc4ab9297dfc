"""Schur complement: explicit S = Hpp - Hpl Hll^{-1} Hpl^T.

TPU-native analog of ``SchurComplement<T,S>`` (reference:
include/graphite/schur.hpp:87-1115 + ops/schur.hpp:21-282).

Structure discovery (host NumPy, once per topology):
- pose blocks = Hessian block columns < ``elimination_block``; landmark
  blocks = the trailing eliminated columns (graph.hpp:109-149);
- Schur fill-in: for every landmark, every ordered pair of pose blocks it
  touches (the reference's per-landmark pair discovery kernels,
  schur.hpp:397-476) unioned with the Hpp sparsity (Hpp copy ops,
  :616-647);
- triple-product work list ``dst -= left * mid * right^T`` grouped by
  (dp_a, dl, dp_b) dims — exactly the reference's ``ProductDim``-grouped
  ``MulOp`` lists (:484-585) — here executed as ONE gather + batched
  einsum + segment_sum per group (MXU-friendly) instead of per-dim CUDA
  kernels (ops/schur.hpp:117-188);
- Hll diagonal inversion grouped by block dim (cuBLAS matinvBatched with
  dim<=32, :1000-1114) becomes batched closed-form/Cholesky SPD inverses
  with no dim limit.

Runtime values (`schur_values`) consume *damped* Hessian block values, so
Schur-level damping is a no-op (block_jacobi_schur.hpp:153-155). Unlike the
reference, which requires T==S and no low-precision for the Schur path
(schur.hpp:109-113), the computation here always runs in ``InvP`` precision
regardless of the Jacobian storage dtype.

Also provided: ``b_schur = b_p - Hpl Hll^{-1} b_l`` (:886-920), the S
block matvec for PCG (:307-393), and landmark back-substitution
``dx_l = Hll^{-1} (b_l - Hpl^T dx_p)`` (:279-302).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hessian import HessianStructure, HessianValues, build_hessian_structure
from .ops.batched_linalg import spd_inverse
from .ops.blockfmt import flatten_blocks, unflatten_blocks
from .ops.segment import scatter_add_flat


@dataclasses.dataclass
class SchurStructure:
    """Static (host) description of the Schur system."""

    dim_p: int  # pose columns
    n_pose_blocks: int
    pose_offsets: np.ndarray  # (n_pose_blocks+1,) column offsets
    pose_dims: np.ndarray

    # landmark diagonal blocks, grouped by dim
    lm_dims: List[int]
    lm_h_idx: Dict[int, np.ndarray]  # dim -> indices into H group (d,d)
    lm_col_offset: Dict[int, np.ndarray]  # dim -> column offset (into dim_h)
    lm_group_index: np.ndarray  # per absolute landmark block id -> idx in its dim group
    lm_dim_of: np.ndarray  # per absolute landmark block id -> dim

    # Hpl blocks grouped by (dp, dl)
    hpl_keys: List[Tuple[int, int]]
    hpl_h_idx: Dict[Tuple[int, int], np.ndarray]  # idx into H group (dp,dl)
    hpl_pose: Dict[Tuple[int, int], np.ndarray]  # pose block id
    hpl_lm: Dict[Tuple[int, int], np.ndarray]  # absolute landmark block id

    # S blocks (upper-tri, CSC sorted), grouped by (dr, dc)
    s_keys: List[Tuple[int, int]]
    s_sizes: Dict[Tuple[int, int], int]
    s_rows: Dict[Tuple[int, int], np.ndarray]  # pose block ids
    s_cols: Dict[Tuple[int, int], np.ndarray]
    # Hpp copy: per (H group key) -> (h_idx, s_key, s_idx)
    hpp_copy: List[Tuple[Tuple[int, int], np.ndarray, np.ndarray]]
    # triple products grouped by (dpa, dl, dpb):
    # arrays (left hpl key+idx, mid dim group idx, right hpl key+idx, dst s key+idx, flip)
    products: List[dict]
    # S diagonal blocks per pose block: (s_key index, idx) for preconditioner
    s_diag_key: np.ndarray  # (n_pose_blocks,) index into s_keys
    s_diag_idx: np.ndarray
    # block -> (vertex type, row-in-type-segment) for row-shaped IO
    block_type: List[str]  # (n_blocks_total,)
    block_row: np.ndarray  # (n_blocks_total,)


def build_schur_structure(problem) -> SchurStructure:
    if "schur_structure" in problem._cache:
        return problem._cache["schur_structure"]
    hs = build_hessian_structure(problem)
    eb = problem.elimination_block
    nb_total = problem.n_blocks
    if eb >= nb_total:
        raise ValueError(
            "no eliminated vertices: call set_eliminate(True) on the "
            "landmark vertex set before freeze (vertex.hpp:293)"
        )
    dims = problem.block_dims
    offsets = problem.block_offsets
    dim_p = problem.elimination_col
    n_pose = eb
    n_lm = nb_total - eb

    # --- landmark diagonal blocks by dim ---
    lm_h_idx: Dict[int, List[int]] = {}
    lm_col_offset: Dict[int, List[int]] = {}
    lm_group_index = np.zeros(n_lm, dtype=np.int64)
    lm_dim_of = np.zeros(n_lm, dtype=np.int64)
    for l in range(n_lm):
        j = eb + l
        d = int(dims[j])
        gi = hs.diag_group[j]
        assert gi >= 0, "landmark without a diagonal block"
        lm_h_idx.setdefault(d, []).append(int(hs.diag_idx[j]))
        lm_col_offset.setdefault(d, []).append(int(offsets[j]))
        lm_group_index[l] = len(lm_h_idx[d]) - 1
        lm_dim_of[l] = d
    lm_dims = sorted(lm_h_idx)

    # --- classify H blocks ---
    hpl_keys: List[Tuple[int, int]] = []
    hpl_h_idx: Dict[Tuple[int, int], List[int]] = {}
    hpl_pose: Dict[Tuple[int, int], List[int]] = {}
    hpl_lm: Dict[Tuple[int, int], List[int]] = {}
    hpp_blocks: List[Tuple[int, int, Tuple[int, int], int]] = []  # r, c, key, idx
    # per landmark: list of (pose block, hpl key, hpl idx)
    lm_attach: List[List[Tuple[int, int, int]]] = [[] for _ in range(n_lm)]
    for i in range(hs.n_blocks):
        r, c = int(hs.block_rows[i]), int(hs.block_cols[i])
        key = hs.group_keys[hs.group_of_block[i]]
        idx = int(hs.index_in_group[i])
        if c < eb:
            hpp_blocks.append((r, c, key, idx))
        elif r < eb:  # pose-landmark
            if key not in hpl_h_idx:
                hpl_keys.append(key)
                hpl_h_idx[key] = []
                hpl_pose[key] = []
                hpl_lm[key] = []
            hpl_h_idx[key].append(idx)
            hpl_pose[key].append(r)
            hpl_lm[key].append(c - eb)
            lm_attach[c - eb].append(
                (r, hpl_keys.index(key), len(hpl_h_idx[key]) - 1)
            )
        # landmark-landmark off-diagonal blocks are not supported by the
        # Schur elimination (block-diagonal Hll assumption); diagonal blocks
        # are handled above.
        if r >= eb and c >= eb and r != c:
            raise ValueError(
                "Hll is not block-diagonal: factors connect two eliminated "
                "vertices; Schur elimination requires landmark-only factors "
                "to be absent (as in the reference BAL setup)"
            )

    # --- S sparsity: Hpp union fill-in pairs ---
    s_coords = set((r, c) for r, c, _, _ in hpp_blocks)
    for l in range(n_lm):
        ps = sorted(set(p for p, _, _ in lm_attach[l]))
        for ai in range(len(ps)):
            for bi in range(ai, len(ps)):
                s_coords.add((ps[ai], ps[bi]))
    s_list = sorted(s_coords, key=lambda rc: (rc[1], rc[0]))
    s_index: Dict[Tuple[int, int], Tuple[Tuple[int, int], int]] = {}
    s_keys: List[Tuple[int, int]] = []
    s_sizes: Dict[Tuple[int, int], int] = {}
    s_rows: Dict[Tuple[int, int], List[int]] = {}
    s_cols: Dict[Tuple[int, int], List[int]] = {}
    for (r, c) in s_list:
        key = (int(dims[r]), int(dims[c]))
        if key not in s_sizes:
            s_keys.append(key)
            s_sizes[key] = 0
            s_rows[key] = []
            s_cols[key] = []
        s_index[(r, c)] = (key, s_sizes[key])
        s_rows[key].append(r)
        s_cols[key].append(c)
        s_sizes[key] += 1

    # --- Hpp copy ops grouped by H group ---
    copy_map: Dict[Tuple[Tuple[int, int], Tuple[int, int]], Tuple[List[int], List[int]]] = {}
    for r, c, key, idx in hpp_blocks:
        skey, sidx = s_index[(r, c)]
        entry = copy_map.setdefault((key, skey), ([], []))
        entry[0].append(idx)
        entry[1].append(sidx)
    hpp_copy = [
        (hkey, np.asarray(h_idx, dtype=np.int32), np.asarray(s_idx, dtype=np.int32))
        for (hkey, skey), (h_idx, s_idx) in copy_map.items()
    ]
    # NB: hkey == skey for Hpp copies (same dims); keep skey implicit.

    # --- triple-product lists grouped by (dpa, dl, dpb) ---
    prod_groups: Dict[Tuple[int, int, int], dict] = {}
    for l in range(n_lm):
        dl = int(lm_dim_of[l])
        attach = sorted(lm_attach[l], key=lambda e: e[0])
        for ai in range(len(attach)):
            pa, ka, ia = attach[ai]
            dpa = int(dims[pa])
            for bi in range(ai, len(attach)):
                pb, kb, ib = attach[bi]
                dpb = int(dims[pb])
                gk = (dpa, dl, dpb)
                gg = prod_groups.setdefault(
                    gk,
                    dict(left_key=hpl_keys[ka], right_key=hpl_keys[kb],
                         left=[], right=[], mid=[], dst=[], dst_key=None),
                )
                gg["left"].append(ia)
                gg["right"].append(ib)
                gg["mid"].append(int(lm_group_index[l]))
                skey, sidx = s_index[(min(pa, pb), max(pa, pb))]
                gg["dst_key"] = skey
                gg["dst"].append(sidx)
    products = []
    for gk, gg in prod_groups.items():
        # sort by destination S block so the scatter is a sorted segmented
        # reduction (enables the Pallas windowed-one-hot kernel)
        dst_arr = np.asarray(gg["dst"], dtype=np.int32)
        order = np.argsort(dst_arr, kind="stable")
        products.append(
            dict(
                dims=gk,
                left_key=gg["left_key"],
                right_key=gg["right_key"],
                dst_key=gg["dst_key"],
                left=np.asarray(gg["left"], dtype=np.int32)[order],
                right=np.asarray(gg["right"], dtype=np.int32)[order],
                mid=np.asarray(gg["mid"], dtype=np.int32)[order],
                dst=dst_arr[order],
            )
        )

    # --- S diagonal lookup ---
    s_diag_key = np.full(n_pose, -1, dtype=np.int64)
    s_diag_idx = np.zeros(n_pose, dtype=np.int64)
    for p in range(n_pose):
        if (p, p) in s_index:
            key, idx = s_index[(p, p)]
            s_diag_key[p] = s_keys.index(key)
            s_diag_idx[p] = idx

    # --- block -> (type, row) for row-shaped vector IO ---
    block_type = [problem.block_vertex[j][0] for j in range(nb_total)]
    block_row = np.asarray(
        [
            problem.host.vertex_active_row[name][local]
            for name, local in problem.block_vertex
        ],
        dtype=np.int64,
    )

    ss = SchurStructure(
        dim_p=dim_p,
        n_pose_blocks=n_pose,
        pose_offsets=offsets[: n_pose + 1].copy(),
        pose_dims=dims[:n_pose].copy(),
        lm_dims=lm_dims,
        lm_h_idx={d: np.asarray(v, dtype=np.int32) for d, v in lm_h_idx.items()},
        lm_col_offset={d: np.asarray(v, dtype=np.int64)
                       for d, v in lm_col_offset.items()},
        lm_group_index=lm_group_index,
        lm_dim_of=lm_dim_of,
        hpl_keys=hpl_keys,
        hpl_h_idx={k: np.asarray(v, dtype=np.int32) for k, v in hpl_h_idx.items()},
        hpl_pose={k: np.asarray(v, dtype=np.int64) for k, v in hpl_pose.items()},
        hpl_lm={k: np.asarray(v, dtype=np.int64) for k, v in hpl_lm.items()},
        s_keys=s_keys,
        s_sizes=s_sizes,
        s_rows={k: np.asarray(v, dtype=np.int64) for k, v in s_rows.items()},
        s_cols={k: np.asarray(v, dtype=np.int64) for k, v in s_cols.items()},
        hpp_copy=hpp_copy,
        products=products,
        s_diag_key=s_diag_key,
        s_diag_idx=s_diag_idx,
        block_type=block_type,
        block_row=block_row,
    )
    problem._cache["schur_structure"] = ss
    return ss


# --------------------------------------------------------------------------
# Runtime values (jit)
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SchurValues:
    hll_inv: Dict[int, jax.Array]  # dim -> (Lg, d*d) flat
    s_vals: Dict[Tuple[int, int], jax.Array]  # key -> (nS_g, dr*dc) flat


def schur_values(problem, ss: SchurStructure, hvals: HessianValues
                 ) -> SchurValues:
    """S = Hpp - Hpl Hll^{-1} Hpl^T from damped H values
    (schur.hpp:227-235: Hpp copy -> block inversion -> triple products).

    All block batches are stored flat 2-D (ops/blockfmt.py); 3-D views exist
    only transiently inside fused einsums.
    """
    inv_dt = problem.precision.inv_dtype

    # 1. Hll^{-1} per dim group (schur.hpp:1067-1114).
    hll_inv = {}
    for d in ss.lm_dims:
        blocks = unflatten_blocks(
            hvals[(d, d)][jnp.asarray(ss.lm_h_idx[d])], d, d
        ).astype(inv_dt)
        hll_inv[d] = flatten_blocks(spd_inverse(blocks))

    # 2. S storage: copy Hpp (schur.hpp:587-614).
    s_vals = {
        key: jnp.zeros((ss.s_sizes[key], key[0] * key[1]), dtype=inv_dt)
        for key in ss.s_keys
    }
    for hkey, h_idx, s_idx in ss.hpp_copy:
        s_vals[hkey] = s_vals[hkey].at[jnp.asarray(s_idx)].add(
            hvals[hkey][jnp.asarray(h_idx)].astype(inv_dt)
        )

    # 3. Triple products (schur.hpp:649-734). First precompute
    # W = Hpl * Hll^{-1} once per Hpl BLOCK (one small gather), so each
    # product is W_left * Hpl_right^T — one fewer big gather per product
    # than the naive L,M,R form (Hll_inv is symmetric, so L M R^T =
    # (L M) R^T exactly).
    hpl_w: Dict[Tuple[int, int], jax.Array] = {}
    for key in ss.hpl_keys:
        dp, dl = key
        Hpl3 = unflatten_blocks(
            hvals[key][jnp.asarray(ss.hpl_h_idx[key])], dp, dl
        ).astype(inv_dt)
        lm_gidx = jnp.asarray(
            ss.lm_group_index[ss.hpl_lm[key]], dtype=jnp.int32
        )
        M3 = unflatten_blocks(hll_inv[dl][lm_gidx], dl, dl)
        hpl_w[key] = flatten_blocks(
            jnp.einsum("kab,kbc->kac", Hpl3, M3, preferred_element_type=inv_dt)
        )

    for gi, pg in enumerate(ss.products):
        dpa, dl, dpb = pg["dims"]
        W = unflatten_blocks(
            hpl_w[pg["left_key"]][jnp.asarray(pg["left"])], dpa, dl
        )
        R = unflatten_blocks(
            hvals[pg["right_key"]][jnp.asarray(pg["right"])], dpb, dl
        ).astype(inv_dt)
        # dst -= W R^T  (ops/schur.hpp:117-188)
        prod = jnp.einsum(
            "kab,kdb->kad", W, R, preferred_element_type=inv_dt
        )
        key = pg["dst_key"]
        s_vals[key] = s_vals[key] - _product_scatter(
            problem, ss, gi, pg, flatten_blocks(prod), inv_dt
        )
    return SchurValues(hll_inv=hll_inv, s_vals=s_vals)


def _use_pallas(problem, dtype) -> bool:
    import os

    if os.environ.get("GRAPHITE_TPU_NO_PALLAS"):
        return False
    if problem.psum_axis is not None:
        return False  # inside shard_map: keep the portable path
    return (jax.default_backend() not in ("cpu",)
            and jnp.dtype(dtype) == jnp.dtype(jnp.float32))


def _product_scatter(problem, ss, gi, pg, prod_flat, inv_dt):
    """Destination scatter of one product group: Pallas windowed-one-hot
    MXU kernel on TPU/f32 (dst is freeze-sorted), XLA segment_sum
    otherwise."""
    key = pg["dst_key"]
    if _use_pallas(problem, inv_dt):
        from .ops.pallas.segsum import plan_sorted_segsum, sorted_segment_sum

        plans = problem._cache.setdefault("segsum_plans", {})
        if gi not in plans:
            plans[gi] = plan_sorted_segsum(
                pg["dst"], ss.s_sizes[key], chunk=2048
            )
        return sorted_segment_sum(prod_flat, plans[gi])
    return jax.ops.segment_sum(
        prod_flat, jnp.asarray(pg["dst"]), num_segments=ss.s_sizes[key]
    )




def _partition_blocks_by_type(ss: SchurStructure, block_ids: np.ndarray):
    """Split an array of Hessian-block ids by vertex type.

    Returns [(type_name, sel, rows)] where ``sel`` indexes into ``block_ids``
    and ``rows`` are the blocks' rows within the type's segment. One
    partition per type (a single partition for the common one-pose-type /
    one-landmark-type case, so no overhead there).
    """
    types = np.asarray([ss.block_type[b] for b in block_ids])
    out = []
    for t in np.unique(types):
        sel = np.nonzero(types == t)[0]
        out.append((str(t), sel, ss.block_row[block_ids[sel]]))
    return out


class SchurOps:
    """Bundles static structure with one set of (damped) H values.

    All vector IO is row-shaped per vertex type (free reshapes under the
    type-major column layout) — flat scalar gathers/scatters are ~6x slower
    on TPU.
    """

    def __init__(self, problem, ss: SchurStructure, hvals: HessianValues,
                 sv: SchurValues):
        self.problem = problem
        self.ss = ss
        self.hvals = hvals
        self.sv = sv
        self._gdt = problem.precision.graph_dtype

    def hpl(self, key):
        return self.hvals[key][jnp.asarray(self.ss.hpl_h_idx[key])]

    def _cached_partition(self, tag, block_ids):
        cache = self.problem._cache.setdefault("schur_partitions", {})
        if tag not in cache:
            cache[tag] = _partition_blocks_by_type(self.ss, block_ids)
        return cache[tag]

    def _hll_solve_rows(self, t_rows: Dict[str, jax.Array]
                        ) -> Dict[str, jax.Array]:
        """w = Hll^{-1} t per landmark type (rows in type-row order)."""
        problem = self.problem
        ss = self.ss
        out = {}
        eb = problem.elimination_block
        n_lm = problem.n_blocks - eb
        lm_ids = np.arange(eb, problem.n_blocks)
        for t, sel, rows in self._cached_partition("lm_diag", lm_ids):
            d = problem.vertex_meta[t].vtype.dim
            # landmarks of this type, ordered by row == block order ✓
            order = np.argsort(rows, kind="stable")
            gidx = ss.lm_group_index[sel[order]]
            inv = unflatten_blocks(
                self.sv.hll_inv[d][jnp.asarray(gidx, dtype=jnp.int32)], d, d
            )
            out[t] = jnp.einsum(
                "krc,kc->kr", inv, t_rows[t].astype(inv.dtype)
            )
        return out

    def b_schur(self, b: jax.Array) -> jax.Array:
        """b_S = b_p - Hpl Hll^{-1} b_l (schur.hpp:886-920) -> (dim_p,)."""
        problem = self.problem
        ss = self.ss
        gdt = self._gdt
        b_l_rows = {
            t: problem.rows_view(b, t)
            for t, _, _ in self._cached_partition(
                "lm_diag", np.arange(problem.elimination_block,
                                     problem.n_blocks))
        }
        w = self._hll_solve_rows(b_l_rows)
        out_rows: Dict[str, jax.Array] = {}
        for key in ss.hpl_keys:
            dp, dl = key
            Hpl = self.hpl(key)
            lm_abs = ss.hpl_lm[key] + problem.elimination_block
            for pt, psel, prow in self._cached_partition(
                    f"hpl_pose_{key}", ss.hpl_pose[key]):
                # landmark rows for this subset (landmark type per entry)
                for lt, lsel, lrow in self._cached_partition(
                        f"hpl_lm_{key}_{pt}", lm_abs[psel]):
                    sub = psel[lsel]
                    Wg = w[lt][jnp.asarray(lrow, dtype=jnp.int32)]
                    Hsub = unflatten_blocks(
                        Hpl[jnp.asarray(sub, dtype=jnp.int32)], dp, dl
                    )
                    y = jnp.einsum("kab,kb->ka", Hsub.astype(Wg.dtype), Wg)
                    acc = jax.ops.segment_sum(
                        y.astype(gdt),
                        jnp.asarray(prow[lsel], dtype=jnp.int32),
                        num_segments=problem.seg_rows[pt] + 1,
                    )[:-1]
                    prev = out_rows.get(pt)
                    out_rows[pt] = acc if prev is None else prev + acc
        flat = problem.flat_from_rows(
            {t: -v for t, v in out_rows.items()}, dtype=gdt
        )
        return flat[: ss.dim_p] + b[: ss.dim_p].astype(gdt)

    def s_matvec(self, x: jax.Array) -> jax.Array:
        """y = S x on (dim_p,) vectors (schur.hpp:307-393)."""
        problem = self.problem
        ss = self.ss
        gdt = self._gdt
        y_rows: Dict[str, jax.Array] = {}

        def add_rows(t, acc):
            prev = y_rows.get(t)
            y_rows[t] = acc if prev is None else prev + acc

        for key in ss.s_keys:
            dr_k, dc_k = key
            S = self.sv.s_vals[key]
            rows_b, cols_b = ss.s_rows[key], ss.s_cols[key]
            for rt, rsel, rrow in self._cached_partition(
                    f"s_rows_{key}", rows_b):
                for ct, csel, crow in self._cached_partition(
                        f"s_cols_{key}_{rt}", cols_b[rsel]):
                    sub = rsel[csel]
                    Sg = unflatten_blocks(
                        S[jnp.asarray(sub, dtype=jnp.int32)], dr_k, dc_k
                    )
                    xg = problem.rows_view(x, ct)[
                        jnp.asarray(crow, dtype=jnp.int32)].astype(Sg.dtype)
                    add_rows(rt, jax.ops.segment_sum(
                        jnp.einsum("krc,kc->kr", Sg, xg).astype(gdt),
                        jnp.asarray(rrow[csel], dtype=jnp.int32),
                        num_segments=problem.seg_rows[rt] + 1,
                    )[:-1])
                    # transpose contribution for off-diagonal blocks
                    off = rows_b[sub] != cols_b[sub]
                    if np.any(off):
                        o = np.nonzero(off)[0]
                        St = jnp.swapaxes(
                            Sg[jnp.asarray(o, dtype=jnp.int32)], -1, -2)
                        xg2 = problem.rows_view(x, rt)[
                            jnp.asarray(rrow[csel][o], dtype=jnp.int32)
                        ].astype(Sg.dtype)
                        add_rows(ct, jax.ops.segment_sum(
                            jnp.einsum("kcr,kr->kc", St, xg2).astype(gdt),
                            jnp.asarray(crow[o], dtype=jnp.int32),
                            num_segments=problem.seg_rows[ct] + 1,
                        )[:-1])
        return problem.flat_from_rows(y_rows, dtype=gdt)[: ss.dim_p]

    def landmark_update(self, b: jax.Array,
                        dx_p: jax.Array) -> Dict[str, jax.Array]:
        """dx_l = Hll^{-1} (b_l - Hpl^T dx_p) (schur.hpp:279-302).

        Returns per-landmark-type rows (type-row order).
        """
        problem = self.problem
        ss = self.ss
        gdt = self._gdt
        lm_ids = np.arange(problem.elimination_block, problem.n_blocks)
        t_rows = {
            t: problem.rows_view(b, t).astype(gdt)
            for t, _, _ in self._cached_partition("lm_diag", lm_ids)
        }
        for key in ss.hpl_keys:
            dp, dl = key
            Hpl = self.hpl(key)
            lm_abs = ss.hpl_lm[key] + problem.elimination_block
            for pt, psel, prow in self._cached_partition(
                    f"hpl_pose_{key}", ss.hpl_pose[key]):
                xg = problem.rows_view(dx_p, pt)[
                    jnp.asarray(prow, dtype=jnp.int32)]
                for lt, lsel, lrow in self._cached_partition(
                        f"hpl_lm_{key}_{pt}", lm_abs[psel]):
                    sub = psel[lsel]
                    Hsub = unflatten_blocks(
                        Hpl[jnp.asarray(sub, dtype=jnp.int32)], dp, dl
                    )
                    contrib = jnp.einsum(
                        "kab,ka->kb", Hsub.astype(gdt),
                        xg[jnp.asarray(lsel, dtype=jnp.int32)].astype(gdt),
                    )
                    t_rows[lt] = t_rows[lt] - jax.ops.segment_sum(
                        contrib, jnp.asarray(lrow, dtype=jnp.int32),
                        num_segments=problem.seg_rows[lt] + 1,
                    )[:-1]
        return self._hll_solve_rows(t_rows)

    def compose_delta(self, dx_p: jax.Array,
                      dx_l_rows: Dict[str, jax.Array]) -> jax.Array:
        """(dim_p,) pose delta + landmark rows -> full (dim_x,) delta."""
        problem = self.problem
        out = problem.flat_from_rows(dx_l_rows, dtype=self._gdt)
        return jax.lax.dynamic_update_slice(
            out, dx_p.astype(self._gdt), (0,)
        )
