"""Block-Jacobi preconditioner on the Schur system.

TPU-native analog of ``BlockJacobiSchurPreconditioner``
(reference: preconditioner/block_jacobi_schur.hpp:16-179): gathers the
diagonal blocks of S (grouped by pose dim), inverts them batched, applies a
batched block matvec. Damping is a no-op because the Schur values are built
from the already-damped Hessian (:153-155).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.batched_linalg import spd_inverse
from ..ops.segment import scatter_add_flat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockJacobiSchurState:
    inv_blocks: Dict[int, jax.Array]  # pose dim -> (K, d, d)


def _pose_groups(ss):
    """Group pose blocks by dim -> (block ids, col offsets)."""
    groups = {}
    for p in range(ss.n_pose_blocks):
        d = int(ss.pose_dims[p])
        groups.setdefault(d, []).append(p)
    return groups


@dataclasses.dataclass(frozen=True)
class BlockJacobiSchurPreconditioner:
    def prepare(self, problem, ss, sv) -> BlockJacobiSchurState:
        inv_blocks = {}
        for d, pose_ids in _pose_groups(ss).items():
            blocks = []
            for p in pose_ids:
                ki = int(ss.s_diag_key[p])
                assert ki >= 0, "pose block without an S diagonal block"
            keys = np.asarray([ss.s_diag_key[p] for p in pose_ids])
            idxs = np.asarray([ss.s_diag_idx[p] for p in pose_ids])
            # all same-dim diag blocks live in the (d, d) group
            key = (d, d)
            gathered = sv.s_vals[key][jnp.asarray(idxs, dtype=jnp.int32)]
            inv_blocks[d] = spd_inverse(gathered)
        return BlockJacobiSchurState(inv_blocks=inv_blocks)

    def apply(self, problem, ss, state: BlockJacobiSchurState,
              y: jax.Array) -> jax.Array:
        gdt = problem.precision.graph_dtype
        z = jnp.zeros(ss.dim_p, dtype=gdt)
        offsets = ss.pose_offsets
        for d, pose_ids in _pose_groups(ss).items():
            cols = offsets[np.asarray(pose_ids)][:, None] + np.arange(d)[None, :]
            yg = y[jnp.asarray(cols)].astype(state.inv_blocks[d].dtype)
            zg = jnp.einsum("krc,kc->kr", state.inv_blocks[d], yg)
            z = z.at[jnp.asarray(cols).reshape(-1)].set(
                zg.astype(gdt).reshape(-1)
            )
        return z


@dataclasses.dataclass(frozen=True)
class IdentitySchurPreconditioner:
    def prepare(self, problem, ss, sv):
        return ()

    def apply(self, problem, ss, state, y):
        return y
