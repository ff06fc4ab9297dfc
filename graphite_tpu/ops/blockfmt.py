"""Flat 2-D storage convention for batches of small matrices.

TPU tiles the last two array dimensions to (sublane, lane) = (8, 128)
multiples, so a batch of small blocks stored (N, r, c) is padded to
(N, 8k, 128) — e.g. (N, 9, 9) f32 occupies ~25x its logical size in HBM and
every gather/scatter/elementwise pays that bandwidth. Stored flat as
(N, r*c), padding drops to one lane-dim round-up (~1.6x for 81).

Convention: every HBM-resident batch of blocks (Jacobians, Hessian block
groups, Schur blocks, inverted diagonal blocks, precision matrices) is kept
flat 2-D; compute reshapes transiently around einsums, which XLA fuses so
the padded 3-D form never materializes in HBM. Measured on TPU v5e:
segment_sum (86545, 9, 9) -> 1274 takes 9.0 ms as 3-D vs 1.8 ms as 2-D.
"""

from __future__ import annotations

import jax


def flatten_blocks(a: jax.Array) -> jax.Array:
    """(N, r, c) -> (N, r*c)."""
    n, r, c = a.shape
    return a.reshape(n, r * c)


def unflatten_blocks(a: jax.Array, r: int, c: int) -> jax.Array:
    """(N, r*c) -> (N, r, c)."""
    return a.reshape(a.shape[0], r, c)
