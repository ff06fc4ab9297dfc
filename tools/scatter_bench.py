"""Micro-benchmark: scatter-reduction strategies on TPU for BAL-shaped data.

Strategies for v (F, D) -> out (NB, D) with segment ids seg (F,):
  A. unsorted segment_sum (current)
  B. freeze-time permutation + indices_are_sorted segment_sum
  C. unique-destination gather (when each dst has exactly one source)
  D. one-hot matmul (MXU) for small NB
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, n=50):
    f = jax.jit(f)
    jax.block_until_ready(f(*args))
    t = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / n
    print(f"{name:<44} {dt * 1e3:8.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    F, NB, D = 86545, 1274, 81
    v = jnp.asarray(rng.normal(size=(F, D)), jnp.float32)
    seg = rng.integers(0, NB, F)
    seg_j = jnp.asarray(seg, jnp.int32)
    perm = np.argsort(seg, kind="stable")
    seg_sorted = jnp.asarray(seg[perm], jnp.int32)
    perm_j = jnp.asarray(perm, jnp.int32)

    print(f"scatter (F={F}, D={D}) -> NB={NB}", flush=True)
    a = timeit("A unsorted segment_sum",
               lambda v: jax.ops.segment_sum(v, seg_j, num_segments=NB), v)
    b = timeit("B perm + sorted segment_sum",
               lambda v: jax.ops.segment_sum(
                   v[perm_j], seg_sorted, num_segments=NB,
                   indices_are_sorted=True), v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-3)

    # D. one-hot matmul: out[nb, D] = onehot[nb, F] @ v[F, D]
    onehot = jnp.zeros((F, NB), jnp.bfloat16).at[
        jnp.arange(F), seg_j].set(1.0)

    def matmul_scatter(v):
        return jax.lax.dot_general(
            onehot, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    d = timeit("D one-hot matmul (bf16 MXU)", matmul_scatter, v)
    np.testing.assert_allclose(np.asarray(d), np.asarray(a), rtol=1e-2,
                               atol=2e-1)

    # unique-destination: Hpl-style (each dst one source)
    F2, D2 = 31843, 27
    NB2 = F2 + 1
    v2 = jnp.asarray(rng.normal(size=(F2, D2)), jnp.float32)
    dst = rng.permutation(F2)
    dst_j = jnp.asarray(dst, jnp.int32)
    inv = np.empty(F2 + 1, dtype=np.int32)
    inv[dst] = np.arange(F2)
    inv[F2] = 0
    inv_j = jnp.asarray(inv)

    print(f"unique scatter (F={F2}, D={D2})", flush=True)
    a2 = timeit("A unsorted segment_sum",
                lambda v: jax.ops.segment_sum(v, dst_j, num_segments=NB2), v2)
    c2 = timeit("C inverse-permutation gather",
                lambda v: jnp.concatenate([v, jnp.zeros((1, D2), v.dtype)]
                                          )[inv_j], v2)
    np.testing.assert_allclose(np.asarray(a2)[:-1],
                               np.asarray(c2)[:-1][np.argsort(np.arange(F2+1)[:-1])],
                               rtol=1e-5)

    # diag-style: (31843, 81) -> 50 cams, heavy collisions
    F3, NB3, D3 = 31843, 50, 81
    v3 = jnp.asarray(rng.normal(size=(F3, D3)), jnp.float32)
    seg3 = rng.integers(0, NB3, F3)
    seg3_j = jnp.asarray(seg3, jnp.int32)
    perm3 = np.argsort(seg3, kind="stable")
    print(f"hot scatter (F={F3}, D={D3}) -> NB={NB3}", flush=True)
    timeit("A unsorted segment_sum",
           lambda v: jax.ops.segment_sum(v, seg3_j, num_segments=NB3), v3)
    timeit("B perm + sorted segment_sum",
           lambda v: jax.ops.segment_sum(
               v[jnp.asarray(perm3, jnp.int32)],
               jnp.asarray(seg3[perm3], jnp.int32),
               num_segments=NB3, indices_are_sorted=True), v3)
    onehot3 = jnp.zeros((F3, NB3), jnp.bfloat16).at[
        jnp.arange(F3), seg3_j].set(1.0)
    timeit("D one-hot matmul (bf16 MXU)",
           lambda v: jax.lax.dot_general(
               onehot3, v, (((0,), (0,)), ((), ())),
               preferred_element_type=jnp.float32), v3)

    # gather patterns
    print("gather (x[cols] forms)", flush=True)
    x = jnp.asarray(rng.normal(size=(23770,)), jnp.float32)
    cols = jnp.asarray(rng.integers(0, 23770, (F2, 9)), jnp.int32)
    timeit("gather (F,9) from (23770,)", lambda x: x[cols], x)


if __name__ == "__main__":
    main()
