"""Flat 2-D block-product helpers vs 3-D einsum oracles
(ops/blockfmt.py; the J^T P J assembly and Schur products run on these)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graphite_tpu.ops.blockfmt import (
    flat_block_mm_nn,
    flat_block_mm_nt,
    flat_block_mm_tn,
    flat_block_mv,
)


@pytest.mark.parametrize("m,k,n", [(9, 3, 9), (2, 9, 3), (3, 2, 9), (1, 1, 1)])
def test_mm_variants_match_einsum(m, k, n):
    rng = np.random.default_rng(m * 100 + k * 10 + n)
    N = 17
    A = rng.standard_normal((N, m, k)).astype(np.float32)
    B = rng.standard_normal((N, k, n)).astype(np.float32)
    Bt = np.swapaxes(B, 1, 2).copy()  # (N, n, k)
    At = np.swapaxes(A, 1, 2).copy()  # (N, k, m)

    nn = flat_block_mm_nn(jnp.asarray(A.reshape(N, m * k)),
                          jnp.asarray(B.reshape(N, k * n)), m, k, n)
    nt = flat_block_mm_nt(jnp.asarray(A.reshape(N, m * k)),
                          jnp.asarray(Bt.reshape(N, n * k)), m, k, n)
    tn = flat_block_mm_tn(jnp.asarray(At.reshape(N, k * m)),
                          jnp.asarray(B.reshape(N, k * n)), m, k, n)
    ref = np.einsum("nmk,nkc->nmc", A, B).reshape(N, m * n)
    for out in (nn, nt, tn):
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6,
                                   atol=1e-6)


def test_mv_matches_einsum():
    rng = np.random.default_rng(0)
    N, m, k = 11, 9, 3
    A = rng.standard_normal((N, m, k)).astype(np.float32)
    x = rng.standard_normal((N, k)).astype(np.float32)
    out = flat_block_mv(jnp.asarray(A.reshape(N, m * k)), jnp.asarray(x),
                        m, k)
    np.testing.assert_allclose(np.asarray(out),
                               np.einsum("nmk,nk->nm", A, x),
                               rtol=1e-6, atol=1e-6)


def test_spd_inverse_flat_matches_3d():
    from graphite_tpu.ops.batched_linalg import spd_inverse, spd_inverse_flat
    rng = np.random.default_rng(1)
    for d in (1, 2, 3, 6):
        A = rng.standard_normal((50, d, d))
        spd = (A @ A.transpose(0, 2, 1)
               + 3.0 * np.eye(d)[None]).astype(np.float64)
        ref = np.asarray(spd_inverse(jnp.asarray(spd)))
        out = np.asarray(spd_inverse_flat(
            jnp.asarray(spd.reshape(50, d * d)), d)).reshape(50, d, d)
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(
            out @ spd, np.broadcast_to(np.eye(d), (50, d, d)),
            rtol=1e-8, atol=1e-9)
