"""Pallas TPU kernel: an ENTIRE preconditioned-CG solve in one kernel.

The Ladybug-scale LM iteration is kernel-launch-count bound (~2.7 ms of
pure op sequencing per iteration, BENCHMARKS.md roofline): at dim_p = 441
every matvec/dot of the 10-iteration PCG loop is microseconds of compute
wrapped in ~2 us of dispatch. When the dense Schur matrix S, the dense
block-Jacobi preconditioner M and all five CG vectors fit VMEM
(dim_p <= ~1024: 2 * n^2 * 4 B < 9 MB), the whole loop — matvecs,
normalizations, preconditioner applications, rejection bookkeeping — runs
as ONE pallas_call with zero intermediate HBM traffic and zero dispatch
overhead per iteration.

Semantics match ``ops/pcg_loop.run_pcg`` line for line (reference
pcg.hpp:95-231 / pcg_schur.hpp:108-163): residual normalization before
each preconditioner application, divergence rejection with x restore,
running-minimum rz_0 tracking, early convergence on |rz| < tol. S is
symmetric (built as T + T_off^T from upper-tri block storage), so the
matvec is computed as the row-vector product p @ S on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(s_ref, m_ref, b_ref, x_ref, *, max_iter, tol, rejection_ratio):
    f32 = jnp.float32
    S = s_ref[:]
    M = m_ref[:]
    b = b_ref[:]  # (1, n_pad); pad lanes are zero

    def vdot(u, v):
        return jnp.sum(u * v)

    def matmul(v, A):
        return jax.lax.dot_general(
            v, A, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def precondition(r):
        rnorm = jnp.sqrt(vdot(r, r))
        y = r / jnp.where(rnorm == 0, 1.0, rnorm)
        return matmul(y, M)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precondition(r0)
    p0 = z0
    rz0 = vdot(r0, z0)

    def body(k, c):
        x, r, p, z, rz, rz_min, done = c
        # fixed trip count; `done` masks updates (== the while_loop exit)
        active = jnp.logical_not(done) & (rz != 0)
        v = matmul(p, S)
        alpha = rz / vdot(p, v)
        x_new = x + alpha * p
        r_new = r - alpha * v
        z_new = precondition(r_new)
        rz_new = vdot(r_new, z_new)

        reject = (jnp.abs(rz_new) > rejection_ratio * rz_min) | jnp.isnan(
            rz_new)
        x_out = jnp.where(reject, x, x_new)
        rz_min_new = jnp.minimum(rz_min, jnp.abs(rz_new))
        beta = rz_new / rz
        p_new = z_new + beta * p
        converged = jnp.abs(rz_new) < tol

        def upd(new, old):
            return jnp.where(active, new, old)

        return (
            upd(x_out, x),
            upd(jnp.where(reject, r, r_new), r),
            upd(jnp.where(reject, p, p_new), p),
            upd(jnp.where(reject, z, z_new), z),
            upd(jnp.where(reject, rz, rz_new), rz),
            upd(rz_min_new, rz_min),
            done | (active & (reject | converged)),
        )

    init = (x0, r0, p0, z0, rz0, jnp.asarray(jnp.inf, f32),
            jnp.asarray(False))
    x, *_ = jax.lax.fori_loop(0, max_iter, body, init)
    x_ref[:] = x


@functools.partial(
    jax.jit, static_argnames=("max_iter", "tol", "rejection_ratio"))
def dense_pcg(S: jax.Array, M: jax.Array, b: jax.Array, *, max_iter: int,
              tol: float, rejection_ratio: float) -> jax.Array:
    """Solve S x = b with block-Jacobi PCG entirely inside one TPU kernel.

    S: (n, n) dense symmetric Schur matrix; M: (n, n) dense block-diagonal
    preconditioner (inverted S diagonal blocks); b: (n,). Returns x (n,).
    All three live in VMEM for the whole solve — caller gates on
    n <= ~1024 (2 matrices + vectors < VMEM).
    """
    n = S.shape[0]
    n_pad = _round_up(n, 128)
    Sp = jnp.zeros((n_pad, n_pad), jnp.float32).at[:n, :n].set(
        S.astype(jnp.float32))
    Mp = jnp.zeros((n_pad, n_pad), jnp.float32).at[:n, :n].set(
        M.astype(jnp.float32))
    bp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        b.astype(jnp.float32))
    x = pl.pallas_call(
        functools.partial(_kernel, max_iter=max_iter, tol=tol,
                          rejection_ratio=rejection_ratio),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
    )(Sp, Mp, bp)
    return x[0, :n].astype(b.dtype)
