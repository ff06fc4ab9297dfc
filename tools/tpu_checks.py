"""TPU hardware correctness oracles.

The CPU test suite can't catch device-specific numerics (e.g. TPU f32
matmuls defaulting to single-pass bf16, which silently degraded the Schur
complement to 0.17 relative error until fixed). Run this on the real chip
after any change to the compute paths:

    python tools/tpu_checks.py

Checks (all f32 on-device vs float64 NumPy references):
  1. Schur matrix / b_schur / landmark update vs dense reference (<2e-5)
  2. Pallas sorted segmented sum vs XLA segment_sum (<1e-5)
  3. full LM + PCG-Schur converges on synthetic BAL
"""

import sys

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", "run this on the TPU"
    import graphite_tpu as gt
    from graphite_tpu.hessian import (
        apply_damping, build_hessian_structure, compute_hessian_values,
        hessian_to_dense,
    )
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.linearize import linearize
    from graphite_tpu.schur import SchurOps, build_schur_structure, schur_values
    from graphite_tpu.solvers.dense_cholesky_schur import schur_to_dense

    ds = synthetic.make_bal("mini", seed=0, noise=0.5)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    lin = linearize(problem, problem.params0)
    hs = build_hessian_structure(problem)
    ss = build_schur_structure(problem)
    hv = apply_damping(problem, hs,
                       compute_hessian_values(problem, hs, lin),
                       lin.diag, 1e-2, False)
    sv = schur_values(problem, ss, hv)

    H = hessian_to_dense(problem, hs, hv)
    npp = ss.dim_p
    Hpp, Hpl, Hll = H[:npp, :npp], H[:npp, npp:], H[npp:, npp:]
    Hll_inv = np.linalg.inv(Hll)
    S_ref = Hpp - Hpl @ Hll_inv @ Hpl.T
    S = np.asarray(schur_to_dense(problem, ss, sv), dtype=np.float64)
    rel = np.abs(S - S_ref).max() / np.abs(S_ref).max()
    log(f"1a. Schur matrix rel err: {rel:.2e}")
    assert rel < 2e-5, rel

    ops = SchurOps(problem, ss, hv, sv)
    b = np.asarray(lin.b, dtype=np.float64)[: problem.dim_h]
    b_s = np.asarray(ops.b_schur(jnp.asarray(lin.b)), dtype=np.float64)
    b_s_ref = b[:npp] - Hpl @ Hll_inv @ b[npp:]
    rel_b = np.abs(b_s - b_s_ref).max() / max(1.0, np.abs(b_s_ref).max())
    log(f"1b. b_schur rel err: {rel_b:.2e}")
    assert rel_b < 2e-5, rel_b

    dx_p = np.linalg.solve(S_ref, b_s_ref)
    dx_ref = Hll_inv @ (b[npp:] - Hpl.T @ dx_p)
    delta = np.asarray(
        ops.compose_delta(jnp.asarray(dx_p, jnp.float32),
                          ops.landmark_update(jnp.asarray(lin.b),
                                              jnp.asarray(dx_p, jnp.float32))),
        dtype=np.float64,
    )
    rel_l = (np.abs(delta[npp: problem.dim_h] - dx_ref).max()
             / max(1.0, np.abs(dx_ref).max()))
    log(f"1c. landmark update rel err: {rel_l:.2e}")
    assert rel_l < 2e-4, rel_l

    # 2. Pallas kernel vs XLA
    from graphite_tpu.ops.pallas.segsum import (
        plan_sorted_segsum, sorted_segment_sum,
    )

    rng = np.random.default_rng(1)
    k, ns, d = 8192, 100, 81
    seg = np.sort(rng.integers(0, ns, k)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)
    plan = plan_sorted_segsum(seg, ns, chunk=512)
    out = sorted_segment_sum(vals, plan)
    ref = jax.ops.segment_sum(vals, jnp.asarray(seg), num_segments=ns)
    rel_p = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    log(f"2.  pallas segsum rel err: {rel_p:.2e}")
    assert rel_p < 1e-5, rel_p

    # 2b. streaming (HBM-output) Pallas segsum vs XLA
    from graphite_tpu.ops.pallas.segsum_stream import (
        plan_streaming_segsum, streaming_segment_sum,
    )

    k2, ns2 = 200_000, 20_000
    seg2 = np.sort(rng.integers(0, ns2, k2)).astype(np.int32)
    vals2 = jnp.asarray(rng.normal(size=(k2, d)), jnp.float32)
    plan2 = plan_streaming_segsum(seg2, ns2, chunk=2048)
    assert plan2["feasible"]
    out2 = streaming_segment_sum(vals2, plan2)
    ref2 = jax.ops.segment_sum(vals2, jnp.asarray(seg2), num_segments=ns2)
    rel_s = float(jnp.max(jnp.abs(out2 - ref2)) / jnp.max(jnp.abs(ref2)))
    log(f"2b. streaming segsum rel err: {rel_s:.2e}")
    assert rel_s < 1e-5, rel_s

    # 2c. the streaming scatter inside schur_values (forced small
    # CHUNK_THRESHOLD) matches the default fused path
    from graphite_tpu import schur as schur_mod

    saved_threshold = schur_mod.CHUNK_THRESHOLD
    try:
        schur_mod.CHUNK_THRESHOLD = 1 << 12
        problem._cache.pop("segsum_stream_plans", None)
        sv_stream = jax.jit(
            lambda h: schur_values(problem, ss, h))(hv)
        for key_ in sv.s_vals:
            a = np.asarray(sv.s_vals[key_], dtype=np.float64)
            b_ = np.asarray(sv_stream.s_vals[key_], dtype=np.float64)
            rel_c = np.abs(a - b_).max() / (np.abs(a).max() + 1e-30)
            log(f"2c. schur_values streaming path rel err: {rel_c:.2e}")
            assert rel_c < 1e-5, rel_c
    finally:
        schur_mod.CHUNK_THRESHOLD = saved_threshold

    # 2d. on-device blocked Cholesky vs the dense reference
    from graphite_tpu.ops.blocked_cholesky import (
        blocked_cho_solve, blocked_cholesky,
    )

    nn = 700  # > base size: exercises the recursion on-chip
    A_ = rng.standard_normal((nn, nn)).astype(np.float32)
    S_spd = jnp.asarray(A_ @ A_.T + nn * np.eye(nn, dtype=np.float32))
    b_spd = jnp.asarray(rng.standard_normal(nn).astype(np.float32))
    # fp32 policies run solves under 'highest' (precision.matmul_precision)
    with jax.default_matmul_precision("highest"):
        x_dev = np.asarray(
            blocked_cho_solve(blocked_cholesky(S_spd), b_spd),
            dtype=np.float64)
    x_ref = np.linalg.solve(np.asarray(S_spd, dtype=np.float64),
                            np.asarray(b_spd, dtype=np.float64))
    rel_ch = np.abs(x_dev - x_ref).max() / np.abs(x_ref).max()
    log(f"2d. blocked cholesky solve rel err: {rel_ch:.2e}")
    assert rel_ch < 1e-4, rel_ch

    # 2e. streaming S matvec (prepare_matvec: CSR-permuted forward +
    # lane-transposed CSC streams) vs the folded XLA path, on-chip
    saved_chunk = schur_mod._smv_chunk_rows
    try:
        schur_mod._smv_chunk_rows = lambda rb: 4  # engage at mini scale
        problem._cache.pop("smv_stream_sites", None)
        ops_s = SchurOps(problem, ss, hv, sv)
        ops_s.prepare_matvec()
        assert ops_s._smv_prep, "streaming matvec site did not engage"
        x_mv = jnp.asarray(rng.standard_normal(ss.dim_p).astype(np.float32))
        y_stream = np.asarray(ops_s.s_matvec(x_mv), dtype=np.float64)
        y_ref = S_ref @ np.asarray(x_mv, dtype=np.float64)
        rel_mv = np.abs(y_stream - y_ref).max() / np.abs(y_ref).max()
        log(f"2e. streaming s_matvec rel err: {rel_mv:.2e}")
        assert rel_mv < 2e-5, rel_mv
    finally:
        schur_mod._smv_chunk_rows = saved_chunk
        problem._cache.pop("smv_stream_sites", None)

    # 3. end-to-end LM
    from graphite_tpu.optimizers import (
        LevenbergMarquardtOptions, levenberg_marquardt,
    )
    from graphite_tpu.solvers import PCGSchurSolver

    res = levenberg_marquardt(
        problem, PCGSchurSolver(max_iter=20, tol=1e-6, rejection_ratio=1e3),
        options=LevenbergMarquardtOptions(iterations=15, initial_damping=1e-4,
                                          jit_loop=True),
    )
    log(f"3.  LM chi2 {res.initial_chi2:.4g} -> {res.chi2:.4g} "
        f"({res.accepted_steps} accepted)")
    assert res.chi2 < 0.05 * res.initial_chi2

    log("ALL TPU HARDWARE CHECKS PASSED")


if __name__ == "__main__":
    main()
