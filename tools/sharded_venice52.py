"""One Venice-52-scale sharded execution on the 8-device CPU mesh
(VERDICT r3 item 7).

Runs sharded PCG-Schur LM (while_loop inside shard_map, dst-partitioned
streaming product stage with interpret-mode kernels) for >= 3 iterations
at (52 cams / 64k pts / 347k obs), checks the chi2 trajectory against the
single-device jit_loop run to fp32 tolerance, and asserts the partition
plan's balance/streaming-feasibility claims at scale — the claims
tests/test_sharding.py proves only at toy size. Slow by design (one
emulated 8-device mesh on one vCPU); run OFF the test suite and record
the result in BENCHMARKS.md.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/sharded_venice52.py [iterations]
"""

import functools
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
# Stream transport dtype: the DEFAULT validation now runs the shipped
# bf16 transport (the production configuration — VERDICT r4 weak #6);
# GRAPHITE_TPU_STREAM_DTYPE=f32 restores the exact-transport run whose
# tighter tolerances isolate the sharded reduction-order effect alone.
# The sharded side engages the streaming kernels (interpret mode) whose
# bf16 transport differs from the single-device XLA reference path, so
# the bf16 run uses correspondingly looser per-iteration bounds.
SDT = os.environ.setdefault("GRAPHITE_TPU_STREAM_DTYPE", "bf16")
# truncated-PCG trajectory sensitivity (see the tolerance note below):
# per-iteration chi2 relative bound and final-chi2 relative bound
PER_ITER_TOL = 1e-2 if SDT == "f32" else 5e-2
FINAL_TOL = 5e-4 if SDT == "f32" else 5e-3

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_DEV = 8


def main():
    import graphite_tpu as gt
    import graphite_tpu.ops.pallas.segsum_stream as ss_mod
    import graphite_tpu.schur as schur_mod
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.optimizers import (
        LevenbergMarquardtOptions,
        levenberg_marquardt,
    )
    from graphite_tpu.parallel import make_mesh, sharded_lm
    from graphite_tpu.solvers import PCGSchurSolver

    assert len(jax.devices()) >= N_DEV, jax.devices()

    # streaming kernels inside shard_map via interpret mode (no TPU here);
    # the reference (single-device) run keeps the portable XLA path
    ss_mod.pl.pallas_call = functools.partial(
        jax.experimental.pallas.pallas_call, interpret=True)
    orig_use_pallas = schur_mod._use_pallas
    schur_mod._use_pallas = (
        lambda problem, dtype, sharded_ok=False: sharded_ok)

    t0 = time.perf_counter()
    ds = synthetic.make_bal("venice", seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze(pad_factors_to=N_DEV)
    print(f"built: {ds.num_cameras} cams / {ds.num_points} pts / "
          f"{ds.num_observations} obs, dim_h={problem.dim_h} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    solver = PCGSchurSolver(max_iter=10, tol=1.0, rejection_ratio=5.0)
    opts = LevenbergMarquardtOptions(iterations=ITERS,
                                     initial_damping=1e-4, jit_loop=True)

    t0 = time.perf_counter()
    mesh = make_mesh(N_DEV)
    params_s, chi2_s, k_s, acc_s, trace_s = sharded_lm(
        problem, mesh, solver, opts, with_trace=True)
    chi2_s, k_s, acc_s, trace_s = jax.device_get(
        (chi2_s, k_s, acc_s, trace_s))
    dt_sharded = time.perf_counter() - t0
    print(f"sharded ({N_DEV} dev): chi2 -> {float(chi2_s):.6g}, "
          f"{int(k_s)} iters ({int(acc_s)} accepted), {dt_sharded:.0f}s "
          f"incl. compile", flush=True)
    print("sharded trajectory:",
          [f"{float(trace_s[i, 0]):.6g}" for i in range(int(k_s))],
          flush=True)

    # ---- partition-plan assertions at scale -----------------------------
    plans = problem._cache.get("sharded_stream_plans")
    assert plans, "dst-partitioned plan was not built"
    for (gi, nsh), sp in plans.items():
        assert sp["geom"] is not None, "streaming geometry infeasible"
        rows = np.asarray(sp["rows"])
        K = rows.sum()
        assert rows.max() <= 2 * K / nsh, (rows, K)
        assert (rows > 0).sum() >= nsh - 1
        seg0 = np.asarray(sp["seg0"])
        ends = seg0 + np.asarray(sp["ns_list"])
        live = np.asarray(sp["ns_list"]) > 0
        assert np.all(np.diff(seg0[live]) > 0)
        assert np.all(seg0[live][1:] >= ends[live][:-1])
        print(f"plan group {gi}: K={K} rows/device "
              f"min={rows.min()} max={rows.max()} "
              f"(K/{nsh}={K // nsh}), streaming geom "
              f"w_pad={sp['geom']['w_pad']} k_pad={sp['geom']['k_pad']}",
              flush=True)

    # ---- single-device reference trajectory ------------------------------
    schur_mod._use_pallas = orig_use_pallas
    problem2 = g.freeze(pad_factors_to=N_DEV)  # fresh cache, same padding
    t0 = time.perf_counter()
    res = levenberg_marquardt(problem2, solver, options=opts)
    print(f"single-device: chi2 -> {res.chi2:.6g}, {res.iterations} iters "
          f"({res.accepted_steps} accepted), "
          f"{time.perf_counter() - t0:.0f}s incl. compile", flush=True)
    print("single trajectory:",
          [f"{h['chi2']:.6g}" for h in res.history], flush=True)

    assert int(k_s) == res.iterations
    assert int(acc_s) == res.accepted_steps
    # Per-iteration tolerance is looser than the final one: the inner
    # solver is a TRUNCATED PCG (10 iterations, tol 1.0 — the production
    # config), so the sharded side's different-but-valid f32 reduction
    # order yields a slightly different truncated step; the ~1e-3 chi2
    # difference at early iterations washes out by convergence. The exact
    # sharded-vs-single algebra is oracle-checked in
    # tests/test_sharding.py (toy scale, tight inner solve).
    for i, h in enumerate(res.history):
        rel = abs(float(trace_s[i, 0]) - h["chi2"]) / abs(h["chi2"])
        assert rel < PER_ITER_TOL, (i, float(trace_s[i, 0]), h["chi2"], rel)
        assert bool(trace_s[i, 3]) == h["accepted"], (i, h)
    rel = abs(float(chi2_s) - res.chi2) / abs(res.chi2)
    assert rel < FINAL_TOL, (float(chi2_s), res.chi2, rel)
    print(f"final chi2 rel diff: {rel:.2e}  -> OK "
          f"(stream_dtype={SDT} tolerance {FINAL_TOL})", flush=True)
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
