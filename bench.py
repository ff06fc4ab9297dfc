"""Headline benchmark: BAL Ladybug-49-scale LM iterations/sec on one TPU chip.

Workload (mirrors the reference BAL app defaults, examples/bal.cu:284-309):
synthetic Ladybug-49-sized bundle adjustment (49 cameras, 7776 points, 31843
observations — the real BAL archives are unreachable from this container),
fp32, LM with PCG-Schur (10 inner iterations, tol 1.0, rejection 5.0),
block-Jacobi-Schur preconditioner. The whole LM loop runs as ONE XLA program
(jit_loop), so the number excludes host overhead — it is the device-side
per-iteration throughput, each iteration being: solve (Schur rebuild + 10
PCG iterations) + update + chi2 + accept/reject (+ full relinearization and
Hessian reassembly on accepted steps).

Baseline: the reference publishes no numbers (BASELINE.md) and no CUDA GPU
exists in this environment to measure one, so ``vs_baseline`` is computed
against BASELINE_ITERS_PER_SEC, a stand-in estimate of the CUDA reference's
Ladybug-49 LM iteration rate at the same solver settings on a desktop-class
GPU. Replace with a measured number when a CUDA machine is available.

Output: ONE JSON line on stdout.
"""

import json
import sys
import time

BASELINE_ITERS_PER_SEC = 20.0  # stand-in CUDA-reference estimate (see above)
ITERATIONS = 20
SIZE = sys.argv[1] if len(sys.argv) > 1 else "ladybug"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import graphite_tpu as gt
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.optimizers import (
        LevenbergMarquardtOptions,
        levenberg_marquardt,
    )
    from graphite_tpu.solvers import PCGSchurSolver

    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    ds = synthetic.make_bal(SIZE, seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    log(f"problem built: {ds.num_cameras} cams / {ds.num_points} pts / "
        f"{ds.num_observations} obs, dim_h={problem.dim_h} "
        f"({time.perf_counter() - t0:.1f}s)")

    solver = PCGSchurSolver(max_iter=10, tol=1.0, rejection_ratio=5.0)
    opts = LevenbergMarquardtOptions(
        iterations=ITERATIONS, initial_damping=1e-4, jit_loop=True
    )

    t0 = time.perf_counter()
    res = levenberg_marquardt(problem, solver, options=opts)
    log(f"warmup (compile+run): {time.perf_counter() - t0:.1f}s, "
        f"chi2 {res.initial_chi2:.6g} -> {res.chi2:.6g}, "
        f"{res.iterations} iters ({res.accepted_steps} accepted)")

    # timed runs (executable cached)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = levenberg_marquardt(problem, solver, options=opts)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"timed run: {dt:.3f}s ({res.iterations / dt:.2f} iters/sec)")

    iters_per_sec = res.iterations / best
    metric_size = "ladybug49" if SIZE == "ladybug" else SIZE
    print(json.dumps({
        "metric": f"bal_{metric_size}_lm_pcg_schur_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
