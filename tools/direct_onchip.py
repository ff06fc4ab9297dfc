"""On-chip full-H direct-solver numbers (VERDICT r4 item 5).

Runs LM + SparseDirectSolver (full-H, no Schur elimination of landmarks)
on the real TPU chip and prints one JSON line per config:

  ladybug-dense : Ladybug-49 full H (dim_h = 23,769) via the dense
                  blocked Cholesky (on_device_limit raise, r4)
  ladybug-nd    : same problem, GRAPHITE_TPU_ND-forced nested-dissection
                  multifrontal (ops/nd_multifrontal.py)
  sphere-nd     : synthetic SE3 sphere pose graph with dim_h >= 100k —
                  the beyond-dense-limit regime the ND path exists for
                  (reference: cuDSS sparse factorization at any size,
                  include/graphite/solver/cudss.hpp:53-269)

Usage: python tools/direct_onchip.py [ladybug-dense|ladybug-nd|sphere-nd]
(no arg = all three, each in this process sequentially).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(mode):
    import graphite_tpu as gt
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import g2o, synthetic
    from graphite_tpu.optimizers import (
        LevenbergMarquardtOptions,
        levenberg_marquardt,
    )
    from graphite_tpu.solvers import SparseDirectSolver

    t0 = time.perf_counter()
    if mode.startswith("ladybug"):
        ds = synthetic.make_bal("ladybug", seed=0)
        g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
        # full-H direct: keep landmarks in the system (no elimination)
        for v in g.vertex_sets.values():
            v.set_eliminate(False)
    else:
        ds = synthetic.make_sphere_se3(17000, seed=0)
        g, *_ = g2o.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    solver = SparseDirectSolver(
        multifrontal=(None if mode == "ladybug-dense" else True))
    print(f"[{mode}] dim_h={problem.dim_h} "
          f"(build {time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    iters = 10
    opts = LevenbergMarquardtOptions(iterations=iters, initial_damping=1e-4,
                                     jit_loop=True)
    t0 = time.perf_counter()
    res = levenberg_marquardt(problem, solver, options=opts)
    print(f"[{mode}] warmup {time.perf_counter() - t0:.1f}s "
          f"chi2 {res.initial_chi2:.6g} -> {res.chi2:.6g} "
          f"({res.accepted_steps}/{res.iterations} accepted)",
          file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = levenberg_marquardt(problem, solver, options=opts)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "metric": f"direct_full_h_{mode}",
        "dim_h": problem.dim_h,
        "iters_per_sec": round(res.iterations / best, 3),
        "per_iter_ms": round(1e3 * best / res.iterations, 1),
        "chi2_final": float(f"{res.chi2:.6g}"),
        "accept_rate": round(res.accepted_steps / res.iterations, 2),
    }), flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["ladybug-dense", "ladybug-nd", "sphere-nd"]
    for m in modes:
        run(m)
