"""Stage profile of one sphere2500 pose-graph LM iteration (VERDICT r3
item 2): where do the milliseconds go in the matrix-free PCG regime?

Stages (fori-loop method, program floor subtracted):
- full LM step (via the jit_loop program over N iterations)
- solver.solve (50 PCG inner iterations)
- ONE hessian_matvec (Jv + JtPv)
- preconditioner apply
- linearize (jacfwd through the quaternion retraction)
- compute_chi2

    python tools/pose_profile.py [poses] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp

POSES = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    import graphite_tpu as gt
    from graphite_tpu.io import g2o, synthetic
    from graphite_tpu.linearize import (
        compute_chi2,
        hessian_matvec,
        linearize,
    )
    from graphite_tpu.optimizers import (
        LevenbergMarquardtOptions,
        levenberg_marquardt,
    )
    from graphite_tpu.preconditioners import BlockJacobiPreconditioner
    from graphite_tpu.solvers import PCGSolver

    t0 = time.perf_counter()
    ds = synthetic.make_sphere_se3(POSES, seed=0)
    g, *_ = g2o.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    print(f"{ds.num_vertices} poses / {ds.num_edges} edges, "
          f"dim_h={problem.dim_h} ({time.perf_counter() - t0:.1f}s)",
          flush=True)

    solver = PCGSolver(max_iter=50, tol=1e-10, rejection_ratio=1e6,
                       preconditioner=BlockJacobiPreconditioner())
    opts = LevenbergMarquardtOptions(iterations=30, initial_damping=1e-4,
                                     jit_loop=True)
    t0 = time.perf_counter()
    res = levenberg_marquardt(problem, solver, options=opts)
    print(f"warmup {time.perf_counter() - t0:.1f}s chi2 "
          f"{res.initial_chi2:.4g}->{res.chi2:.4g} "
          f"({res.accepted_steps}/{res.iterations} accepted)", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = levenberg_marquardt(problem, solver, options=opts)
        best = min(best, time.perf_counter() - t0)
    print(f"LM: {res.iterations / best:.1f} iters/sec "
          f"({best / res.iterations * 1e3:.2f} ms/iter)", flush=True)

    # ---- stage probes ----
    def floor_ms():
        x = jnp.ones((8,), jnp.float32)
        f = jax.jit(lambda: jax.lax.fori_loop(
            0, N, lambda i, a: a + (x * (1 + a * 1e-30)).sum() * 1e-30,
            jnp.float32(0)))
        jax.block_until_ready(f())
        b = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            jax.block_until_ready(f())
            b = min(b, time.perf_counter() - t)
        return b * 1e3

    fl = floor_ms()
    print(f"floor {fl:.1f} ms (N={N})", flush=True)

    def probe(name, body, *args):
        f = problem.jit_with_consts(
            lambda *a: jax.lax.fori_loop(
                0, N, lambda i, acc: body(i, acc, *a), jnp.float32(0)))
        try:
            jax.block_until_ready(f(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<28} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            return
        b = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            b = min(b, time.perf_counter() - t)
        ms = max(b * 1e3 - fl, 0.0) / N
        print(f"{name:<28} {ms:9.3f} ms", flush=True)

    params = problem.params0
    lin0 = problem.jit_with_consts(lambda p: linearize(problem, p))(params)
    sstate0 = solver.prepare(problem, lin0, params)

    def lin_body(i, acc, params):
        p = {k: v + acc * 1e-30 for k, v in params.items()}
        return acc + linearize(problem, p).chi2 * 1e-30

    def chi2_body(i, acc, params):
        p = {k: v + acc * 1e-30 for k, v in params.items()}
        return acc + compute_chi2(problem, p) * 1e-30

    def matvec_body(i, acc, lin0, params):
        x = lin0.b + acc * 1e-30
        return acc + hessian_matvec(problem, lin0, x, params)[0] * 1e-30

    def matvec10_body(i, acc, lin0, params):
        def inner(j, a):
            return a + hessian_matvec(
                problem, lin0, lin0.b + a * 1e-30, params)[0] * 1e-30
        return acc + jax.lax.fori_loop(0, 10, inner, acc * 1e-30)

    def precond_body(i, acc, lin0, params):
        import dataclasses
        lin = dataclasses.replace(lin0, b=lin0.b + acc * 1e-30)
        ps = solver.preconditioner.prepare(problem, lin, params)
        ps = solver.preconditioner.set_damping(
            problem, lin, ps, jnp.asarray(1e-4, lin0.b.dtype), False)
        y = solver.preconditioner.apply(problem, lin, ps, lin.b)
        return acc + y[0] * 1e-30

    def solve_body(i, acc, lin0, params):
        import dataclasses
        lin = dataclasses.replace(lin0, b=lin0.b + acc * 1e-30)
        dx, ok = solver.solve(problem, lin, sstate0,
                              jnp.asarray(1e-4, lin0.b.dtype), False,
                              params=params)
        return acc + dx[0] * 1e-30

    probe("linearize", lin_body, params)
    probe("compute_chi2", chi2_body, params)
    probe("hessian_matvec x1", matvec_body, lin0, params)
    probe("hessian_matvec x10", matvec10_body, lin0, params)
    probe("precond prepare+apply", precond_body, lin0, params)
    probe("solve (50 PCG iters)", solve_body, lin0, params)


if __name__ == "__main__":
    main()
