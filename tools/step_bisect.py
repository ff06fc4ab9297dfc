"""Bisect the LM-step sequencing gap at Ladybug scale.

BENCHMARKS.md round 2 measured: the full LM step costs ~4.3 ms while its
parts (solve 1.5, chi2 0.12, update ~0) sum to ~2 ms. This tool builds the
step up piece by piece with the fori-loop timing method to locate the
missing milliseconds (candidates: lax.cond carry merging, apply_update,
backup/restore plumbing, the while_loop accept branch, trace writes).

Usage: python tools/step_bisect.py [size] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

SIZE = sys.argv[1] if len(sys.argv) > 1 else "ladybug"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200
# optional comma-list of probes to run (venice-scale compiles are minutes
# each): any of solve,update,reject,accept,full,chain
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None


def want(tag):
    return ONLY is None or tag in ONLY


def main():
    import graphite_tpu as gt
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.linearize import (
        apply_update,
        backup_parameters,
        compute_chi2,
        linearize,
        restore_parameters,
    )
    from graphite_tpu.optimizers.lm import (
        LevenbergMarquardtOptions,
        _initial_carry_traced,
        _lm_iteration,
    )
    from graphite_tpu.solvers import PCGSchurSolver

    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ds = synthetic.make_bal(SIZE, seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    solver = PCGSchurSolver(max_iter=10, tol=1.0, rejection_ratio=5.0)
    options = LevenbergMarquardtOptions(iterations=20, initial_damping=1e-4,
                                        jit_loop=True)

    def floor_ms():
        x = jnp.ones((8,), jnp.float32)
        f = jax.jit(lambda: jax.lax.fori_loop(
            0, N, lambda i, a: a + (x * (1 + a * 1e-30)).sum() * 1e-30,
            jnp.float32(0)))
        jax.block_until_ready(f())
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            jax.block_until_ready(f())
            best = min(best, time.perf_counter() - t)
        return best * 1e3

    fl = floor_ms()
    print(f"program floor: {fl:.1f} ms (N={N})")

    carry0 = problem.jit_with_consts(
        lambda p: _initial_carry_traced(problem, solver, p, options)
    )(problem.params0)

    def probe(name, body, *args):
        f = problem.jit_with_consts(
            lambda *a: jax.lax.fori_loop(
                0, N, lambda i, acc: body(i, acc, *a), jnp.float32(0)))
        try:
            jax.block_until_ready(f(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<34} FAILED {type(e).__name__}: {e}")
            return
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        print(f"{name:<34} {ms:8.3f} ms")
        return ms

    gdt = problem.precision.graph_dtype

    # 1. solve only
    def p_solve(i, acc, c):
        dx, ok = solver.solve(problem, c.lin, c.sstate,
                              c.mu + acc.astype(gdt) * 1e-30, False,
                              params=c.params)
        return acc + dx[0].astype(jnp.float32) * 1e-30

    # 2. + apply_update + chi2
    def p_update_chi2(i, acc, c):
        dx, ok = solver.solve(problem, c.lin, c.sstate,
                              c.mu + acc.astype(gdt) * 1e-30, False,
                              params=c.params)
        new_params = apply_update(problem, c.params, c.lin, dx)
        chi2 = compute_chi2(problem, new_params)
        return acc + chi2.astype(jnp.float32) * 1e-30

    # 3. + rho + reject-branch bookkeeping (restore), NO cond
    def p_reject_path(i, acc, c):
        dx, ok = solver.solve(problem, c.lin, c.sstate,
                              c.mu + acc.astype(gdt) * 1e-30, False,
                              params=c.params)
        new_params = apply_update(problem, c.params, c.lin, dx)
        chi2 = compute_chi2(problem, new_params)
        d = dx[: problem.dim_h]
        bb = c.lin.b[: problem.dim_h]
        rho = (c.chi2 - chi2) / (jnp.sum(d * (c.mu * d + bb)) + 1e-3)
        params = restore_parameters(problem, new_params, c.backup)
        leaf = next(iter(params.values()))
        return acc + (rho + leaf[0, 0]).astype(jnp.float32) * 1e-30

    # 4. accept path body: linearize + prepare + backup (no cond)
    def p_accept_path(i, acc, c):
        dx, ok = solver.solve(problem, c.lin, c.sstate,
                              c.mu + acc.astype(gdt) * 1e-30, False,
                              params=c.params)
        new_params = apply_update(problem, c.params, c.lin, dx)
        lin2 = linearize(problem, new_params)
        sstate2 = solver.prepare(problem, lin2, new_params)
        bk = backup_parameters(problem, new_params)
        leaf = next(iter(bk.values()))
        sleaf = next(iter(sstate2.hvals.values()))
        # consume every heavy output so XLA cannot dead-code it
        return acc + (lin2.chi2 + leaf[0, 0] + lin2.b[0]
                      + sleaf[0, 0]).astype(jnp.float32) * 1e-30

    # 5. the real step (cond + full carry)
    step = _lm_iteration(problem, solver, options)

    def p_full_step(i, acc, c):
        import dataclasses
        c2 = dataclasses.replace(c, mu=c.mu + acc.astype(gdt) * 1e-30)
        out = step(c2)
        pleaf = next(iter(out.params.values()))
        sleaf = next(iter(out.sstate.hvals.values()))
        # consume the heavy cond outputs so XLA cannot dead-code them
        return acc + (out.chi2 + pleaf[0, 0] + out.lin.b[0]
                      + sleaf[0, 0]).astype(jnp.float32) * 1e-30

    if want("solve"):
        probe("solve", p_solve, carry0)
    if want("update"):
        probe("solve+update+chi2", p_update_chi2, carry0)
    if want("reject"):
        probe("reject path (no cond)", p_reject_path, carry0)
    if want("accept"):
        probe("accept path (no cond)", p_accept_path, carry0)
    if want("full"):
        probe("full step (cond)", p_full_step, carry0)
    if ONLY is not None and not any(t.startswith("chain") for t in ONLY):
        return

    # 6. N REAL chained steps: the carry THREADS through (serial
    # dependence, exactly the while_loop's data flow minus the trace
    # write and run-flag plumbing). The un-chained probes above re-use
    # carry0 every iteration, so XLA overlaps iteration i+1's loads with
    # iteration i's compute — the delta between this number and
    # "full step (cond)" is the pipelining the real LM loop CANNOT have.
    def chain(c0, n):
        f = problem.jit_with_consts(
            lambda c: jax.lax.fori_loop(
                0, n, lambda i, cc: step(cc), c))
        jax.block_until_ready(f(c0))
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(c0))
            best = min(best, time.perf_counter() - t)
        return best * 1e3

    # window override: a probe-list entry "chain=LO:HI" measures the
    # marginal cost of trajectory steps LO+1..HI (e.g. chain=6:8 at
    # venice-big lands on consecutive ACCEPTED steps — the expensive
    # iteration kind; see BENCHMARKS round-5 bimodal analysis)
    n_hi, n_lo = min(N, 64), max(min(N, 64) // 4, 1)
    for tag in (ONLY or []):
        if tag.startswith("chain="):
            n_lo, n_hi = (int(x) for x in tag[6:].split(":"))
    hi, lo = chain(carry0, n_hi), chain(carry0, n_lo)
    # two trip counts difference out the program launch floor
    print(f"chained real steps ({n_lo}->{n_hi})        "
          f"{(hi - lo) / (n_hi - n_lo):8.3f} ms")


if __name__ == "__main__":
    main()
