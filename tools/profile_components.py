"""Component-level timing of the BAL LM iteration on the real TPU chip.

Each component runs N times inside one jitted fori_loop (with a tiny
carry-dependence to defeat CSE), so per-call dispatch overhead is excluded
and we see pure device time per invocation.
"""

import sys
import time

import jax
import jax.numpy as jnp

import graphite_tpu as gt
from graphite_tpu.hessian import (
    apply_damping,
    build_hessian_structure,
    compute_hessian_values,
)
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.linearize import linearize, hessian_matvec
from graphite_tpu.schur import SchurOps, build_schur_structure, schur_values

N = 20
SIZE = sys.argv[1] if len(sys.argv) > 1 else "ladybug"


def bench(name, make_fn):
    f = jax.jit(make_fn)
    t = time.perf_counter()
    out = jax.block_until_ready(f())
    compile_t = time.perf_counter() - t
    t = time.perf_counter()
    out = jax.block_until_ready(f())
    run_t = time.perf_counter() - t
    print(f"{name:<28} compile {compile_t:7.1f}s   "
          f"{run_t / N * 1e3:8.3f} ms/call", flush=True)
    return out


def main():
    ds = synthetic.make_bal(SIZE, seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    hs = build_hessian_structure(problem)
    ss = build_schur_structure(problem)
    params = problem.params0
    print(f"dim_h={problem.dim_h} blocks={hs.n_blocks} "
          f"products={sum(len(p['dst']) for p in ss.products)}", flush=True)

    def loop(body):
        def run():
            def step(i, carry):
                acc = body(i, carry)
                return acc

            return jax.lax.fori_loop(0, N, step, jnp.float32(0))

        return run

    # 1. linearize
    def lin_body(i, acc):
        p = {k: v + acc * 1e-30 for k, v in params.items()}
        lin = linearize(problem, p)
        return acc + lin.chi2 * 1e-30

    bench("linearize", loop(lin_body))

    lin0 = jax.jit(lambda p: linearize(problem, p))(params)

    # 2. hessian values
    def hess_body(i, acc):
        import dataclasses

        lin = dataclasses.replace(
            lin0, chi2_deriv={k: v + acc * 1e-30
                              for k, v in lin0.chi2_deriv.items()}
        )
        hv = compute_hessian_values(problem, hs, lin)
        return acc + jnp.sum(hv[(9, 9)][0]) * 1e-30

    bench("hessian_values", loop(hess_body))

    hv0 = jax.jit(
        lambda l: compute_hessian_values(problem, hs, l))(lin0)

    # 3. damping
    def damp_body(i, acc):
        hv = apply_damping(problem, hs, hv0, lin0.diag + acc * 1e-30,
                           1e-4, False)
        return acc + jnp.sum(hv[(9, 9)][0]) * 1e-30

    bench("apply_damping", loop(damp_body))

    # 4. schur values
    def schur_body(i, acc):
        hv = {k: v + acc * 1e-30 for k, v in hv0.items()}
        sv = schur_values(problem, ss, hv)
        return acc + jnp.sum(sv.s_vals[(9, 9)][0]) * 1e-30

    bench("schur_values", loop(schur_body))

    sv0 = jax.jit(lambda h: schur_values(problem, ss, h))(hv0)

    # 5. S matvec + 6. b_schur + 7. landmark update
    x0 = jnp.ones(ss.dim_p, jnp.float32)

    def smv_body(i, acc):
        ops = SchurOps(problem, ss, hv0, sv0)
        y = ops.s_matvec(x0 + acc * 1e-30)
        return acc + y[0] * 1e-30

    bench("s_matvec", loop(smv_body))

    def bs_body(i, acc):
        ops = SchurOps(problem, ss, hv0, sv0)
        y = ops.b_schur(lin0.b + acc * 1e-30)
        return acc + y[0] * 1e-30

    bench("b_schur", loop(bs_body))

    def lu_body(i, acc):
        ops = SchurOps(problem, ss, hv0, sv0)
        rows = ops.landmark_update(lin0.b, x0 + acc * 1e-30)
        return acc + next(iter(rows.values()))[0, 0] * 1e-30

    bench("landmark_update", loop(lu_body))

    # 8. matrix-free H matvec (PCG non-Schur core) for comparison
    xh = jnp.ones(problem.dim_x, jnp.float32)

    def hmv_body(i, acc):
        y = hessian_matvec(problem, lin0, xh + acc * 1e-30)
        return acc + y[0] * 1e-30

    bench("hessian_matvec (mat-free)", loop(hmv_body))


if __name__ == "__main__":
    main()
