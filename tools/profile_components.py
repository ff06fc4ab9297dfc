"""Component-level timing of the BAL LM iteration on the real TPU chip.

Each component runs N times inside one jitted fori_loop (with a tiny
carry-dependence to defeat CSE) so the per-PROGRAM tunnel overhead is paid
once; the measured floor (an empty-ish program execution + block_until_ready
over the axon tunnel is ~25 ms regardless of content) is subtracted to get
true device time per call. Alongside each stage we print its useful-FLOP
count from `graphite_tpu.perf.flop_ledger` and the implied GFLOP/s.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import graphite_tpu as gt
from graphite_tpu import perf
from graphite_tpu.hessian import (
    apply_damping,
    build_hessian_structure,
    compute_hessian_values,
)
from graphite_tpu.io import bal as bal_io
from graphite_tpu.io import synthetic
from graphite_tpu.linearize import linearize, hessian_matvec
from graphite_tpu.schur import SchurOps, build_schur_structure, schur_values

N = int(sys.argv[2]) if len(sys.argv) > 2 else 200
SIZE = sys.argv[1] if len(sys.argv) > 1 else "ladybug"

_floor_ms = [0.0]


def measure_floor():
    """Fixed cost of one program execution + block_until_ready (tunnel RPC)."""
    x = jnp.ones((8,), jnp.float32)

    def run():
        return jax.lax.fori_loop(
            0, N, lambda i, a: a + (x * (1 + a * 1e-30)).sum() * 1e-30,
            jnp.float32(0))

    f = jax.jit(run)
    jax.block_until_ready(f())
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        jax.block_until_ready(f())
        best = min(best, time.perf_counter() - t)
    _floor_ms[0] = best * 1e3
    print(f"program floor: {_floor_ms[0]:.1f} ms "
          f"({_floor_ms[0] / N * 1e3:.0f} us/call at N={N})", flush=True)


def bench(name, make_fn, flops=None):
    f = jax.jit(make_fn)
    t = time.perf_counter()
    jax.block_until_ready(f())
    compile_t = time.perf_counter() - t
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        jax.block_until_ready(f())
        best = min(best, time.perf_counter() - t)
    ms = max(best * 1e3 - _floor_ms[0], 0.0) / N
    rate = ""
    if flops:
        rate = f"  {flops / 1e6:9.1f} MFLOP  {flops / (ms * 1e6 + 1e-30):9.1f} GFLOP/s"
    print(f"{name:<28} compile {compile_t:7.1f}s   {ms:8.3f} ms/call{rate}",
          flush=True)


def main():
    ds = synthetic.make_bal(SIZE, seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    hs = build_hessian_structure(problem)
    ss = build_schur_structure(problem)
    params = problem.params0
    led = perf.flop_ledger(problem, pcg_iters=10)
    print(f"dim_h={problem.dim_h} blocks={hs.n_blocks} "
          f"products={sum(len(p['dst']) for p in ss.products)}", flush=True)
    print("ledger (MFLOP/iter): "
          + "  ".join(f"{k}={v / 1e6:.1f}" for k, v in led.items()),
          flush=True)
    measure_floor()

    def loop(body):
        def run():
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))

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

    bench("hessian_values", loop(hess_body), led.get("hessian_values"))

    hv0 = jax.jit(
        lambda l: compute_hessian_values(problem, hs, l))(lin0)

    # 3. damping
    def damp_body(i, acc):
        hv = apply_damping(problem, hs, hv0, lin0.diag + acc * 1e-30,
                           1e-4, False)
        return acc + jnp.sum(hv[(9, 9)][0]) * 1e-30

    bench("apply_damping", loop(damp_body))

    # 4. schur values
    schur_flops = (led.get("hll_inverse", 0) + led.get("hpl_w", 0)
                   + led.get("triple_products", 0))

    def schur_body(i, acc):
        hv = {k: v + acc * 1e-30 for k, v in hv0.items()}
        sv = schur_values(problem, ss, hv)
        return acc + jnp.sum(sv.s_vals[(9, 9)][0]) * 1e-30

    bench("schur_values", loop(schur_body), schur_flops)

    sv0 = jax.jit(lambda h: schur_values(problem, ss, h))(hv0)

    # 5. S matvec + 6. b_schur + 7. landmark update
    x0 = jnp.ones(ss.dim_p, jnp.float32)
    per_mv = led.get("pcg_matvec", 0) / 11.0

    def smv_body(i, acc):
        ops = SchurOps(problem, ss, hv0, sv0)
        y = ops.s_matvec(x0 + acc * 1e-30)
        return acc + y[0] * 1e-30

    bench("s_matvec (block)", loop(smv_body), per_mv)

    def bs_body(i, acc):
        ops = SchurOps(problem, ss, hv0, sv0)
        y = ops.b_schur(lin0.b + acc * 1e-30)
        return acc + y[0] * 1e-30

    bench("b_schur", loop(bs_body), led.get("b_schur"))

    def lu_body(i, acc):
        ops = SchurOps(problem, ss, hv0, sv0)
        rows = ops.landmark_update(lin0.b, x0 + acc * 1e-30)
        return acc + next(iter(rows.values()))[0, 0] * 1e-30

    bench("landmark_update", loop(lu_body), led.get("backsub"))

    # 8. matrix-free H matvec (PCG non-Schur core) for comparison
    xh = jnp.ones(problem.dim_x, jnp.float32)

    def hmv_body(i, acc):
        y = hessian_matvec(problem, lin0, xh + acc * 1e-30)
        return acc + y[0] * 1e-30

    bench("hessian_matvec (mat-free)", loop(hmv_body))


if __name__ == "__main__":
    main()
