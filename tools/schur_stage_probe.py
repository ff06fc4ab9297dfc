"""In-situ attribution of the Venice-Final schur_values stage (1739 ms in
the r3 bench): builds the venice-big problem ONCE, then times schur_values
under the probe hooks —

  front (hll)     hll_inv + Hpp copy only                 (FRONT_ONLY=hll)
  front           hll_inv + Hpp copy + W = Hpl Hll^{-1}   (FRONT_ONLY=1)
  front+N parts   + first N streamed product parts        (MAX_PARTS=N)
  full default    in-kernel fused product streaming kernel
  full unfused    GRAPHITE_TPU_NO_FUSED_STREAM=1 (wide gather + XLA
                  product + streaming reduction two-pass handoff)

The per-part slope and the front offset identify where the milliseconds
live. Results recorded in BENCHMARKS.md.

    python tools/schur_stage_probe.py [size] [N]
"""

import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import graphite_tpu as gt
    from graphite_tpu.hessian import (
        apply_damping,
        build_hessian_structure,
        compute_hessian_values,
    )
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.linearize import linearize
    from graphite_tpu.schur import build_schur_structure, schur_values

    size = sys.argv[1] if len(sys.argv) > 1 else "venice-big"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    ds = synthetic.make_bal(size, seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    hs = build_hessian_structure(problem)
    ss = build_schur_structure(problem)
    print(f"built: dim_h={problem.dim_h} dim_p={ss.dim_p} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)
    nparts = sum(
        len(problem._cache.get("stream_parts", {}).get(gi, []) or [])
        for gi in range(len(ss.products)))
    print("product groups:", len(ss.products),
          "Ks:", [int(pg["dst"].shape[0]) for pg in ss.products], flush=True)

    lin0 = problem.jit_with_consts(lambda p: linearize(problem, p))(
        problem.params0)
    hv0 = problem.jit_with_consts(
        lambda l: compute_hessian_values(problem, hs, l))(lin0)
    hv0 = problem.jit_with_consts(lambda hv, dg: apply_damping(
        problem, hs, hv, dg, jnp.asarray(1e-4, jnp.float32), False))(
        hv0, lin0.diag)

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
    print(f"floor {fl:.1f} ms (N={N})", flush=True)

    def probe(name, env=None):
        env = env or {}
        old = {k: os.environ.get(k) for k in env}
        os.environ.update({k: str(v) for k, v in env.items()})
        try:
            def body(i, acc, hv0):
                hv = {k: v + acc * 1e-30 for k, v in hv0.items()}
                sv = schur_values(problem, ss, hv)
                return acc + jnp.sum(
                    next(iter(sv.s_vals.values()))[0]) * 1e-30

            f = problem.jit_with_consts(
                lambda hv: jax.lax.fori_loop(
                    0, N, lambda i, acc: body(i, acc, hv),
                    jnp.float32(0)))
            try:
                jax.block_until_ready(f(hv0))
            except Exception as e:  # noqa: BLE001
                print(f"{name:<34} FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                return
            best = float("inf")
            for _ in range(2):
                t = time.perf_counter()
                jax.block_until_ready(f(hv0))
                best = min(best, time.perf_counter() - t)
            ms = max(best * 1e3 - fl, 0.0) / N
            print(f"{name:<34} {ms:9.1f} ms", flush=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    probe("front (hll+hpp only)", {"GRAPHITE_TPU_SCHUR_FRONT_ONLY": "hll"})
    probe("front (hll+hpp+W)", {"GRAPHITE_TPU_SCHUR_FRONT_ONLY": 1})
    probe("front + 1 part", {"GRAPHITE_TPU_SCHUR_MAX_PARTS": 1})
    probe("front + 2 parts", {"GRAPHITE_TPU_SCHUR_MAX_PARTS": 2})
    probe("front + 4 parts", {"GRAPHITE_TPU_SCHUR_MAX_PARTS": 4})
    probe("full (default: in-kernel fused)")
    probe("full (unfused handoff)", {"GRAPHITE_TPU_NO_FUSED_STREAM": 1})


if __name__ == "__main__":
    main()
