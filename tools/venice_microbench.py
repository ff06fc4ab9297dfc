"""On-chip microbenchmarks of the primitives behind the Venice-Final solve
stages (backsub 903 ms, b_schur 362 ms, schur_values 1697 ms in r3 probes).

Isolates: sorted segment_sum at attachment scale, row gathers, the
streaming Pallas reduction on the same shapes, scan_accumulate folding,
and the fused product kernel — to find which primitive carries the cost.

    python tools/venice_microbench.py [K] [NSEG] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
NSEG = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    seg_sorted = np.sort(rng.integers(0, NSEG, K)).astype(np.int32)
    gather_idx = rng.integers(0, K, K).astype(np.int32)

    vals3 = jnp.asarray(rng.standard_normal((K, 3)), jnp.float32)
    vals27 = jnp.asarray(rng.standard_normal((K, 27)), jnp.float32)
    seg_d = jnp.asarray(seg_sorted)
    gi_d = jnp.asarray(gather_idx)

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

    def probe(name, body, *args):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, N, lambda i, acc: body(i, acc, *a), jnp.float32(0)))
        try:
            jax.block_until_ready(f(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<44} FAILED {type(e).__name__}: {str(e)[:120]}")
            return None
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        print(f"{name:<44} {ms:9.3f} ms", flush=True)
        return ms

    # 1. XLA sorted segment_sum, (K, 3) -> (NSEG, 3)   [backsub reduction]
    def p_segsum3(i, acc, v, s):
        out = jax.ops.segment_sum(v + acc * 1e-30, s, num_segments=NSEG)
        return acc + out[0, 0] * 1e-30

    # 2. XLA sorted segment_sum with indices_are_sorted
    def p_segsum3_sorted(i, acc, v, s):
        out = jax.ops.segment_sum(v + acc * 1e-30, s, num_segments=NSEG,
                                  indices_are_sorted=True)
        return acc + out[0, 0] * 1e-30

    # 3. row gather (K, 27) by random index                 [Hpl/W gathers]
    def p_gather27(i, acc, v, g):
        out = (v + acc * 1e-30)[g]
        return acc + out[0, 0] * 1e-30

    # 4. streaming Pallas segsum on the same (K, 3) shape
    from graphite_tpu.ops.pallas.segsum_stream import (
        plan_streaming_segsum,
        streaming_segment_sum,
    )

    plan = plan_streaming_segsum(seg_sorted, NSEG, chunk=1024)
    print("stream plan feasible:", plan.get("feasible"),
          "w_pad", plan.get("w_pad"), flush=True)
    if plan.get("feasible"):
        segc = jnp.asarray(plan["seg_pad_2d"])
        starts = jnp.asarray(plan["starts"])
        nfl = jnp.asarray(plan["nflush"])
        bas = jnp.asarray(plan["bases"])
        pad = plan["k_pad"] - K
        v3p = jnp.concatenate(
            [vals3, jnp.zeros((pad, 3), jnp.float32)]) if pad else vals3

        def p_stream3(i, acc, v, s, st, nf, ba):
            out = streaming_segment_sum(v + acc * 1e-30, plan, seg_pad=s,
                                        starts=st, nflush=nf, bases=ba)
            return acc + out[0, 0] * 1e-30

    # 5. einsum (K,9,3)^T x (K,9) -> (K,3) (the backsub block product)
    x9 = jnp.asarray(rng.standard_normal((K, 9)), jnp.float32)

    def p_einsum(i, acc, h, x):
        out = jnp.einsum("kab,ka->kb", (h + acc * 1e-30).reshape(K, 9, 3), x)
        return acc + out[0, 0] * 1e-30

    # 6. full backsub-like chain: gather 27 + einsum + sorted segsum
    def p_chain(i, acc, h, x, g, s):
        hg = (h + acc * 1e-30)[g]
        y = jnp.einsum("kab,ka->kb", hg.reshape(K, 9, 3), x)
        out = jax.ops.segment_sum(y, s, num_segments=NSEG)
        return acc + out[0, 0] * 1e-30

    probe("segment_sum (K,3) sorted", p_segsum3, vals3, seg_d)
    probe("segment_sum (K,3) indices_are_sorted", p_segsum3_sorted, vals3,
          seg_d)
    probe("gather (K,27) random rows", p_gather27, vals27, gi_d)
    if plan.get("feasible"):
        probe("streaming-kernel segsum (K,3)", p_stream3, v3p, segc,
              starts, nfl, bas)
    probe("einsum (K,9,3)x(K,9)", p_einsum, vals27, x9)
    probe("gather+einsum+segsum chain", p_chain, vals27, x9, gi_d, seg_d)


if __name__ == "__main__":
    main()
