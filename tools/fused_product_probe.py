"""On-chip attribution of the Venice-scale schur_values cost.

The bench r3 stage probe shows schur_values = 1739 ms while its
bandwidth speed-of-light is ~200-300 ms. This probe times the pieces of
one streaming PART (the stage runs ~9 of them) in isolation:

  1. wide (K, 64) row gather of the padded W / Hpl buffers
  2. the fused streaming product kernel on PRE-GATHERED inputs
  3. gather + fused kernel chained (what schur_values runs)
  4. the un-fused two-pass handoff (scan_map product -> streaming segsum)
  5. zero-pad concat of the (NB, 27) factor buffers to 64 lanes

    python tools/fused_product_probe.py [K_part] [NSEG] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1_900_000
NSEG = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20
NB = 5_000_000  # source rows (Hpl blocks at Venice-Final scale)
M, KD, NN = 9, 3, 9
WIDE = 64


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    from graphite_tpu.ops.blockfmt import flat_block_mm_nt
    from graphite_tpu.ops.chunked import scan_map
    from graphite_tpu.ops.pallas.segsum_stream import (
        plan_streaming_segsum,
        streaming_segment_product_sum,
        streaming_segment_sum,
    )

    seg = np.sort(rng.integers(0, NSEG, K)).astype(np.int32)
    plan = plan_streaming_segsum(seg, NSEG, chunk=2048)
    print("plan feasible:", plan.get("feasible"), "w_pad", plan.get("w_pad"),
          "k_pad", plan.get("k_pad"), "n_steps", plan.get("n_steps"),
          flush=True)
    if not plan.get("feasible"):
        return
    k_pad = plan["k_pad"]

    li = jnp.asarray(rng.integers(0, NB, k_pad).astype(np.int32))
    ri = jnp.asarray(rng.integers(0, NB, k_pad).astype(np.int32))
    W27 = jnp.asarray(rng.standard_normal((NB, M * KD)), jnp.float32)
    R27 = jnp.asarray(rng.standard_normal((NB, NN * KD)), jnp.float32)
    W64 = jnp.concatenate(
        [W27, jnp.zeros((NB, WIDE - M * KD), jnp.float32)], axis=1)
    R64 = jnp.concatenate(
        [R27, jnp.zeros((NB, WIDE - NN * KD), jnp.float32)], axis=1)
    Wg = W64[li]
    Rg = R64[ri]
    segc = jnp.asarray(plan["seg_pad_2d"])
    starts = jnp.asarray(plan["starts"])
    nfl = jnp.asarray(plan["nflush"])
    bas = jnp.asarray(plan["bases"])

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
            print(f"{name:<46} FAILED {type(e).__name__}: {str(e)[:140]}")
            return None
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        print(f"{name:<46} {ms:9.3f} ms", flush=True)
        return ms

    def p_gather_wide(i, acc, src, g):
        out = (src + acc * 1e-30)[g]
        return acc + out[0, 0] * 1e-30

    def p_gather_narrow(i, acc, src, g):
        out = (src + acc * 1e-30)[g]
        return acc + out[0, 0] * 1e-30

    def p_kernel_pre(i, acc, wg, rg, s, st, nf, ba):
        out = streaming_segment_product_sum(
            wg + acc * 1e-30, rg, plan, M, KD, NN,
            seg_pad=s, starts=st, nflush=nf, bases=ba)
        return acc + out[0, 0] * 1e-30

    def p_chain(i, acc, w, r, g1, g2, s, st, nf, ba):
        out = streaming_segment_product_sum(
            (w + acc * 1e-30)[g1], r[g2], plan, M, KD, NN,
            seg_pad=s, starts=st, nflush=nf, bases=ba)
        return acc + out[0, 0] * 1e-30

    def p_unfused(i, acc, w, r, g1, g2, s, st, nf, ba):
        def prod_chunk(arrs):
            a, b = arrs
            return flat_block_mm_nt(w[a], r[b], M, KD, NN,
                                    acc_dtype=jnp.float32)

        prod = scan_map(prod_chunk, (g1 + (acc * 1e-30).astype(jnp.int32),
                                     g2), k_pad, 1 << 19)
        out = streaming_segment_sum(prod, plan, seg_pad=s, starts=st,
                                    nflush=nf, bases=ba)
        return acc + out[0, 0] * 1e-30

    def p_pad_concat(i, acc, w):
        out = jnp.concatenate(
            [w + acc * 1e-30, jnp.zeros((NB, WIDE - M * KD), jnp.float32)],
            axis=1)
        return acc + out[0, 0] * 1e-30

    probe("gather (k_pad, 64) wide", p_gather_wide, W64, li)
    probe("gather (k_pad, 27) narrow", p_gather_narrow, W27, li)
    probe("fused kernel, pre-gathered", p_kernel_pre, Wg, Rg, segc,
          starts, nfl, bas)
    probe("gather + fused kernel chain", p_chain, W64, R64, li, ri, segc,
          starts, nfl, bas)
    probe("unfused: scan_map prod + stream segsum", p_unfused, W27, R27,
          li, ri, segc, starts, nfl, bas)
    probe("zero-pad concat (NB, 27->64)", p_pad_concat, W27)


if __name__ == "__main__":
    main()
