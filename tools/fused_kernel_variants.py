"""Variant timing for the fused streaming product kernel at one Venice
part's shape (K~1.9M rows, m=k=9/3/9, wide=64 gathers).

Paths:
  A  wide gather only                       (lower bound on inputs)
  B  fused kernel, pre-gathered, chunk=C    (C = 2048 / 4096 / 8192)
  C  wide gather + XLA flat product (slice 64->27) + streaming segsum
  D  streaming segsum alone on a (K, 81) product buffer

    python tools/fused_kernel_variants.py [K] [NSEG] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1_900_000
NSEG = int(sys.argv[2]) if len(sys.argv) > 2 else 180_000
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
NB = 5_000_000
M, KD, NN = 9, 3, 9
WIDE = 64


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    from graphite_tpu.ops.blockfmt import flat_block_mm_nt
    from graphite_tpu.ops.pallas.segsum_stream import (
        plan_streaming_segsum,
        streaming_segment_product_sum,
        streaming_segment_sum,
    )

    seg = np.sort(rng.integers(0, NSEG, K)).astype(np.int32)

    li_np = rng.integers(0, NB, K).astype(np.int32)
    ri_np = rng.integers(0, NB, K).astype(np.int32)
    W64 = jnp.asarray(
        np.concatenate([rng.standard_normal((NB, M * KD)),
                        np.zeros((NB, WIDE - M * KD))], axis=1),
        jnp.float32)
    R64 = jnp.asarray(
        np.concatenate([rng.standard_normal((NB, NN * KD)),
                        np.zeros((NB, WIDE - NN * KD))], axis=1),
        jnp.float32)

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
            print(f"{name:<46} FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return None
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        print(f"{name:<46} {ms:9.3f} ms", flush=True)
        return ms

    li = jnp.asarray(li_np)

    def p_gather(i, acc, src, g):
        out = (src + acc * 1e-30)[g]
        return acc + out[0, 0] * 1e-30

    probe("A: wide gather (K, 64)", p_gather, W64, li)

    for chunk in (2048, 4096, 8192):
        plan = plan_streaming_segsum(seg, NSEG, chunk=chunk)
        if not plan.get("feasible"):
            print(f"chunk={chunk}: plan infeasible, w_pad",
                  plan.get("w_pad"), flush=True)
            continue
        k_pad = plan["k_pad"]
        pad = k_pad - K
        lp = jnp.asarray(np.concatenate([li_np, np.zeros(pad, np.int32)]))
        rp = jnp.asarray(np.concatenate([ri_np, np.zeros(pad, np.int32)]))
        Wg = W64[lp]
        Rg = R64[rp]
        segc = jnp.asarray(plan["seg_pad_2d"])
        starts = jnp.asarray(plan["starts"])
        nfl = jnp.asarray(plan["nflush"])
        bas = jnp.asarray(plan["bases"])

        def p_kernel(i, acc, wg, rg, s, st, nf, ba, plan=plan):
            out = streaming_segment_product_sum(
                wg + acc * 1e-30, rg, plan, M, KD, NN,
                seg_pad=s, starts=st, nflush=nf, bases=ba)
            return acc + out[0, 0] * 1e-30

        print(f"  [chunk={chunk} w_pad={plan['w_pad']} f={plan['f']} "
              f"n_steps={plan['n_steps']}]", flush=True)
        probe(f"B: fused kernel chunk={chunk}", p_kernel, Wg, Rg, segc,
              starts, nfl, bas)

        if chunk == 2048:
            def p_xla_prod(i, acc, w, r, g1, g2, s, st, nf, ba, plan=plan):
                wg = (w + acc * 1e-30)[g1][:, :M * KD]
                rg = r[g2][:, :NN * KD]
                prod = flat_block_mm_nt(wg, rg, M, KD, NN,
                                        acc_dtype=jnp.float32)
                out = streaming_segment_sum(prod, plan, seg_pad=s,
                                            starts=st, nflush=nf, bases=ba)
                return acc + out[0, 0] * 1e-30

            probe("C: wide gather + XLA prod + stream segsum",
                  p_xla_prod, W64, R64, lp, rp, segc, starts, nfl, bas)

            prod0 = jnp.asarray(
                rng.standard_normal((k_pad, M * NN)), jnp.float32)

            def p_seg_only(i, acc, pr, s, st, nf, ba, plan=plan):
                out = streaming_segment_sum(pr + acc * 1e-30, plan,
                                            seg_pad=s, starts=st,
                                            nflush=nf, bases=ba)
                return acc + out[0, 0] * 1e-30

            probe("D: streaming segsum only (K, 81)", p_seg_only, prod0,
                  segc, starts, nfl, bas)


if __name__ == "__main__":
    main()
