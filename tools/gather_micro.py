"""Gather / small-segment streaming microbenchmarks at Venice shapes.

Answers the questions the solve-stage redesign hinges on:
  - is XLA row-gather cost per-row or per-byte (widths 9/27/81)?
  - does index locality (contiguous / near-sorted) make gathers cheap?
  - how fast is the streaming segsum with FEW segments (b_schur's
    per-pose reduction: K=5M -> 1779 rows) vs XLA's scatter-add?

    python tools/gather_micro.py [K] [NSEG_SMALL] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
NSEG_S = int(sys.argv[2]) if len(sys.argv) > 2 else 1_779
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    idx_rand = rng.integers(0, K, K).astype(np.int32)
    idx_sorted = np.sort(idx_rand).astype(np.int32)
    idx_iota = np.arange(K, dtype=np.int32)
    # "local" pattern: per-landmark attach ranges — monotone base + jitter
    jitter = rng.integers(0, 8, K).astype(np.int32)
    idx_local = np.minimum(idx_iota + jitter, K - 1).astype(np.int32)

    seg_small = np.sort(rng.integers(0, NSEG_S, K)).astype(np.int32)

    arrs = {
        w: jnp.asarray(rng.standard_normal((K, w)), jnp.float32)
        for w in (9, 27, 81)
    }
    idxs = {
        "rand": jnp.asarray(idx_rand),
        "sorted": jnp.asarray(idx_sorted),
        "iota": jnp.asarray(idx_iota),
        "local": jnp.asarray(idx_local),
    }

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

    def p_gather(i, acc, v, g):
        out = (v + acc * 1e-30)[g]
        return acc + out[0, 0] * 1e-30

    for w in (9, 27, 81):
        for nm in ("iota", "local", "sorted", "rand"):
            probe(f"gather (K,{w}) {nm}", p_gather, arrs[w], idxs[nm])

    # small-segment reductions (b_schur shape): K -> NSEG_S segments
    seg_d = jnp.asarray(seg_small)

    def p_segsum(i, acc, v, s):
        out = jax.ops.segment_sum(v + acc * 1e-30, s, num_segments=NSEG_S)
        return acc + out[0, 0] * 1e-30

    probe(f"XLA segsum (K,9) nseg={NSEG_S}", p_segsum, arrs[9], seg_d)

    from graphite_tpu.ops.pallas.segsum_stream import (
        plan_streaming_segsum,
        streaming_segment_sum,
    )

    plan = plan_streaming_segsum(seg_small, NSEG_S, chunk=2048)
    print("small-seg stream plan feasible:", plan.get("feasible"),
          "w_pad", plan.get("w_pad"), flush=True)
    if plan.get("feasible"):
        segc = jnp.asarray(plan["seg_pad_2d"])
        starts = jnp.asarray(plan["starts"])
        nfl = jnp.asarray(plan["nflush"])
        bas = jnp.asarray(plan["bases"])
        pad = plan["k_pad"] - K
        v9p = (jnp.concatenate([arrs[9], jnp.zeros((pad, 9), jnp.float32)])
               if pad else arrs[9])

        def p_stream(i, acc, v, s, st, nf, ba):
            out = streaming_segment_sum(v + acc * 1e-30, plan, seg_pad=s,
                                        starts=st, nflush=nf, bases=ba)
            return acc + out[0, 0] * 1e-30

        probe(f"stream segsum (K,9) nseg={NSEG_S}", p_stream, v9p, segc,
              starts, nfl, bas)

    # fused: gather w + einsum + stream (the proposed b_schur shape):
    # product in natural order, then permute (K,9) rows, then stream
    def p_permute_stream(i, acc, v, g, s, st, nf, ba):
        y = (v + acc * 1e-30)[g]
        out = streaming_segment_sum(y, plan, seg_pad=s,
                                    starts=st, nflush=nf, bases=ba)
        return acc + out[0, 0] * 1e-30

    if plan.get("feasible"):
        gi_pad = jnp.asarray(
            np.concatenate([idx_rand, np.zeros(pad, np.int32)])
            if pad else idx_rand)
        probe("permute(K,9)+stream", p_permute_stream, arrs[9], gi_pad,
              segc, starts, nfl, bas)


if __name__ == "__main__":
    main()
