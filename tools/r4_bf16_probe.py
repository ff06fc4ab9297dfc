"""Round-4 probes: is the TPU row-gather fast path lane-based or
byte-based, and what do bf16 streams buy the two dominant Venice-Final
stages?

gather_width_probe.py (r3) established the f32 cliff: >= 64 f32 lanes
(256 B rows) runs at 90-113 GB/s, below ~11 GB/s. The round-4 lever is
storing the hot gather streams (W / Hpl pair gathers, S matvec copies)
in bf16 with f32 in-kernel accumulation — that halves the bytes ONLY if
a 64-lane bf16 row (128 B) still hits the fast path. Probes:

1. gather (K, lanes) x {f32, bf16} x lanes {32, 64, 128}
2. streaming_segment_product_sum with f32 vs bf16 gathered inputs at
   Venice-like geometry (9x3x9 blocks, ~11 products/segment)
3. b_schur building blocks: the w lookup as wide-gather vs
   repeat-expansion, and the 5M->n_pose segment_sum

    python tools/r4_bf16_probe.py [K] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
N = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    gi = jnp.asarray(rng.integers(0, K, K).astype(np.int32))

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

    def probe(name, body, gbytes, *args):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, N, lambda i, acc: body(i, acc, *a), jnp.float32(0)))
        try:
            jax.block_until_ready(f(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<44} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        print(f"{name:<44} {ms:9.3f} ms   {gbytes/ms*1e3:7.1f} GB/s",
              flush=True)
        return ms

    # ---- 1. gather width x dtype --------------------------------------
    def p_gather(i, acc, v, g):
        out = (v + acc.astype(v.dtype) * 1e-30)[g]
        return acc + out[0, 0].astype(jnp.float32) * 1e-30

    for dt, dtn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for w in (32, 64, 128):
            v = jnp.asarray(rng.standard_normal((K, w)), dt)
            nbytes = K * w * v.dtype.itemsize
            # write + read of the gathered buffer
            probe(f"gather (K,{w}) {dtn} rand", p_gather, 2 * nbytes / 1e9,
                  v, gi)
            del v

    # ---- 2. fused streaming product kernel, f32 vs bf16 ---------------
    sys.path.insert(0, ".")
    from graphite_tpu.ops.pallas.segsum_stream import (
        plan_streaming_segsum,
        streaming_segment_product_sum,
    )

    m = n = 9
    kd = 3
    mult = 11  # ~products per S block at Venice-Final
    nseg = K // mult
    seg = np.repeat(np.arange(nseg, dtype=np.int32), mult)[:K]
    seg.sort()
    plan = plan_streaming_segsum(seg, nseg, chunk=1024)
    assert plan["feasible"], "plan infeasible at probe shape"
    kp = plan["k_pad"]

    for dt, dtn, lanes in ((jnp.float32, "f32", 64),
                           (jnp.bfloat16, "bf16", 64),
                           (jnp.bfloat16, "bf16", 128)):
        lw = max(m * kd, lanes)
        L = jnp.asarray(rng.standard_normal((kp, lw)) * 0.1, dt)
        R = jnp.asarray(rng.standard_normal((kp, lw)) * 0.1, dt)

        def p_kernel(i, acc, L, R, dt=dt):
            Lp = L + acc.astype(dt) * 1e-30
            out = streaming_segment_product_sum(Lp, R, plan, m, kd, n)
            return acc + out[0, 0].astype(jnp.float32) * 1e-30

        nbytes = 2 * kp * lw * jnp.dtype(dt).itemsize
        probe(f"fused kernel 9x3x9 {dtn} lw={lw}", p_kernel, nbytes / 1e9,
              L, R)
        del L, R

    # gather + kernel end to end (what schur_values actually pays/pair)
    for dt, dtn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        lanes = 64
        W = jnp.asarray(rng.standard_normal((K // 4, lanes)) * 0.1, dt)
        gi2 = jnp.asarray(rng.integers(0, K // 4, kp).astype(np.int32))

        def p_gk(i, acc, W, g, dt=dt):
            Wp = W + acc.astype(dt) * 1e-30
            L = Wp[g]
            R = Wp[g]
            out = streaming_segment_product_sum(L, R, plan, m, kd, n)
            return acc + out[0, 0].astype(jnp.float32) * 1e-30

        nbytes = 4 * kp * lanes * jnp.dtype(dt).itemsize  # 2x(write+read)
        probe(f"gather+fused 9x3x9 {dtn}", p_gk, nbytes / 1e9, W, gi2)
        del W

    # ---- 3. b_schur building blocks ------------------------------------
    n_pose = 1778
    dp, dl = 9, 3
    n_lm = max(K // 5, 1)
    counts = np.zeros(n_lm, np.int32)
    np.add.at(counts, rng.integers(0, n_lm, K), 1)
    counts_j = jnp.asarray(counts)
    wtab = jnp.asarray(rng.standard_normal((n_lm, dl)), jnp.float32)
    wtab_wide = jnp.asarray(rng.standard_normal((n_lm, 64)), jnp.float32)
    lrow = np.repeat(np.arange(n_lm), counts)[:K].astype(np.int32)
    lrow_j = jnp.asarray(lrow)
    hpl = jnp.asarray(rng.standard_normal((K, dp * dl)), jnp.float32)
    prow = jnp.asarray(rng.integers(0, n_pose, K).astype(np.int32))

    def p_widegather(i, acc, wt, lr):
        out = (wt + acc * 1e-30)[lr][:, :dl]
        return acc + out[0, 0] * 1e-30

    probe("b_schur w wide-gather (K,64)", p_widegather,
          2 * K * 64 * 4 / 1e9, wtab_wide, lrow_j)

    def p_repeat(i, acc, wt, c):
        out = jnp.repeat(jax.lax.optimization_barrier(wt + acc * 1e-30),
                         c, axis=0, total_repeat_length=K)
        return acc + out[0, 0] * 1e-30

    probe("b_schur w repeat-expand (K,3)", p_repeat,
          2 * K * dl * 4 / 1e9, wtab, counts_j)

    from graphite_tpu.ops.blockfmt import flat_block_mv

    def p_bschur_full(i, acc, hpl, wt, c, pr):
        w_exp = jnp.repeat(jax.lax.optimization_barrier(wt + acc * 1e-30),
                           c, axis=0, total_repeat_length=K)
        y = flat_block_mv(hpl, w_exp, dp, dl, acc_dtype=jnp.float32)
        out = jax.ops.segment_sum(y, pr, num_segments=n_pose)
        return acc + out[0, 0] * 1e-30

    probe("b_schur full (repeat+mv+segsum)", p_bschur_full,
          (K * dp * dl + 2 * K * dl + K * dp) * 4 / 1e9,
          hpl, wtab, counts_j, prow)

    def p_segsum(i, acc, y, pr):
        out = jax.ops.segment_sum(y + acc * 1e-30, pr, num_segments=n_pose)
        return acc + out[0, 0] * 1e-30

    y9 = jnp.asarray(rng.standard_normal((K, dp)), jnp.float32)
    probe(f"segment_sum (K,9)->({n_pose},9)", p_segsum,
          2 * K * dp * 4 / 1e9, y9, prow)


if __name__ == "__main__":
    main()
