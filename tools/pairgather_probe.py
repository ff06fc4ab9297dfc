"""Probe the gather strategies for the schur_values triple products.

The round-5 stage table has schur_values at 467.9 ms, dominated by the
two 17M-row wide gathers (Wg[li], Rg[ri]) of the fused streaming kernel
(r4 probe: XLA row gathers cost ~11.4 ns/row regardless of width). This
probe measures, at Venice-Final pair-list shapes, the building blocks of
a landmark-major reformulation:

  g2_rand    the current cost: TWO 17M gathers from (5M, 64) bf16
  g1_sort    ONE 17M dst-order gather from a (17M, 128) bf16 table
             (the product-reorder step of the pairgen plan)
  g1_f32     same, f32 (stream_dtype=f32 policies)
  rep_left   jnp.repeat expansion for the landmark-major LEFT ids
             (non-decreasing with host counts)
  g_window   ONE 17M window-local gather (landmark-major RIGHT ids)

Usage: python tools/pairgather_probe.py [size] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

SIZE = sys.argv[1] if len(sys.argv) > 1 else "venice-big"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main():
    import graphite_tpu as gt
    from graphite_tpu.io import bal as bal_io
    from graphite_tpu.io import synthetic
    from graphite_tpu.schur import build_schur_structure

    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ds = synthetic.make_bal(SIZE, seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    ss = build_schur_structure(problem)
    pg = ss.products[0]
    left = pg["left"]
    right = pg["right"]
    mid = pg["mid"]
    K = left.shape[0]
    n_obs = int(max(left.max(), right.max())) + 1
    print(f"K={K} n_obs={n_obs}", flush=True)

    # landmark-major orders (emission order of the pairgen plan)
    order = np.argsort(mid, kind="stable")
    li_lm = left[order]
    ri_lm = right[order]
    inv = np.empty(K, dtype=np.int64)
    inv[order] = np.arange(K)  # dst position t reads emission row inv[t]
    # left-id expansion counts (li_lm is non-decreasing)
    assert np.all(np.diff(li_lm.astype(np.int64)) >= 0)
    counts = np.bincount(li_lm, minlength=n_obs).astype(np.int32)

    tab64 = jnp.zeros((n_obs, 64), jnp.bfloat16) + jnp.arange(
        64, dtype=jnp.bfloat16)
    tab128 = jnp.zeros((K, 128), jnp.bfloat16) + jnp.arange(
        128, dtype=jnp.bfloat16)
    tab128f = jnp.zeros((K, 128), jnp.float32) + jnp.arange(
        128, dtype=jnp.float32)

    li_d = jnp.asarray(left.astype(np.int32))
    ri_d = jnp.asarray(right.astype(np.int32))
    inv_d = jnp.asarray(inv.astype(np.int32))
    ri_lm_d = jnp.asarray(ri_lm.astype(np.int32))
    counts_d = jnp.asarray(counts)

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
    print(f"program floor: {fl:.1f} ms (N={N})", flush=True)

    def probe(name, body):
        def fn():
            return jax.lax.fori_loop(
                0, N, lambda i, acc: body(i, acc), jnp.float32(0))

        try:
            compiled = jax.jit(fn).lower().compile()
            jax.block_until_ready(compiled())
        except Exception as e:  # noqa: BLE001
            print(f"{name:<10} FAILED {type(e).__name__}: {e}", flush=True)
            return
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(compiled())
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        print(f"{name:<10} {ms:8.1f} ms", flush=True)

    def tap(acc, *arrs):
        s = jnp.float32(0)
        for a in arrs:
            s = s + jnp.sum(a[0]).astype(jnp.float32)
        return acc + s * 1e-30

    def g2_rand(i, acc):
        t = tab64 + acc.astype(jnp.bfloat16) * 1e-30
        return tap(acc, t[li_d], t[ri_d])

    def g1_sort(i, acc):
        t = tab128 + acc.astype(jnp.bfloat16) * 1e-30
        return tap(acc, t[inv_d])

    def g1_f32(i, acc):
        t = tab128f + acc * 1e-30
        return tap(acc, t[inv_d])

    def rep_left(i, acc):
        t = tab64 + acc.astype(jnp.bfloat16) * 1e-30
        return tap(acc, jnp.repeat(t, counts_d, axis=0,
                                   total_repeat_length=K))

    def g_window(i, acc):
        t = tab64 + acc.astype(jnp.bfloat16) * 1e-30
        return tap(acc, t[ri_lm_d])

    probe("g2_rand", g2_rand)
    probe("g1_sort", g1_sort)
    probe("g1_f32", g1_f32)
    probe("rep_left", rep_left)
    probe("g_window", g_window)


if __name__ == "__main__":
    main()
