"""Find the row-width cliff in XLA's TPU row gather.

gather_micro.py measured (K,9)=58ms / (K,27)=115ms / (K,81)=28ms for
K=5M random rows — non-monotonic, with 81 at memcpy speed. If some width
threshold flips the lowering to the fast path, padding the Schur W/Hpl
factor rows (27 floats) to that width makes the 17M-pair triple-product
gathers ~4x cheaper.

    python tools/gather_width_probe.py [K] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
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

    def probe(name, body, *args):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, N, lambda i, acc: body(i, acc, *a), jnp.float32(0)))
        try:
            jax.block_until_ready(f(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<40} FAILED {type(e).__name__}: {str(e)[:100]}")
            return None
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        gb = K * args[0].shape[1] * 4 * 2 / 1e9
        print(f"{name:<40} {ms:9.3f} ms   {gb/ms*1e3:7.1f} GB/s",
              flush=True)
        return ms

    def p_gather(i, acc, v, g):
        out = (v + acc * 1e-30)[g]
        return acc + out[0, 0] * 1e-30

    for w in (64, 72, 80, 81, 96, 128):
        v = jnp.asarray(rng.standard_normal((K, w)), jnp.float32)
        probe(f"gather (K,{w}) rand", p_gather, v, gi)
        del v

    # gather 27 live cols padded inside a 32/64-wide array, slice after
    for wpad in (32, 64, 128):
        v = jnp.asarray(rng.standard_normal((K, wpad)), jnp.float32)

        def p_gs(i, acc, v, g, wpad=wpad):
            out = (v + acc * 1e-30)[g][:, :27]
            return acc + out[0, 0] * 1e-30

        probe(f"gather (K,{wpad})[:, :27]", p_gs, v, gi)
        del v


if __name__ == "__main__":
    main()
