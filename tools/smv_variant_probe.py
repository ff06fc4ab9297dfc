"""On-chip probe: folded S-matvec variants at Venice-Final scale.

Hypothesis: the fold_body einsum on unflattened (chunk, 9, 9) blocks pays
the TPU tile-padding relayout (~25x logical bytes) when XLA materializes
the 3-D operand for dot_general, making the 56 ms/matvec ~80x off the HBM
roofline (1.58M 9x9 f32 blocks = 512 MB ~ 0.7 ms). Variants:

  A. current: scan fold, unflatten_blocks + einsum (both directions)
  B. flat VPU fold: strided lane slices, no 3-D views (both directions)
  C. B without the scan (single fused program) if it fits

    python tools/smv_variant_probe.py [K] [NSEG] [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from graphite_tpu.ops.chunked import scan_accumulate  # noqa: E402
from graphite_tpu.ops.blockfmt import unflatten_blocks  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1_580_000
NSEG = int(sys.argv[2]) if len(sys.argv) > 2 else 1_778
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10
DR = DC = 9
CHUNK = 155_648  # ~ map_chunk_rows((81+9+9+3)*4)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # production forces 'highest' (precision.py); without it TPU f32
    # einsums run single-pass bf16 and the self-check fails at 1e-6
    jax.config.update("jax_default_matmul_precision", "highest")
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    S = jnp.asarray(rng.standard_normal((K, DR * DC)), jnp.float32)
    cr = jnp.asarray(rng.integers(0, NSEG, K), jnp.int32)
    rr = jnp.asarray(np.sort(rng.integers(0, NSEG, K)), jnp.int32)
    om = jnp.asarray(rng.integers(0, 2, K), jnp.float32)
    xw = jnp.asarray(rng.standard_normal((NSEG, 16)), jnp.float32)

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

    def probe(name, body):
        f = jax.jit(lambda s, c, r, o, x: jax.lax.fori_loop(
            0, N, lambda i, acc: body(i, acc, s, c, r, o, x),
            jnp.float32(0)))
        try:
            jax.block_until_ready(f(S, cr, rr, om, xw))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<40} FAILED {type(e).__name__}: {str(e)[:120]}")
            return
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            jax.block_until_ready(f(S, cr, rr, om, xw))
            best = min(best, time.perf_counter() - t)
        per = (best * 1e3 - fl) / N
        print(f"{name:<40} {per:8.2f} ms/op", flush=True)

    def fold_einsum(i, acc, s, c, r, o, x):
        xp = x * (1 + acc * 1e-30)

        def body(carry, arrs):
            yr, yc = carry
            sf, crk, rrk, omk = arrs
            Sg = unflatten_blocks(sf, DR, DC)
            xc = xp[crk][:, :DC]
            yf = jnp.einsum("krc,kc->kr", Sg, xc)
            xr = xp[rrk][:, :DR]
            yt = jnp.einsum("krc,kr->kc", Sg, xr) * omk[:, None]
            yr = yr + jax.ops.segment_sum(yf, rrk, num_segments=NSEG)
            yc = yc + jax.ops.segment_sum(yt, crk, num_segments=NSEG)
            return yr, yc

        c0 = (jnp.zeros((NSEG, DR), jnp.float32),
              jnp.zeros((NSEG, DC), jnp.float32))
        yr, yc = scan_accumulate(body, (s, c, r, o), K, CHUNK, c0)
        return acc + yr.sum() * 1e-30 + yc.sum() * 1e-30

    def flat_mv(sf, xg):
        out = None
        for cc in range(DC):
            term = sf[:, cc::DC] * xg[:, cc:cc + 1]
            out = term if out is None else out + term
        return out

    def flat_mv_t(sf, xg):
        out = None
        for rr_ in range(DR):
            term = sf[:, rr_ * DC:(rr_ + 1) * DC] * xg[:, rr_:rr_ + 1]
            out = term if out is None else out + term
        return out

    def fold_flat(i, acc, s, c, r, o, x):
        xp = x * (1 + acc * 1e-30)

        def body(carry, arrs):
            yr, yc = carry
            sf, crk, rrk, omk = arrs
            xc = xp[crk][:, :DC]
            yf = flat_mv(sf, xc)
            xr = xp[rrk][:, :DR]
            yt = flat_mv_t(sf, xr) * omk[:, None]
            yr = yr + jax.ops.segment_sum(yf, rrk, num_segments=NSEG)
            yc = yc + jax.ops.segment_sum(yt, crk, num_segments=NSEG)
            return yr, yc

        c0 = (jnp.zeros((NSEG, DR), jnp.float32),
              jnp.zeros((NSEG, DC), jnp.float32))
        yr, yc = scan_accumulate(body, (s, c, r, o), K, CHUNK, c0)
        return acc + yr.sum() * 1e-30 + yc.sum() * 1e-30

    def noscan_flat(i, acc, s, c, r, o, x):
        xp = x * (1 + acc * 1e-30)
        xc = xp[c][:, :DC]
        yf = flat_mv(s, xc)
        xr = xp[r][:, :DR]
        yt = flat_mv_t(s, xr) * o[:, None]
        yr = jax.ops.segment_sum(yf, r, num_segments=NSEG)
        yc = jax.ops.segment_sum(yt, c, num_segments=NSEG)
        return acc + yr.sum() * 1e-30 + yc.sum() * 1e-30

    # numeric check (CPU-safe too): flat == einsum
    Sg = unflatten_blocks(S[:128], DR, DC)
    xg = xw[cr[:128]][:, :DC]
    np.testing.assert_allclose(
        np.asarray(flat_mv(S[:128], xg)),
        np.asarray(jnp.einsum("krc,kc->kr", Sg, xg)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(flat_mv_t(S[:128], xg)),
        np.asarray(jnp.einsum("krc,kr->kc", Sg, xg)), rtol=1e-6)
    print("numeric check ok", flush=True)

    probe("A fold scan einsum (current)", fold_einsum)
    probe("B fold scan flat-VPU", fold_flat)
    probe("C fold noscan flat-VPU", noscan_flat)


if __name__ == "__main__":
    main()
