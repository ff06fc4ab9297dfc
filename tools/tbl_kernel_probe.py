"""On-chip smoke + timing for the round-4 in-kernel-gather kernels.

Validates (real Mosaic lowering, not interpret mode):
- segsum_stream.streaming_matvec_tbl forward + transposed vs XLA reference
- segmv.block_matvec_stream (b_schur shape) vs XLA reference
then times them at Venice-Final-like shapes with the fori-loop method.

    python tools/tbl_kernel_probe.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphite_tpu.ops.blockfmt import flat_block_mv, flat_block_mv_t
from graphite_tpu.ops.pallas.segmv import (
    block_matvec_stream,
    pack_chunk_ids,
    plan_block_matvec,
    tpad,
)
from graphite_tpu.ops.pallas.segsum_stream import (
    plan_streaming_segsum,
    streaming_matvec_tbl,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 1_140_000
NS = 1778          # Venice-Final pose rows
M = KK = 9
REPS = 50


def loop_time(fn, *args, perturb: int = 0):
    """fori-loop timing with carry dependence (CLAUDE.md method).

    Every array in ``args`` is a jit argument (NOT a closed-over constant —
    a 370 MB inlined literal blows the remote-compile tunnel's payload
    limit, HTTP 413).  ``perturb`` picks which argument carries the
    iteration dependence; point it at a SMALL float array so the per-rep
    perturbation copy doesn't rival the kernel's own bandwidth.
    """

    def run(*a):
        def body(i, acc):
            pa = list(a)
            pa[perturb] = pa[perturb] + (acc * 1e-30).astype(pa[perturb].dtype)
            out = fn(*pa)
            return acc + out[0, 0].astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(
            0, REPS, body,
            jnp.float32(0) * a[perturb][0, 0].astype(jnp.float32))

    f = jax.jit(run)
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t)
    return (best - 0.028) / REPS * 1e3  # subtract ~28ms program floor


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    seg = np.sort(rng.integers(0, NS, size=K)).astype(np.int32)
    idx = rng.integers(0, NS, size=K).astype(np.int32)

    for sdt in (jnp.float32, jnp.bfloat16):
        plan = plan_streaming_segsum(seg, NS, chunk=1024)
        assert plan["feasible"]
        k_pad = plan["k_pad"]
        left = jnp.asarray(
            rng.standard_normal((K, M * KK)).astype(np.float32))
        left_pad = jnp.zeros((k_pad, M * KK), sdt)
        left_pad = jax.lax.dynamic_update_slice(
            left_pad, left.astype(sdt), (0, 0))
        x = jnp.asarray(rng.standard_normal((NS, KK)).astype(np.float32))
        xtab = jnp.zeros((tpad(NS + 1), 16), sdt)
        xtab = jax.lax.dynamic_update_slice(xtab, x.astype(sdt), (0, 0))
        idx_pack = jnp.asarray(pack_chunk_ids(idx, k_pad, 1024, fill=NS))
        # K-sized plan arrays must be jit ARGS, not inlined constants
        # (remote-compile payload limit)
        pargs = tuple(jnp.asarray(plan[kk])
                      for kk in ("seg_pad_2d", "starts", "nflush", "bases"))

        for transpose in (False, True):
            out = jax.jit(
                lambda lp, xt, ip, sp, st, nf, bs: streaming_matvec_tbl(
                    lp, xt, ip, plan, M, KK, transpose=transpose,
                    seg_pad=sp, starts=st, nflush=nf, bases=bs)
            )(left_pad, xtab, idx_pack, *pargs)
            lf = left.astype(sdt).astype(jnp.float32)
            xg = x.astype(sdt).astype(jnp.float32)[jnp.asarray(idx)]
            y = (flat_block_mv_t if transpose else flat_block_mv)(
                lf, xg, M, KK, acc_dtype=jnp.float32)
            ref = jax.ops.segment_sum(y, jnp.asarray(seg), num_segments=NS)
            err = float(jnp.max(jnp.abs(out - ref))
                        / (1e-6 + jnp.max(jnp.abs(ref))))
            ms = loop_time(
                lambda xt, lp, ip, sp, st, nf, bs: streaming_matvec_tbl(
                    lp, xt, ip, plan, M, KK, transpose=transpose,
                    seg_pad=sp, starts=st, nflush=nf, bases=bs),
                xtab, left_pad, idx_pack, *pargs)
            print(f"matvec_tbl {np.dtype(sdt).name:8s} T={transpose!s:5s} "
                  f"K={K} relerr={err:.2e}  {ms:7.2f} ms "
                  f"({K * (M * KK) * np.dtype(sdt).itemsize / ms / 1e6:.0f}"
                  f" GB/s stream)", flush=True)
            assert err < (2e-2 if sdt == jnp.bfloat16 else 1e-5), err

        # b_schur shape: dp=9, dl=3, unsorted dst into NS pose rows
        dp, dl = 9, 3
        bplan = plan_block_matvec(K)
        dst = rng.integers(0, NS, size=K).astype(np.int32)  # UNSORTED
        hb = jnp.asarray(
            rng.standard_normal((K, dp * dl)).astype(np.float32))
        hpad = jnp.zeros((bplan["k_pad"], dp * dl), sdt)
        hpad = jax.lax.dynamic_update_slice(hpad, hb.astype(sdt), (0, 0))
        w = jnp.asarray(rng.standard_normal((K, dl)).astype(np.float32))
        wpad = jnp.zeros((bplan["k_pad"], dl), sdt)
        wpad = jax.lax.dynamic_update_slice(wpad, w.astype(sdt), (0, 0))
        dst_pack = jnp.asarray(
            pack_chunk_ids(dst, bplan["k_pad"], bplan["chunk"], fill=NS))
        bf16r = sdt == jnp.bfloat16
        out = jax.jit(
            lambda hp, wp, dpk: block_matvec_stream(
                hp, wp, bplan, dpk, dp, dl, NS, bf16_reduce=bf16r)
        )(hpad, wpad, dst_pack)
        y = flat_block_mv(hb.astype(sdt).astype(jnp.float32),
                          w.astype(sdt).astype(jnp.float32), dp, dl,
                          acc_dtype=jnp.float32)
        ref = jax.ops.segment_sum(y, jnp.asarray(dst), num_segments=NS)
        err = float(jnp.max(jnp.abs(out - ref))
                    / (1e-6 + jnp.max(jnp.abs(ref))))
        ms = loop_time(
            lambda wp, hp, dpk: block_matvec_stream(
                hp, wp, bplan, dpk, dp, dl, NS, bf16_reduce=bf16r),
            wpad, hpad, dst_pack)
        print(f"bschur_fused {np.dtype(sdt).name:8s}            "
              f"K={K} relerr={err:.2e}  {ms:7.2f} ms", flush=True)
        assert err < (3e-2 if bf16r else 1e-4), err

        # b_schur with the rolling-window w table (no expanded stream)
        from graphite_tpu.ops.pallas.segmv import (
            block_matvec_wtbl,
            plan_matvec_wtbl,
        )

        n_lm = 200_000
        lrow_w = np.sort(rng.integers(0, n_lm, size=K)).astype(np.int32)
        wplan = plan_matvec_wtbl(lrow_w.astype(np.int64), n_lm, K)
        assert wplan is not None, "wtbl plan infeasible at probe shapes"
        kpw, chw = wplan["k_pad"], wplan["chunk"]
        hw = jnp.zeros((kpw, dp * dl), sdt)
        hw = jax.lax.dynamic_update_slice(hw, hb.astype(sdt), (0, 0))
        wrows = jnp.asarray(
            rng.standard_normal((n_lm, dl)).astype(np.float32)).astype(sdt)
        dst_w = jnp.asarray(pack_chunk_ids(dst, kpw, chw, fill=NS))
        lid_w = jnp.asarray(pack_chunk_ids(lrow_w, kpw, chw, fill=n_lm))
        wblk = jnp.asarray(wplan["wblk"])
        out = jax.jit(
            lambda h, wr, d_, l_: block_matvec_wtbl(
                h, wr, wplan, d_, l_, dp, dl, NS, bf16_reduce=bf16r)
        )(hw, wrows, dst_w, lid_w)
        y = flat_block_mv(hb.astype(sdt).astype(jnp.float32),
                          wrows.astype(jnp.float32)[jnp.asarray(lrow_w)],
                          dp, dl, acc_dtype=jnp.float32)
        ref = jax.ops.segment_sum(y, jnp.asarray(dst), num_segments=NS)
        err = float(jnp.max(jnp.abs(out - ref))
                    / (1e-6 + jnp.max(jnp.abs(ref))))
        ms = loop_time(
            lambda wr, h, d_, l_: block_matvec_wtbl(
                h, wr, wplan, d_, l_, dp, dl, NS, bf16_reduce=bf16r),
            wrows, hw, dst_w, lid_w)
        print(f"bschur_wtbl  {np.dtype(sdt).name:8s}            "
              f"K={K} relerr={err:.2e}  {ms:7.2f} ms", flush=True)
        assert err < (3e-2 if bf16r else 1e-4), err

        # SYMMETRIC single-pass matvec: one S read, both directions
        from graphite_tpu.ops.pallas.segmv import matvec_sym_stream

        splan = plan_block_matvec(K, chunk=2048)
        kps = splan["k_pad"]
        rid = np.sort(rng.integers(0, NS, size=K)).astype(np.int32)
        cid2 = rng.integers(0, NS, size=K).astype(np.int32)
        lps = jnp.zeros((kps, M * KK), sdt)
        lps = jax.lax.dynamic_update_slice(lps, left.astype(sdt), (0, 0))
        cid_p = jnp.asarray(pack_chunk_ids(cid2, kps, 2048, fill=NS))
        rid_p = jnp.asarray(pack_chunk_ids(rid, kps, 2048, fill=NS))
        off = rid != cid2
        rxi_p = jnp.asarray(pack_chunk_ids(
            np.where(off, rid, NS), kps, 2048, fill=NS))
        yr, yc = jax.jit(
            lambda lp, xt, a, b, c: matvec_sym_stream(
                lp, xt, xt, a, b, c, splan, M, KK, NS, NS)
        )(lps, xtab, cid_p, rid_p, rxi_p)
        lf = left.astype(sdt).astype(jnp.float32)
        xf = x.astype(sdt).astype(jnp.float32)
        pf = flat_block_mv(lf, xf[jnp.asarray(cid2)], M, KK,
                           acc_dtype=jnp.float32)
        yr_ref = jax.ops.segment_sum(pf, jnp.asarray(rid), num_segments=NS)
        xg2 = jnp.where(jnp.asarray(off)[:, None], xf[jnp.asarray(rid)], 0.0)
        pt = flat_block_mv_t(lf, xg2, M, KK, acc_dtype=jnp.float32)
        yc_ref = jax.ops.segment_sum(pt, jnp.asarray(cid2), num_segments=NS)
        err = max(
            float(jnp.max(jnp.abs(yr - yr_ref))
                  / (1e-6 + jnp.max(jnp.abs(yr_ref)))),
            float(jnp.max(jnp.abs(yc - yc_ref))
                  / (1e-6 + jnp.max(jnp.abs(yc_ref)))))
        ms = loop_time(
            lambda xt, lp, a, b, c: matvec_sym_stream(
                lp, xt, xt, a, b, c, splan, M, KK, NS, NS)[0],
            xtab, lps, cid_p, rid_p, rxi_p)
        print(f"matvec_sym   {np.dtype(sdt).name:8s} both-dir   "
              f"K={K} relerr={err:.2e}  {ms:7.2f} ms "
              f"({K * (M * KK) * np.dtype(sdt).itemsize / ms / 1e6:.0f}"
              f" GB/s stream)", flush=True)
        assert err < (3e-2 if sdt == jnp.bfloat16 else 1e-5), err
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
