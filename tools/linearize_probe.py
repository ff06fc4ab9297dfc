"""Attribute linearize's on-chip cost at scale (VERDICT r4 item 2).

BENCH r4: linearize at Venice-Final = 333 ms moving ~15 GB for ~2 GB
logical — J blocks written/read 128-lane tile-padded. This probe times
the pipeline cumulatively and measures J *storage-format* variants for
step 1 (jacfwd + store):

  resid       residuals only (no jacobians)
  jac_flat    step 1 as shipped: per-slot flat (F, E*d) arrays
  jac_inflat  step 1 with the (E,d)->(E*d,) reshape INSIDE the vmapped
              factor fn (does XLA skip the tile-padded 3-D relayout?)
  jac_cat     step 1 writing ONE concatenated (F, sum E*d) array
  jac_packed  step 1 writing ONE dense-packed (F*D/128, 128) array
              (100%% lane occupancy — the slot-packed J candidate)
  lin_diag    steps 1-2 (+ Jacobi diag reduction)
  lin_scaled  steps 1-3 (+ scale & re-store J)
  linearize   the full pass (+ b)

Usage: python tools/linearize_probe.py [size] [N]
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
    import importlib

    lz = importlib.import_module("graphite_tpu.linearize")

    jax.config.update("jax_compilation_cache_dir", "/tmp/graphite_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ds = synthetic.make_bal(SIZE, seed=0)
    g, *_ = bal_io.build_graph(ds, precision=gt.FP32_FP32)
    problem = g.freeze()
    params = problem.params0
    (fname,) = problem.factor_meta.keys()
    fm = problem.factor_meta[fname]
    E = fm.ftype.residual_dim
    dims = [vt.dim for vt in fm.ftype.vertex_types]
    D = sum(E * d for d in dims)
    F = problem.data.factors[fname].factor_mask.shape[0]
    print(f"F={F} E={E} dims={dims} D={D}", flush=True)

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

    def probe(name, body, *args):
        def fn(*a):
            return jax.lax.fori_loop(
                0, N, lambda i, acc: body(i, acc, *a), jnp.float32(0))

        with jax.default_matmul_precision(
                problem.precision.matmul_precision):
            jax.eval_shape(fn, *args)

        def inner(consts, data, *a):
            with problem.bind_consts(consts), problem.bind_data(data), \
                    jax.default_matmul_precision(
                        problem.precision.matmul_precision):
                return fn(*a)

        try:
            compiled = jax.jit(inner).lower(
                problem.consts(), problem.data, *args).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            gb = float((ca or {}).get("bytes accessed", 0.0)) / N / 1e9
            jax.block_until_ready(
                compiled(problem.consts(), problem.data, *args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:<12} FAILED {type(e).__name__}: {e}", flush=True)
            return
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            jax.block_until_ready(
                compiled(problem.consts(), problem.data, *args))
            best = min(best, time.perf_counter() - t)
        ms = max(best * 1e3 - fl, 0.0) / N
        print(f"{name:<12} {ms:8.1f} ms   {gb:6.2f} GB/call "
              f"({gb * 1e3 / max(ms, 1e-9):5.1f} GB/s)", flush=True)
        return ms

    def fence(acc, tree):
        out = jax.lax.optimization_barrier((acc, tree))
        return out[0], out[1]

    def tap(acc, arrs):
        s = jnp.float32(0)
        for a in arrs:
            s = s + jnp.sum(a[0]).astype(jnp.float32)
        return acc + s * 1e-30

    # --- step-1 variants -------------------------------------------------
    def resid(i, acc, params):
        acc, p = fence(acc, params)
        r = lz.compute_residuals_block(problem, p, fname)
        return acc + jnp.sum(r[0]).astype(jnp.float32) * 1e-30

    def jac_flat(i, acc, params):
        acc, p = fence(acc, params)
        r, jf = lz._residuals_and_flat_jacobians(problem, p, fname)
        return tap(acc, (r,) + tuple(jf))

    CH = lz.LINEARIZE_CHUNK_LIMIT // 2

    def _chunked(compute, p, out_width):
        n_pad = (-F) % CH
        n_chunks = (F + n_pad) // CH

        def run_chunk(i):
            sl = jnp.minimum(jnp.arange(CH) + i * CH, F - 1)
            return compute(sl, p)

        r_c, j_c = jax.lax.map(run_chunk, jnp.arange(n_chunks))
        return (r_c.reshape(n_chunks * CH, -1)[:F],
                j_c.reshape(n_chunks * CH, -1) if out_width else j_c)

    def jac_inflat(i, acc, params):
        # reshape to flat INSIDE the vmapped per-factor fn
        acc, p = fence(acc, params)
        fa = problem.data.factors[fname]

        def compute(sl, p):
            sub = jax.tree.map(lambda a: a[sl], fa)
            gathered = tuple(
                p[vt.name][sub.ids[s]]
                for s, vt in enumerate(fm.ftype.vertex_types))
            gdt = problem.precision.graph_dtype

            def one(mask_row, *args):
                ps, rest = args[:fm.ftype.arity], args[fm.ftype.arity:]

                def gfun(deltas):
                    xs = tuple(
                        vt.retract(q, d) for vt, q, d in
                        zip(fm.ftype.vertex_types, ps, deltas))
                    return jnp.asarray(
                        fm.ftype.residual_fn(*xs, *rest)).reshape(E)

                zeros = tuple(jnp.zeros(vt.dim, dtype=gdt)
                              for vt in fm.ftype.vertex_types)
                r = gfun(zeros)
                J = jax.jacfwd(gfun)(zeros)
                jrow = jnp.concatenate([
                    (Ji * m).reshape(E * vt.dim)
                    for Ji, vt, m in zip(J, fm.ftype.vertex_types,
                                         mask_row)])
                return r, jrow

            tail = (sub.obs,) if sub.obs is not None else ()
            taxes = (0,) * len(tail)
            return jax.vmap(one, in_axes=(0,) + (0,) * fm.ftype.arity
                            + taxes)(sub.slot_mask, *gathered, *tail)

        r, jcat = _chunked(compute, p, True)
        return tap(acc, (r, jcat))

    def jac_packed(i, acc, params):
        # dense-packed (chunk*D/128, 128) rows per chunk
        acc, p = fence(acc, params)
        fa = problem.data.factors[fname]
        assert (CH * D) % 128 == 0

        def compute(sl, p):
            sub = jax.tree.map(lambda a: a[sl], fa)
            r, jf = lz._residual_and_jacobian_block(
                problem, p, fname, fa_override=sub)
            jcat = jnp.concatenate([
                (Ji * sub.slot_mask[:, s, None, None].astype(Ji.dtype)
                 ).reshape(CH, E * vt.dim)
                for s, (Ji, vt) in enumerate(
                    zip(jf, fm.ftype.vertex_types))], axis=1)
            return r, jcat.reshape(CH * D // 128, 128)

        n_pad = (-F) % CH
        n_chunks = (F + n_pad) // CH

        def run_chunk(ii):
            sl = jnp.minimum(jnp.arange(CH) + ii * CH, F - 1)
            return compute(sl, p)

        r_c, j_c = jax.lax.map(run_chunk, jnp.arange(n_chunks))
        jp = j_c.reshape(n_chunks * CH * D // 128, 128)
        return tap(acc, (r_c.reshape(n_chunks * CH, -1), jp))

    def lin_diag(i, acc, params):
        acc, p = fence(acc, params)
        r, jf = lz._residuals_and_flat_jacobians(problem, p, fname)
        gdt = problem.precision.graph_dtype
        accd = problem.precision.acc_dtype
        fa = problem.data.factors[fname]
        c2, dL = lz.compute_chi2_block(problem, fname,
                                       r.astype(gdt))
        out = []
        for s, vt in enumerate(fm.ftype.vertex_types):
            from graphite_tpu.ops.blockfmt import unflatten_blocks
            Ji = unflatten_blocks(jf[s], E, vt.dim).astype(accd)
            PJ = lz._apply_precision(fa, Ji, accd)
            contrib = jnp.einsum("fec,fec->fc", Ji, PJ,
                                 preferred_element_type=accd
                                 ) * dL.astype(accd)[:, None]
            out.append(lz._factor_row_reduce(
                problem, ("lindiag", fname, s), contrib.astype(gdt),
                fa, fname, s, vt.name, gdt))
        return tap(acc, tuple(out) + tuple(jf))

    def lin_full(i, acc, params):
        acc, p = fence(acc, params)
        lin = lz.linearize(problem, p)
        return acc + lin.chi2.astype(jnp.float32) * 1e-30

    probe("resid", resid, params)
    probe("jac_flat", jac_flat, params)
    probe("jac_inflat", jac_inflat, params)
    probe("jac_packed", jac_packed, params)
    probe("lin_diag", lin_diag, params)
    probe("linearize", lin_full, params)


if __name__ == "__main__":
    main()
