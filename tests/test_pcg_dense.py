"""Whole-PCG VMEM Pallas kernel vs the XLA run_pcg loop (CPU coverage via
interpret mode; the real-kernel path runs on hardware in bench.py /
tools/tpu_checks.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphite_tpu.ops.pallas.pcg_dense as pcg_mod
from graphite_tpu.ops.pcg_loop import run_pcg


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pcg_mod.pl, "pallas_call",
        functools.partial(jax.experimental.pallas.pallas_call,
                          interpret=True))
    pcg_mod.dense_pcg.clear_cache()
    yield
    pcg_mod.dense_pcg.clear_cache()


def _random_spd(rng, n, d):
    """SPD S + its exact block-Jacobi inverse M (block size d)."""
    A = rng.standard_normal((n, n)).astype(np.float32)
    S = A @ A.T + n * np.eye(n, dtype=np.float32)
    M = np.zeros_like(S)
    for i in range(0, n, d):
        M[i:i + d, i:i + d] = np.linalg.inv(S[i:i + d, i:i + d])
    return S, M


@pytest.mark.parametrize("n,d,max_iter,tol", [
    (90, 9, 10, 1.0),     # BAL-like: converges in a few iterations
    (126, 9, 50, 1e-12),  # runs to max_iter / tiny tol
    (64, 4, 10, 1e30),    # converges on the first check
])
def test_matches_run_pcg(n, d, max_iter, tol):
    rng = np.random.default_rng(n)
    S, M = _random_spd(rng, n, d)
    b = rng.standard_normal(n).astype(np.float32)
    Sj, Mj, bj = jnp.asarray(S), jnp.asarray(M), jnp.asarray(b)

    ref = run_pcg(bj, lambda p: Sj @ p, lambda y: Mj @ y,
                  max_iter, tol, 5.0)
    out = pcg_mod.dense_pcg(Sj, Mj, bj, max_iter=max_iter, tol=tol,
                            rejection_ratio=5.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)


def test_rejection_path():
    """An indefinite system triggers the divergence rejection; both loops
    must restore the same x."""
    rng = np.random.default_rng(7)
    n = 64
    A = rng.standard_normal((n, n)).astype(np.float32)
    S = (A + A.T) / 2 - 1.5 * np.eye(n, dtype=np.float32)  # indefinite
    M = np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    Sj, Mj, bj = jnp.asarray(S), jnp.asarray(M), jnp.asarray(b)
    ref = run_pcg(bj, lambda p: Sj @ p, lambda y: Mj @ y, 25, 1e-12, 5.0)
    out = pcg_mod.dense_pcg(Sj, Mj, bj, max_iter=25, tol=1e-12,
                            rejection_ratio=5.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=1e-5)
