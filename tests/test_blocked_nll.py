"""Blocked large-N Pallas NLL (ops/pallas/blocked_nll.py) vs dense reference.

Runs in interpreter mode on the CPU mesh (conftest forces cpu). N > 256
exercises the panel loop with more than one trailing update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

LOG2PI = np.log(2 * np.pi)


def _problem(B=8, N=320, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = (A @ np.swapaxes(A, 1, 2) / N).astype(np.float32)
    y = rng.normal(size=(B, N)).astype(np.float32)
    noise = np.linspace(0.3, 0.8, B).astype(np.float32)
    return K, y, noise


def _dense_ref(K, y, noise):
    N = K.shape[1]
    Ks = K.astype(np.float64) + noise[:, None, None] * np.eye(N)
    out = []
    for b in range(K.shape[0]):
        L = np.linalg.cholesky(Ks[b])
        a = np.linalg.solve(Ks[b], y[b].astype(np.float64))
        out.append(0.5 * y[b] @ a + np.log(np.diag(L)).sum() + 0.5 * N * LOG2PI)
    return np.array(out)


def test_blocked_nll_matches_dense():
    K, y, noise = _problem()
    nll = bn.batched_nll_blocked(jnp.asarray(K), jnp.asarray(y), jnp.asarray(noise))
    ref = _dense_ref(K, y, noise)
    np.testing.assert_allclose(np.asarray(nll), ref, rtol=2e-5)


def test_blocked_cholesky_factor():
    K, _, noise = _problem(B=8, N=256)
    Ks = K + noise[:, None, None] * np.eye(256, dtype=np.float32)
    L, logdet = bn.blocked_cholesky(jnp.asarray(Ks))
    L = np.asarray(L)
    # lower triangular and LL^T = Ks
    assert np.allclose(L, np.tril(L))
    np.testing.assert_allclose(L @ np.swapaxes(L, 1, 2), Ks, rtol=1e-4, atol=1e-4)
    ref_logdet = [np.log(np.diag(np.linalg.cholesky(Ks[b].astype(np.float64)))).sum()
                  for b in range(8)]
    np.testing.assert_allclose(np.asarray(logdet), ref_logdet, rtol=1e-5)


def test_blocked_nll_grads_match_xla():
    K, y, noise = _problem()
    N = K.shape[1]
    Kj, yj, nj = jnp.asarray(K), jnp.asarray(y), jnp.asarray(noise)

    def xla_nll(K, y, n):
        Ks = K + n[:, None, None] * jnp.eye(N, dtype=K.dtype)
        L = jnp.linalg.cholesky(Ks)
        a = jax.scipy.linalg.solve_triangular(L, y[..., None], lower=True)[..., 0]
        return (0.5 * jnp.sum(a * a, -1)
                + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
                + 0.5 * N * LOG2PI)

    g1 = jax.grad(lambda *a: jnp.sum(bn.batched_nll_blocked(*a)), argnums=(0, 1, 2))(Kj, yj, nj)
    g2 = jax.grad(lambda *a: jnp.sum(xla_nll(*a)), argnums=(0, 1, 2))(Kj, yj, nj)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_gpr_dispatch_routes_large_n_through_blocked():
    """batched_neg_log_marginal_likelihood at N>256 equals the XLA fallback."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(1)
    N = 300
    X = jnp.asarray(np.sort(rng.uniform(0, 50, (N, 1))), jnp.float32)
    Y = jnp.asarray(np.sin(np.asarray(X)) + 0.1 * rng.normal(size=(N, 1)), jnp.float32)
    ms = [gpr.GPR.create(km.SquaredExponential.create(variance=v, lengthscales=2.0),
                         noise_variance=0.1) for v in (0.5, 1.0)]
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lbfgs.stack_pytrees(ms))
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-4)


def test_blocked_triangular_inverse_matches_dense():
    """Hierarchical MXU block inversion equals numpy inv, including a
    non-power-of-two panel count (P=5 at N=640)."""
    from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

    rng = np.random.default_rng(3)
    for N in (512, 640):
        B = 8
        A = rng.normal(size=(B, N, N)) / np.sqrt(N)
        Ks = A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(N)
        L = jnp.asarray(np.linalg.cholesky(Ks).astype(np.float32))
        W = jax.jit(bn.blocked_triangular_inverse)(L)
        Wref = np.linalg.inv(np.asarray(L, np.float64))
        np.testing.assert_allclose(np.asarray(W), Wref, atol=5e-4)


def test_dispatch_tiers_above_blocked_cutoff():
    """256 < N <= 1024 -> blocked Pallas panels; 1024 < N <= 4096 -> the
    hierarchical-inverse tier; beyond -> XLA."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

    assert bn.blocked_nll_preferred(1024)
    assert not bn.blocked_nll_preferred(1025)
    assert bn.hinv_nll_preferred(1500) and bn.hinv_nll_preferred(4096)
    # the tier stays inside its measured win window (BENCH_NOTES round 4)
    assert not bn.hinv_nll_preferred(10963, b=1)
    assert not bn.hinv_nll_preferred(4096, b=64)  # HBM gate
    m = gpr.GPR.create(km.SquaredExponential.create(), noise_variance=0.1)
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32)[None],
                           m)
    X = jnp.zeros((1500, 1), jnp.float32)
    Y = jnp.zeros((1500, 1), jnp.float32)
    assert gpr.nll_tier(stacked, X, Y) == "blocked_hinv"
    X5 = jnp.zeros((5000, 1), jnp.float32)
    Y5 = jnp.zeros((5000, 1), jnp.float32)
    assert gpr.nll_tier(stacked, X5, Y5) == "xla"  # beyond the win window


def test_hinv_nll_matches_dense(rng):
    """The large-N hierarchical-inverse tier (XLA chol + blocked MXU
    triangular inverse, all-matmul backward) equals the dense NLL and its
    autodiff gradients, including the ragged-N padding path."""
    B, N = 3, 300
    X = np.sort(rng.uniform(0, 30, (N,)))
    d2 = (X[:, None] - X[None, :]) ** 2
    K = np.stack([v * np.exp(-0.5 * d2 / (2.0 + v)) for v in (0.5, 1.0, 2.0)])
    K = jnp.asarray(K, jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    noise = jnp.asarray([0.1, 0.05, 0.2], jnp.float32)

    def dense(K, y, noise):
        Ks = K + noise[:, None, None] * jnp.eye(N, dtype=K.dtype)
        L = jnp.linalg.cholesky(Ks)
        a = jax.scipy.linalg.solve_triangular(
            L, y[:, :, None], lower=True)[:, :, 0]
        return (0.5 * jnp.sum(a * a, -1)
                + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
                + 0.5 * N * jnp.log(2 * jnp.pi))

    got = np.asarray(bn.batched_nll_hinv(K, y, noise))
    want = np.asarray(dense(K, y, noise))
    np.testing.assert_allclose(got, want, rtol=2e-4)

    gf = jax.grad(lambda *a: jnp.sum(bn.batched_nll_hinv(*a)),
                  argnums=(0, 1, 2))(K, y, noise)
    gr = jax.grad(lambda *a: jnp.sum(dense(*a)), argnums=(0, 1, 2))(K, y, noise)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-3)


def test_triangular_inverse_uneven_matches_dense(rng):
    """The uneven-split recursive inverse (non-power-of-two panel counts,
    e.g. P=6 -> 4+2) equals numpy inv without power-of-two padding."""
    for N in (768, 640):  # P=6, P=5
        B = 2
        A = rng.normal(size=(B, N, N)) / np.sqrt(N)
        Ks = A @ np.swapaxes(A, -1, -2) + 2.0 * np.eye(N)
        L = jnp.asarray(np.linalg.cholesky(Ks).astype(np.float32))
        W = jax.jit(bn.triangular_inverse_uneven)(L)
        assert W.shape == (B, N, N)
        Wref = np.linalg.inv(np.asarray(L, np.float64))
        np.testing.assert_allclose(np.asarray(W), Wref, atol=5e-4)
