"""Matrix-free (CG + SLQ) GPR inference: solve exactness, logdet accuracy,
NLL + gradient agreement with the dense path within stochastic tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.ops import iterative


@pytest.fixture
def system(rng):
    n = 300
    X = np.sort(rng.uniform(0, 30, (n, 1)), 0)
    kern = km.SquaredExponential.create(variance=1.2, lengthscales=1.5)
    K = np.asarray(kern.K(jnp.asarray(X)))
    y = (np.sin(X) + 0.1 * rng.normal(size=(n, 1)))
    return jnp.asarray(K), jnp.asarray(y), 0.1


def test_cg_solves_exactly(system):
    K, y, s2 = system
    n = K.shape[0]
    Ks = K + s2 * jnp.eye(n)
    x, iters = iterative.batched_cg(lambda V: Ks @ V, y, tol=1e-10, maxiter=2000)
    want = np.linalg.solve(np.asarray(Ks), np.asarray(y))
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)
    assert int(iters) < 2000


def test_cg_multiple_rhs(system):
    K, y, s2 = system
    n = K.shape[0]
    Ks = K + s2 * jnp.eye(n)
    B = jnp.concatenate([y, 2 * y, jnp.ones_like(y)], axis=1)
    x, _ = iterative.batched_cg(lambda V: Ks @ V, B, tol=1e-10, maxiter=2000)
    want = np.linalg.solve(np.asarray(Ks), np.asarray(B))
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)


def test_slq_logdet_accuracy(system):
    K, y, s2 = system
    n = K.shape[0]
    Ks = K + s2 * jnp.eye(n)
    got = float(
        iterative.lanczos_logdet(
            lambda V: Ks @ V, n, jax.random.PRNGKey(0),
            num_probes=32, num_lanczos=48, dtype=Ks.dtype,
        )
    )
    want = float(np.linalg.slogdet(np.asarray(Ks))[1])
    # stochastic estimator: a few percent of |logdet|
    assert abs(got - want) / abs(want) < 0.05


def test_nll_cg_matches_dense(system):
    K, y, s2 = system
    n = K.shape[0]
    got = float(iterative.nll_cg(K, y, jnp.asarray(s2), jax.random.PRNGKey(0),
                                 32, 48, 1e-8))
    Ks = np.asarray(K) + s2 * np.eye(n)
    L = np.linalg.cholesky(Ks)
    a = np.linalg.solve(Ks, np.asarray(y))
    logdet = 2 * np.log(np.diag(L)).sum()
    want = float(
        0.5 * (np.asarray(y) * a).sum() + 0.5 * logdet
        + 0.5 * n * np.log(2 * np.pi)
    )
    # the only stochastic term is the SLQ logdet; the NLL itself can sit
    # near zero, so tolerance scales with |logdet|
    assert abs(got - want) < 0.02 * abs(logdet)


def test_nll_cg_gradients_match_dense(system):
    K, y, s2 = system
    n = K.shape[0]

    def dense_nll(K, y, noise):
        Ks = K + noise * jnp.eye(n)
        L = jnp.linalg.cholesky(Ks)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        return (
            0.5 * jnp.sum(y * a)
            + jnp.sum(jnp.log(jnp.diagonal(L)))
            + 0.5 * n * jnp.log(2 * jnp.pi)
        )

    # elementwise dK from a stochastic trace estimator is noisy by design;
    # what matters is the CONTRACTED gradient w.r.t. hyperparameters
    # (chain rule through dK/dθ averages the noise) and the noise gradient
    X = jnp.asarray(np.sort(np.random.default_rng(1).uniform(0, 30, (n, 1)), 0))

    def hyper_nll_dense(raw):
        kern = km.SquaredExponential.create(variance=1.0, lengthscales=1.0)
        import dataclasses

        kern = dataclasses.replace(kern, raw_variance=raw[0], raw_lengthscales=raw[1])
        return dense_nll(kern.K(X), y, jnp.asarray(s2))

    def hyper_nll_cg(raw, seed=0):
        kern = km.SquaredExponential.create(variance=1.0, lengthscales=1.0)
        import dataclasses

        kern = dataclasses.replace(kern, raw_variance=raw[0], raw_lengthscales=raw[1])
        return iterative.nll_cg(
            kern.K(X), y, jnp.asarray(s2), jax.random.PRNGKey(seed), 64, 48, 1e-8
        )

    raw0 = jnp.asarray([0.3, 0.8])
    g_dense = jax.grad(hyper_nll_dense)(raw0)
    # single-draw gradients carry O(1/sqrt(P)) stochastic-trace noise (this
    # is how BBMM trains: Adam-style optimizers average it); the contract is
    # UNBIASEDNESS — the mean over keys must converge to the dense gradient
    grads = [
        np.asarray(jax.grad(lambda r: hyper_nll_cg(r, k))(raw0))
        for k in range(8)
    ]
    np.testing.assert_allclose(np.mean(grads, axis=0), np.asarray(g_dense), rtol=0.1)

    _, gn_dense = jax.grad(dense_nll, argnums=(0, 2))(K, y, jnp.asarray(s2))
    _, gn_cg = jax.grad(
        lambda K, noise: iterative.nll_cg(K, y, noise, jax.random.PRNGKey(0),
                                          64, 48, 1e-8),
        argnums=(0, 1),
    )(K, jnp.asarray(s2))
    assert abs(float(gn_cg - gn_dense)) / abs(float(gn_dense)) < 0.05
    # gradient of y is deterministic (CG-exact)
    gy_dense = jax.grad(lambda y: dense_nll(K, y, jnp.asarray(s2)))(y)
    gy_cg = jax.grad(
        lambda y: iterative.nll_cg(K, y, jnp.asarray(s2), jax.random.PRNGKey(0),
                                   16, 32, 1e-8)
    )(y)
    np.testing.assert_allclose(np.asarray(gy_cg), np.asarray(gy_dense), atol=1e-5)


def test_pivoted_cholesky_approximates_K(system):
    K, y, s2 = system
    prev = np.inf
    for rank in (8, 32, 96):
        L = iterative.pivoted_cholesky(K, rank)
        err = float(jnp.linalg.norm(K - L @ L.T) / jnp.linalg.norm(K))
        assert err < prev + 1e-12, (rank, err, prev)
        prev = err
    assert prev < 1e-3  # SE kernels have fast spectral decay


def test_pcg_matches_cg_with_fewer_iterations(system):
    K, y, s2 = system
    Ks = K + s2 * jnp.eye(K.shape[0], dtype=K.dtype)
    matvec = lambda V: Ks @ V
    rhs = jnp.concatenate([y, jnp.ones_like(y)], axis=1)
    x_cg, it_cg = iterative.batched_cg(matvec, rhs, tol=1e-8, maxiter=1200)
    L = iterative.pivoted_cholesky(K, 48)
    prec = iterative.woodbury_preconditioner(L, jnp.asarray(s2, K.dtype))
    x_pcg, it_pcg = iterative.batched_pcg(matvec, prec, rhs, tol=1e-8,
                                          maxiter=1200)
    np.testing.assert_allclose(np.asarray(x_pcg), np.asarray(x_cg),
                               rtol=1e-5, atol=1e-6)
    assert int(it_pcg) < int(it_cg), (int(it_pcg), int(it_cg))


def test_nll_cg_preconditioned_matches_unpreconditioned(system):
    """Preconditioning changes only the logdet ESTIMATOR (split-SLQ on the
    whitened operator), never the quad term or the gradients: the CG solves
    converge to the same solution and the VJP trace probes are shared."""
    K, y, s2 = system
    n = K.shape[0]
    key = jax.random.PRNGKey(0)
    Ks = np.asarray(K) + s2 * np.eye(n)
    true_nll = (0.5 * float((np.asarray(y)
                             * np.linalg.solve(Ks, np.asarray(y))).sum())
                + np.log(np.diag(np.linalg.cholesky(Ks))).sum()
                + 0.5 * n * np.log(2 * np.pi))
    base = float(iterative.nll_cg(K, y, jnp.asarray(s2), key, 16, 32, 1e-8))
    pre = float(iterative.nll_cg(K, y, jnp.asarray(s2), key, 16, 32, 1e-8, 48))
    scale = max(abs(true_nll), 1.0)
    assert abs(pre - true_nll) / scale < 1e-3
    assert abs(base - true_nll) / scale < 1.0  # plain SLQ is far noisier
    gK_b = jax.grad(lambda K: iterative.nll_cg(
        K, y, jnp.asarray(s2), key, 16, 32, 1e-8))(K)
    gK_p = jax.grad(lambda K: iterative.nll_cg(
        K, y, jnp.asarray(s2), key, 16, 32, 1e-8, 48))(K)
    np.testing.assert_allclose(np.asarray(gK_p), np.asarray(gK_b),
                               rtol=1e-4, atol=1e-7)


def test_split_preconditioner_exact_logdet_and_apply(system):
    K, y, s2 = system
    n = K.shape[0]
    L = iterative.pivoted_cholesky(K, 48)
    app, ldP = iterative.split_preconditioner(L, jnp.asarray(s2))
    # apply twice == P^{-1}
    V = jnp.asarray(np.random.default_rng(1).normal(size=(n, 3)))
    PinvV = app(app(V))
    recon = L @ (L.T @ PinvV) + s2 * PinvV
    np.testing.assert_allclose(np.asarray(recon), np.asarray(V),
                               rtol=1e-4, atol=1e-4)
    Pd = np.asarray(L) @ np.asarray(L).T + s2 * np.eye(n)
    want = np.linalg.slogdet(Pd)[1]
    np.testing.assert_allclose(float(ldP), want, rtol=1e-4)


def test_nll_cg_split_slq_beats_plain_slq(system):
    """The whitened-operator SLQ should be dramatically more accurate at a
    small Lanczos budget: the preconditioner absorbs the spread spectrum."""
    K, y, s2 = system
    n = K.shape[0]
    Ks = np.asarray(K) + s2 * np.eye(n)
    Ld = np.linalg.cholesky(Ks)
    alpha = np.linalg.solve(Ks, np.asarray(y))
    true_nll = (0.5 * float((np.asarray(y) * alpha).sum())
                + np.log(np.diag(Ld)).sum() + 0.5 * n * np.log(2 * np.pi))
    key = jax.random.PRNGKey(0)
    plain = float(iterative.nll_cg(K, y, jnp.asarray(s2), key, 16, 8, 1e-8))
    split = float(iterative.nll_cg(K, y, jnp.asarray(s2), key, 16, 8, 1e-8, 48))
    err_plain = abs(plain - true_nll)
    err_split = abs(split - true_nll)
    assert err_split < 0.05 * max(err_plain, 1e-10), (err_plain, err_split)
    assert err_split / max(abs(true_nll), 1.0) < 1e-3
