"""Exact-GPR numerics vs closed-form reference implementations in numpy.

These are the golden tests the reference lacks (its GP math is never
unit-tested — SURVEY.md §4): log-marginal-likelihood and posterior mean/var
against direct dense formulas, plus property tests.
"""

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr
from portfoliooptgp_tpu.ops import linalg


def make_data(rng, n=30, d=1):
    X = rng.uniform(0, 5, size=(n, d))
    Y = np.sin(X.sum(-1, keepdims=True)) + 0.1 * rng.normal(size=(n, 1))
    return jnp.asarray(X), jnp.asarray(Y)


def np_lml(K, noise, Y):
    n = K.shape[0]
    Ks = K + noise * np.eye(n)
    L = np.linalg.cholesky(Ks)
    a = np.linalg.solve(Ks, Y)
    logdet = 2 * np.log(np.diag(L)).sum()
    return float(-0.5 * (Y * a).sum() - 0.5 * logdet - 0.5 * n * np.log(2 * np.pi))


def test_lml_matches_dense_formula(rng):
    X, Y = make_data(rng)
    kern = km.SquaredExponential.create(variance=1.4, lengthscales=0.9)
    model = gpr.GPR.create(kern, noise_variance=0.05)
    got = float(gpr.log_marginal_likelihood(model, X, Y))
    want = np_lml(np.asarray(kern.K(X)), float(model.likelihood.variance), np.asarray(Y))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_predict_f_matches_dense_formula(rng):
    X, Y = make_data(rng)
    Xnew = jnp.asarray(rng.uniform(0, 6, size=(9, 1)))
    kern = km.Matern32.create(variance=0.8, lengthscales=1.1)
    model = gpr.GPR.create(kern, noise_variance=0.02)

    mean, var = gpr.predict_f(model, X, Y, Xnew)
    K = np.asarray(kern.K(X)) + float(model.likelihood.variance) * np.eye(X.shape[0])
    Kmn = np.asarray(kern.K(X, Xnew))
    Kinv = np.linalg.inv(K)
    want_mean = Kmn.T @ Kinv @ np.asarray(Y)
    want_var = np.asarray(kern.Kdiag(Xnew)) - np.einsum("nm,nk,km->m", Kmn, Kinv, Kmn)
    np.testing.assert_allclose(mean, want_mean, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(var[:, 0], want_var, rtol=1e-6, atol=1e-10)


def test_predict_full_cov_diag_consistent(rng):
    X, Y = make_data(rng)
    Xnew = jnp.asarray(rng.uniform(0, 6, size=(9, 1)))
    model = gpr.GPR.create(km.SquaredExponential.create(), noise_variance=0.1)
    _, var = gpr.predict_f(model, X, Y, Xnew)
    _, cov = gpr.predict_f(model, X, Y, Xnew, full_cov=True)
    np.testing.assert_allclose(var[:, 0], np.diag(np.asarray(cov)), rtol=1e-8, atol=1e-12)


def test_predict_y_adds_noise(rng):
    X, Y = make_data(rng)
    model = gpr.GPR.create(km.SquaredExponential.create(), noise_variance=0.07)
    _, fvar = gpr.predict_f(model, X, Y, X)
    _, yvar = gpr.predict_y(model, X, Y, X)
    np.testing.assert_allclose(np.asarray(yvar - fvar), 0.07, rtol=1e-6)


def test_posterior_cache_matches_direct(rng):
    X, Y = make_data(rng)
    Xnew = jnp.asarray(rng.uniform(0, 6, size=(4, 1)))
    model = gpr.GPR.create(km.Matern12.create(), noise_variance=0.03)
    cache = gpr.posterior(model, X, Y)
    m1, v1 = gpr.predict_f(model, X, Y, Xnew, cache=cache)
    m2, v2 = gpr.predict_f(model, X, Y, Xnew)
    np.testing.assert_allclose(m1, m2, rtol=1e-12)
    np.testing.assert_allclose(v1, v2, rtol=1e-12)


def test_interpolation_at_tiny_noise(rng):
    """With σ²→0 the posterior mean interpolates the data (points spread out
    so K is well-conditioned; exact interpolation is ill-posed otherwise)."""
    X = jnp.asarray(np.linspace(0, 20, 10)[:, None])
    Y = jnp.asarray(np.sin(np.asarray(X)))
    model = gpr.GPR.create(
        km.SquaredExponential.create(lengthscales=0.5), noise_variance=1e-8
    )
    mean, var = gpr.predict_f(model, X, Y, X)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(Y), atol=1e-4)
    assert np.all(np.asarray(var) < 1e-3)


def test_mean_function_is_respected(rng):
    X, Y = make_data(rng)
    model = gpr.GPR.create(
        km.SquaredExponential.create(), noise_variance=0.1,
        mean_function=km.ConstantMean.create(3.0),
    )
    # far from data the posterior reverts to the mean function
    far = jnp.asarray([[100.0]])
    mean, _ = gpr.predict_f(model, X, Y, far)
    np.testing.assert_allclose(float(mean[0, 0]), 3.0, atol=1e-6)


def test_nll_grad_finite_and_vmappable(rng):
    X, Y = make_data(rng)
    models = [
        gpr.GPR.create(km.SquaredExponential.create(variance=v), noise_variance=0.1)
        for v in (0.5, 1.0, 2.0)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *models)
    losses = jax.vmap(lambda m: gpr.neg_log_marginal_likelihood(m, X, Y))(stacked)
    assert losses.shape == (3,)
    grads = jax.vmap(jax.grad(lambda m: gpr.neg_log_marginal_likelihood(m, X, Y)))(stacked)
    assert jnp.all(jnp.isfinite(grads.kernel.raw_variance))


def test_safe_cholesky_escalates(rng):
    # Rank-deficient matrix: plain cholesky NaNs, safe_cholesky recovers
    A = np.ones((5, 5))
    L, ok = linalg.safe_cholesky(jnp.asarray(A))
    assert bool(ok)
    assert np.all(np.isfinite(np.asarray(L)))


def test_guarded_cholesky_vjp_matches_autodiff(rng):
    # the closed-form Murray reverse-mode formula in _cholesky_nan_guarded
    # must agree with jax's own cholesky VJP (incl. symmetrization)
    A = rng.normal(size=(7, 7))
    K = jnp.asarray(A @ A.T + 7 * np.eye(7))
    ct = jnp.asarray(rng.normal(size=(7, 7)).astype(np.asarray(K).dtype))
    g_ref = jax.vjp(jnp.linalg.cholesky, K)[1](ct)[0]
    g_own = jax.vjp(linalg._cholesky_nan_guarded, K)[1](ct)[0]
    np.testing.assert_allclose(np.asarray(g_own), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_guarded_cholesky_failure_zero_grad(rng):
    # non-PSD input: L is NaN, ok is False, and the VJP is exactly zero
    # (not NaN) so masked restarts don't poison a vmapped batch
    Kbad = -jnp.eye(5) * 4.0

    def f(K):
        L, _ = linalg.cholesky_guarded(K)
        return jnp.sum(L)

    L, ok = linalg.cholesky_guarded(Kbad)
    assert not bool(ok)
    g = jax.grad(f)(Kbad)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_lml_under_jit(rng):
    X, Y = make_data(rng)
    model = gpr.GPR.create(km.SquaredExponential.create(), noise_variance=0.1)
    f = jax.jit(gpr.neg_log_marginal_likelihood)
    np.testing.assert_allclose(
        float(f(model, X, Y)), float(gpr.neg_log_marginal_likelihood(model, X, Y)), rtol=1e-10
    )


def test_cholesky_inverse_pair_vjp_matches_autodiff(rng):
    """The all-matmul backward of (L, W) = (chol K, L⁻¹) equals autodiff
    through jnp.linalg.cholesky + solve_triangular."""
    A = rng.normal(size=(12, 12))
    K = jnp.asarray(A @ A.T + 12 * np.eye(12))

    def via_pair(K):
        L, W = linalg.cholesky_inverse_pair(K)
        # touch both outputs asymmetrically so both cotangents are exercised
        return jnp.sum(L * jnp.arange(12.0)[None, :]) + jnp.sum(W ** 2)

    def via_autodiff(K):
        L = jnp.linalg.cholesky(K)
        W = jax.scipy.linalg.solve_triangular(L, jnp.eye(12), lower=True)
        return jnp.sum(L * jnp.arange(12.0)[None, :]) + jnp.sum(W ** 2)

    np.testing.assert_allclose(float(via_pair(K)), float(via_autodiff(K)),
                               rtol=1e-12)
    g1 = jax.grad(via_pair)(K)
    g2 = jax.grad(via_autodiff)(K)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-8, atol=1e-10)

    # failed factorization: NaN outputs, zero gradients
    Kbad = jnp.asarray(-np.eye(12))
    gbad = jax.grad(via_pair)(Kbad)
    assert bool(jnp.all(gbad == 0.0))
