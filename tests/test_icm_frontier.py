"""ICM multi-output GP (Kronecker inference) and the efficient frontier."""

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr, icm
from portfoliooptgp_tpu.portfolio.frontier import efficient_frontier
from portfoliooptgp_tpu.train import lbfgs


def make_mo_data(rng, n=30, p=3):
    X = jnp.asarray(np.sort(rng.uniform(0, 6, (n, 1)), 0))
    base = np.sin(np.asarray(X))
    loadings = rng.normal(size=(1, p)) * 0.8 + 1.0
    Y = base @ loadings + 0.1 * rng.normal(size=(n, p))
    return X, jnp.asarray(Y)


def dense_icm_nll(model, X, Y):
    """Reference NLL via the dense (NP × NP) Kronecker Gram matrix."""
    Kx = np.asarray(model.kernel.K(X))
    B = np.asarray(model.B)
    n, p = Y.shape
    Kfull = np.kron(B, Kx) + float(model.likelihood.variance) * np.eye(n * p)
    yv = np.asarray(Y).reshape(-1, order="F")  # vec = column stacking
    L = np.linalg.cholesky(Kfull)
    a = np.linalg.solve(Kfull, yv)
    return 0.5 * yv @ a + np.log(np.diag(L)).sum() + 0.5 * n * p * np.log(2 * np.pi)


def test_icm_nll_matches_dense(rng):
    X, Y = make_mo_data(rng)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(), num_outputs=3, rank=2, noise_variance=0.05,
        w_scale=0.5,
    )
    got = float(icm.neg_log_marginal_likelihood(model, X, Y))
    want = dense_icm_nll(model, X, Y)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_icm_p1_reduces_to_gpr(rng):
    X, Y = make_mo_data(rng, p=1)
    kern = km.Matern32.create()
    model = icm.ICMGPR.create(kern, num_outputs=1, rank=1, noise_variance=0.1, w_scale=0.0)
    # with W=0, kappa=1: B = [[1]], so ICM == plain GPR with the same kernel
    ref = gpr.GPR.create(kern, noise_variance=0.1)
    np.testing.assert_allclose(
        float(icm.neg_log_marginal_likelihood(model, X, Y)),
        float(gpr.neg_log_marginal_likelihood(ref, X, Y)),
        rtol=1e-7,
    )
    m1, v1 = icm.predict_f(model, X, Y, X[:5])
    m2, v2 = gpr.predict_f(ref, X, Y, X[:5])
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_icm_predict_matches_dense(rng):
    X, Y = make_mo_data(rng, n=20, p=2)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(), num_outputs=2, rank=1, noise_variance=0.05,
        w_scale=0.6,
    )
    Xnew = jnp.asarray(np.linspace(0, 6, 4)[:, None])
    mean, var = icm.predict_f(model, X, Y, Xnew)

    # dense reference
    Kx = np.asarray(model.kernel.K(X))
    B = np.asarray(model.B)
    n, p = Y.shape
    Kfull = np.kron(B, Kx) + float(model.likelihood.variance) * np.eye(n * p)
    Ks = np.asarray(model.kernel.K(X, Xnew))  # (N, M)
    Kcross = np.kron(B, Ks)  # (NP, MP)
    yv = np.asarray(Y).reshape(-1, order="F")
    alpha = np.linalg.solve(Kfull, yv)
    mean_dense = (Kcross.T @ alpha).reshape(-1, p, order="F")
    np.testing.assert_allclose(np.asarray(mean), mean_dense, atol=1e-6)

    kss = np.asarray(model.kernel.Kdiag(Xnew))
    Kinv = np.linalg.inv(Kfull)
    M = Xnew.shape[0]
    for m in range(M):
        for j in range(p):
            cross = np.kron(B[:, j], Ks[:, m])
            want = B[j, j] * kss[m] - cross @ Kinv @ cross
            np.testing.assert_allclose(float(var[m, j]), want, atol=1e-6)


def test_icm_trains_and_recovers_correlation(rng):
    X, Y = make_mo_data(rng, n=40, p=3)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(), num_outputs=3, rank=1, noise_variance=0.1,
        w_scale=0.3,
    )
    res = lbfgs.fit(
        lambda m: icm.neg_log_marginal_likelihood(m, X, Y), model, maxiter=300
    )
    trained = res.params
    assert float(res.loss) < float(icm.neg_log_marginal_likelihood(model, X, Y))
    # outputs share one latent factor => learned B strongly correlated in
    # magnitude (signs depend on the random loadings' signs)
    B = np.asarray(trained.B)
    corr = B / np.sqrt(np.outer(np.diag(B), np.diag(B)))
    assert np.abs(corr).min() > 0.5
    # learned noise near the generative truth 0.01
    assert 1e-3 < float(trained.likelihood.variance) < 0.1


def test_posterior_asset_moments_psd(rng):
    X, Y = make_mo_data(rng, n=25, p=4)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(), num_outputs=4, rank=2, noise_variance=0.05,
        w_scale=0.4,
    )
    mu, Sigma = icm.posterior_asset_moments(model, X, Y, X[-1:])
    assert mu.shape == (4,) and Sigma.shape == (4, 4)
    eig = np.linalg.eigvalsh(np.asarray(Sigma))
    assert eig.min() > 0
    np.testing.assert_allclose(np.asarray(Sigma), np.asarray(Sigma).T, atol=1e-10)


def test_efficient_frontier_properties():
    mu = np.array([0.02, 0.05, 0.08, 0.03])
    A = np.array([[0.04, 0.01, 0.0, 0.0], [0.01, 0.09, 0.02, 0.0],
                  [0.0, 0.02, 0.16, 0.01], [0.0, 0.0, 0.01, 0.05]])
    fr = efficient_frontier(mu, A, risk_free_rate=0.01, n_points=16)
    # frontier is increasing in volatility at the high-return end
    assert fr.volatilities[-1] > fr.volatilities[0]
    # weights on the simplex
    np.testing.assert_allclose(fr.weights.sum(axis=1), 1.0, atol=1e-5)
    assert fr.weights.min() > -1e-6
    # tangency Sharpe beats every frontier point's Sharpe
    sharpe = (fr.returns - 0.01) / np.maximum(fr.volatilities, 1e-12)
    t_sharpe = (fr.tangency_return - 0.01) / fr.tangency_volatility
    assert t_sharpe >= sharpe.max() - 1e-3
    # max-return corner: all weight on asset 3 (mu=0.08)
    np.testing.assert_allclose(fr.returns[-1], 0.08, atol=2e-3)


def test_icm_chol_nll_matches_eigh_value_and_grad(rng):
    """neg_log_marginal_likelihood_chol (eigh(B)-only + batched-Cholesky,
    the TPU NUTS/MLE path) equals the Kronecker-eigh NLL in value and
    gradient at a non-degenerate point."""
    import dataclasses

    from jax.flatten_util import ravel_pytree

    from portfoliooptgp_tpu.params import positive_inv

    X, Y = make_mo_data(rng, n=40, p=5)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(1.2, 0.8), num_outputs=5, rank=2,
        noise_variance=0.1, w_scale=0.5,
    )
    # distinct kappas: keep eigh(B) away from exact degeneracy so the plain
    # formula is a valid reference
    model = dataclasses.replace(
        model, raw_kappa=positive_inv(jnp.linspace(0.5, 2.0, 5)))

    a = float(icm.neg_log_marginal_likelihood(model, X, Y))
    b = float(icm.neg_log_marginal_likelihood_chol(model, X, Y))
    np.testing.assert_allclose(a, b, rtol=5e-6)
    ga, _ = ravel_pytree(
        jax.grad(lambda m: icm.neg_log_marginal_likelihood(m, X, Y))(model))
    gb, _ = ravel_pytree(
        jax.grad(lambda m: icm.neg_log_marginal_likelihood_chol(m, X, Y))(model))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-4 * float(np.abs(ga).max()))


def test_icm_gradients_finite_at_degenerate_B(rng):
    """The uniform-κ init leaves B with p − rank exactly-tied eigenvalues;
    safe_eigh (ops/linalg.py) must keep both NLL gradients finite there
    (plain eigh autodiff NaNs on the 1/(λi−λj) pullback)."""
    from jax.flatten_util import ravel_pytree

    X, Y = make_mo_data(rng, n=35, p=6)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(), num_outputs=6, rank=2,
        noise_variance=0.1,
    )  # default kappa=1 for all outputs -> 4 exactly-degenerate eigenvalues
    for fn in (icm.neg_log_marginal_likelihood,
               icm.neg_log_marginal_likelihood_chol):
        g, _ = ravel_pytree(jax.grad(lambda m: fn(m, X, Y))(model))
        assert bool(jnp.all(jnp.isfinite(g))), fn.__name__


def test_safe_eigh_matches_cholesky_grad():
    """safe_eigh's VJP equals the (eigh-free) Cholesky autodiff gradient for
    a spectral function, including at a matrix with repeated eigenvalues."""
    from jax.flatten_util import ravel_pytree

    from portfoliooptgp_tpu.ops.linalg import safe_eigh

    w = jnp.asarray(np.random.default_rng(5).normal(size=(6, 2)), jnp.float32)

    def logdet_eigh(w):
        B = w @ w.T + jnp.eye(6)  # 4 eigenvalues exactly 1
        lam, E = safe_eigh(B)
        return jnp.sum(jnp.log(lam))

    def logdet_chol(w):
        B = w @ w.T + jnp.eye(6)
        L = jnp.linalg.cholesky(B)
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    v1 = float(logdet_eigh(w)); v2 = float(logdet_chol(w))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    g1 = np.asarray(jax.grad(logdet_eigh)(w))
    g2 = np.asarray(jax.grad(logdet_chol)(w))
    assert np.all(np.isfinite(g1))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_icm_chol_moments_match_eigh(rng):
    """posterior_asset_moments_chol (the frontier pipeline's TPU path)
    equals the Kronecker-eigh moments."""
    import dataclasses

    from portfoliooptgp_tpu.params import positive_inv

    X, Y = make_mo_data(rng, n=45, p=5)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(1.1, 0.6), num_outputs=5, rank=2,
        noise_variance=0.1, w_scale=0.5,
    )
    model = dataclasses.replace(
        model, raw_kappa=positive_inv(jnp.linspace(0.5, 2.0, 5)))
    Xnew = X[-1:] + 0.1
    mu1, S1 = icm.posterior_asset_moments(model, X, Y, Xnew)
    mu2, S2 = icm.posterior_asset_moments_chol(model, X, Y, Xnew)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2),
                               rtol=1e-6, atol=1e-8)


def test_icm_chol_nll_fused_route_f32(rng):
    """In float32 with a bare isotropic kernel the chol NLL takes the fused
    stationary tier (interpret mode on CPU); parity vs the f64 eigh NLL."""
    X, Y = make_mo_data(rng, n=40, p=5)
    model = icm.ICMGPR.create(
        km.SquaredExponential.create(1.2, 0.8), num_outputs=5, rank=2,
        noise_variance=0.1, w_scale=0.5,
    )
    m32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
    X32 = jnp.asarray(X, jnp.float32)
    Y32 = jnp.asarray(Y, jnp.float32)
    got = float(icm.neg_log_marginal_likelihood_chol(m32, X32, Y32))
    want = float(icm.neg_log_marginal_likelihood(model, X, Y))
    np.testing.assert_allclose(got, want, rtol=2e-4)
    g = jax.grad(lambda m: icm.neg_log_marginal_likelihood_chol(m, X32, Y32))(m32)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
