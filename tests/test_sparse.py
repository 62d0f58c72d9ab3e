"""Sparse/variational model correctness: bound properties (ELBO ≤ LML),
collapse-to-exact checks, minibatch unbiasedness, VGP ≡ GPR for Gaussian
likelihood."""

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr, sgpr, svgp, vgp
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.train import lbfgs


def make_data(rng, n=40):
    X = np.sort(rng.uniform(0, 6, size=(n, 1)), axis=0)
    Y = np.sin(X) + 0.1 * rng.normal(size=(n, 1))
    return jnp.asarray(X), jnp.asarray(Y)


def test_sgpr_elbo_below_lml(rng):
    X, Y = make_data(rng)
    kern = km.SquaredExponential.create(variance=1.0, lengthscales=1.0)
    m_exact = gpr.GPR.create(kern, noise_variance=0.05)
    m_sparse = sgpr.SGPR.create(kern, inducing_points=X[::4], noise_variance=0.05)
    lml = float(gpr.log_marginal_likelihood(m_exact, X, Y))
    bound = float(sgpr.elbo(m_sparse, X, Y))
    assert bound <= lml + 1e-8


def test_sgpr_with_all_inducing_matches_exact(rng):
    """Z = X collapses the Titsias bound to the exact LML."""
    X, Y = make_data(rng, n=25)
    kern = km.Matern32.create()
    m_exact = gpr.GPR.create(kern, noise_variance=0.1)
    m_sparse = sgpr.SGPR.create(kern, inducing_points=X, noise_variance=0.1)
    np.testing.assert_allclose(
        float(sgpr.elbo(m_sparse, X, Y)),
        float(gpr.log_marginal_likelihood(m_exact, X, Y)),
        rtol=1e-4,
    )
    # and predictions agree (up to the 1e-6 inducing jitter)
    Xnew = jnp.asarray(np.linspace(0, 6, 11)[:, None])
    ms, vs = sgpr.predict_f(m_sparse, X, Y, Xnew)
    me, ve = gpr.predict_f(m_exact, X, Y, Xnew)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(me), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(ve), atol=1e-4)


def test_svgp_elbo_below_lml_and_trains(rng):
    X, Y = make_data(rng)
    kern = km.SquaredExponential.create()
    model = svgp.SVGP.create(kern, inducing_points=np.linspace(0, 6, 15)[:, None],
                             likelihood=Gaussian.create(0.05))
    lml = float(gpr.log_marginal_likelihood(gpr.GPR.create(kern, 0.05), X, Y))
    assert float(svgp.elbo(model, X, Y)) <= lml

    # train variational params + hyperparams jointly, frozen likelihood
    frozen = lbfgs.freeze_leaves(model, likelihood=True)
    res = lbfgs.fit(lambda m: svgp.neg_elbo(m, X, Y), model, maxiter=200, frozen=frozen)
    trained_elbo = -float(res.loss)
    assert trained_elbo > float(svgp.elbo(model, X, Y))  # improved
    # (no bound vs lml here: the kernel hyperparameters moved during training)

    # posterior mean should track the data
    mean, var = svgp.predict_f(res.params, X)
    assert float(jnp.mean((mean - Y) ** 2)) < 0.05
    assert np.all(np.asarray(var) >= 0)


def test_gaussian_elbo_gram_matches_reference(rng):
    """The Gram-accumulation ELBO (no M×B trisolve) equals the per-point
    whitened path, values and gradients, with and without row weights."""
    X, Y = make_data(rng, n=60)
    model = svgp.SVGP.create(
        km.SquaredExponential.create(variance=1.3, lengthscales=0.8),
        inducing_points=X[::5],
        likelihood=Gaussian.create(0.07),
    )
    # non-trivial variational state so every term is exercised
    M = model.num_inducing
    import dataclasses
    model = dataclasses.replace(model,
        q_mu=jnp.asarray(rng.normal(size=(M, 1))),
        q_sqrt=jnp.asarray(np.tril(rng.normal(size=(1, M, M)) * 0.3
                                   + np.eye(M))),
    )

    ref = float(svgp.elbo(model, X, Y, num_data=100))
    got = float(svgp.gaussian_elbo_gram(model, X, Y, num_data=100))
    np.testing.assert_allclose(got, ref, rtol=1e-10)

    gref = jax.grad(lambda m: svgp.elbo(m, X, Y, num_data=100))(model)
    ggot = jax.grad(lambda m: svgp.gaussian_elbo_gram(m, X, Y, num_data=100))(model)
    for a, b in zip(jax.tree.leaves(ggot), jax.tree.leaves(gref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-8)

    # weighted form ≡ dropping the zero-weight rows
    w = jnp.asarray((np.arange(60) < 45).astype(np.float64))
    got_w = float(svgp.gaussian_elbo_gram(model, X, Y, weights=w, num_data=100))
    ref_w = float(svgp.elbo(model, X[:45], Y[:45], num_data=100))
    np.testing.assert_allclose(got_w, ref_w, rtol=1e-10)


def test_svgp_minibatch_unbiased(rng):
    """Scaled minibatch ELBOs over a disjoint partition average to the full
    ELBO (the property that makes data-sharding with psum exact)."""
    X, Y = make_data(rng, n=36)
    model = svgp.SVGP.create(
        km.SquaredExponential.create(), inducing_points=X[::6],
        likelihood=Gaussian.create(0.1),
    )
    full = float(svgp.elbo(model, X, Y, num_data=36))
    parts = [
        float(svgp.elbo(model, X[i::3], Y[i::3], num_data=36)) for i in range(3)
    ]
    np.testing.assert_allclose(np.mean(parts), full, rtol=1e-6)


def test_vgp_gaussian_matches_exact_gpr(rng):
    """With a Gaussian likelihood the optimal VGP equals exact GPR — the
    classic sanity check for the whitened variational machinery."""
    X, Y = make_data(rng, n=20)
    kern = km.SquaredExponential.create()
    m_exact = gpr.GPR.create(kern, noise_variance=0.1)
    model = vgp.VGP.create(20, kern, likelihood=Gaussian.create(0.1))
    # optimize only the variational parameters (freeze kernel + likelihood)
    frozen = lbfgs.freeze_leaves(model, kernel=True, likelihood=True)
    res = lbfgs.fit(lambda m: vgp.neg_elbo(m, X, Y), model, maxiter=500, frozen=frozen)

    lml = float(gpr.log_marginal_likelihood(m_exact, X, Y))
    np.testing.assert_allclose(-float(res.loss), lml, rtol=1e-4)

    Xnew = jnp.asarray(np.linspace(0, 6, 7)[:, None])
    mv, vv = vgp.predict_f(res.params, X, Xnew)
    me, ve = gpr.predict_f(m_exact, X, Y, Xnew)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(me), atol=2e-3)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(ve), atol=2e-3)


def test_vgp_studentt_elbo_finite_and_improves(rng):
    X, Y = make_data(rng, n=15)
    model = vgp.VGP.create(15, km.Matern32.create())
    frozen = lbfgs.freeze_leaves(model, kernel=True)
    res = lbfgs.fit(lambda m: vgp.neg_elbo(m, X, Y), model, maxiter=100, frozen=frozen)
    assert np.isfinite(float(res.loss))
    assert -float(res.loss) > float(vgp.elbo(model, X, Y))


def test_svgp_predict_full_cov_consistent(rng):
    X, Y = make_data(rng)
    model = svgp.SVGP.create(km.SquaredExponential.create(), inducing_points=X[::5])
    Xnew = X[:6]
    _, var = svgp.predict_f(model, Xnew)
    _, cov = svgp.predict_f(model, Xnew, full_cov=True)
    np.testing.assert_allclose(
        np.asarray(var[:, 0]), np.diag(np.asarray(cov[0])), atol=1e-10
    )
