"""Trainer correctness: L-BFGS vs scipy on the same problems; restart/menu
selection semantics; frozen-parameter discipline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr
from portfoliooptgp_tpu.train import lbfgs, trainer


def test_lbfgs_rosenbrock():
    def rosen(p):
        x, y = p["x"], p["y"]
        return (1 - x) ** 2 + 100 * (y - x**2) ** 2

    res = lbfgs.fit(rosen, {"x": jnp.asarray(-1.2), "y": jnp.asarray(1.0)}, maxiter=200)
    np.testing.assert_allclose(float(res.params["x"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(res.params["y"]), 1.0, atol=1e-5)
    assert bool(res.converged)


def test_lbfgs_quadratic_exact():
    A = jnp.asarray([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.asarray([1.0, -1.0])

    def quad(x):
        return 0.5 * x @ A @ x - b @ x

    res = lbfgs.fit(quad, jnp.zeros(2), maxiter=50)
    want = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.params), want, atol=1e-8)


def test_lbfgs_vmapped_restarts():
    def f(x):
        return jnp.sum((x - 3.0) ** 2)

    inits = jnp.stack([jnp.zeros(2), jnp.ones(2) * 10, -jnp.ones(2)])
    res = lbfgs.fit_batched(f, inits, maxiter=50)
    assert res.params.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(res.params), 3.0, atol=1e-6)


def test_frozen_leaves_stay_fixed(rng):
    X = jnp.asarray(np.linspace(0, 6, 40)[:, None])
    Y = jnp.sin(X) + 0.05 * jnp.asarray(rng.normal(size=(40, 1)))
    model = gpr.GPR.create(km.SquaredExponential.create(), noise_variance=1e-5)
    raw_before = float(model.likelihood.raw_variance)
    t = trainer.train_model(model, X, Y, maxiter=100)
    assert float(t.model.likelihood.raw_variance) == raw_before  # frozen exactly
    # but kernel hyperparameters moved
    assert float(t.model.kernel.raw_variance) != float(model.kernel.raw_variance)


def test_gpr_mle_matches_scipy(rng):
    """Our on-device L-BFGS reaches the same optimum as scipy L-BFGS-B on the
    identical NLL (tolerance-based acceptance, SURVEY.md §7.4 item 2)."""
    X = jnp.asarray(np.linspace(0, 6, 35)[:, None])
    Y = jnp.sin(X) + 0.1 * jnp.asarray(rng.normal(size=(35, 1)))
    kern = km.SquaredExponential.create()
    model = gpr.GPR.create(kern, noise_variance=1e-5)
    frozen = lbfgs.freeze_leaves(model, likelihood=True)

    def loss(m):
        return gpr.neg_log_marginal_likelihood(m, X, Y)

    ours = lbfgs.fit(loss, model, maxiter=500, frozen=frozen)

    # scipy on the flattened free params (kernel raw variance+lengthscale)
    flat, unravel = jax.flatten_util.ravel_pytree(model.kernel)

    def scipy_obj(z):
        import dataclasses

        m = dataclasses.replace(model, kernel=unravel(jnp.asarray(z)))
        v, g = jax.value_and_grad(loss)(m)
        gflat, _ = jax.flatten_util.ravel_pytree(g.kernel)
        return float(v), np.asarray(gflat)

    sp = scipy.optimize.minimize(scipy_obj, np.asarray(flat), jac=True, method="L-BFGS-B")
    # The NLL is multimodal and line searches differ, so exact-iterate parity
    # is impossible (SURVEY.md §7.4 item 2); require we are at least as good,
    # and that our point is a genuine stationary point.
    assert float(ours.loss) <= sp.fun + 1e-5
    assert float(ours.grad_norm) < 1e-5


def test_train_likelihood_restart_selection(rng):
    X = jnp.asarray(np.linspace(0, 6, 30)[:, None])
    Y = jnp.sin(X) + 0.1 * jnp.asarray(rng.normal(size=(30, 1)))
    t = trainer.train_likelihood(X, Y, km.SquaredExponential.create(), maxiter=300)
    assert np.isfinite(float(t.loss))
    # trained likelihood variance should be near the true noise level 0.01
    assert 1e-4 < float(t.model.likelihood.variance) < 0.1


def test_train_best_model_menu(rng):
    X = jnp.asarray(np.linspace(0, 6, 25)[:, None])
    Y = jnp.sin(X)
    menu = [km.SquaredExponential.create(), km.Linear.create()]
    res = trainer.train_best_model(X, Y, menu, maxiter=100)
    # smooth sine: SE must beat a pure linear kernel on train MSE
    assert res.best_index == 0
    assert res.mses[0] < res.mses[1]


def test_fit_is_jittable():
    def f(x):
        return jnp.sum(x**2)

    jitted = jax.jit(lambda x0: lbfgs.fit(f, x0, maxiter=20).params)
    np.testing.assert_allclose(np.asarray(jitted(jnp.ones(3) * 5)), 0.0, atol=1e-8)
