"""Natural-gradient SVGP updates: one gamma=1 step is exact for Gaussian
likelihood (the defining property), and the alternating natgrad+Adam loop
improves the ELBO."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import sgpr, svgp
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.train import lbfgs, natgrad


def setup(rng, n=40, m=12):
    X = jnp.asarray(np.sort(rng.uniform(0, 6, (n, 1)), 0))
    Y = jnp.sin(X) + 0.1 * jnp.asarray(rng.normal(size=(n, 1)))
    kern = km.SquaredExponential.create(variance=1.2, lengthscales=0.8)
    model = svgp.SVGP.create(
        kern, inducing_points=np.linspace(0, 6, m)[:, None],
        likelihood=Gaussian.create(0.05),
    )
    return model, X, Y, kern


def test_one_natgrad_step_is_exact_for_gaussian(rng):
    """gamma=1 + Gaussian likelihood: the ELBO after one step equals the
    SGPR collapsed (optimal-q) bound at the same hyperparameters."""
    model, X, Y, kern = setup(rng)
    stepped = natgrad.natgrad_step(model, X, Y, num_data=X.shape[0], gamma=1.0)
    got = float(svgp.elbo(stepped, X, Y, num_data=X.shape[0]))
    collapsed = sgpr.SGPR.create(kern, inducing_points=model.Z, noise_variance=0.05)
    want = float(sgpr.elbo(collapsed, X, Y))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and a second step stays put (already optimal)
    stepped2 = natgrad.natgrad_step(stepped, X, Y, num_data=X.shape[0], gamma=1.0)
    np.testing.assert_allclose(
        float(svgp.elbo(stepped2, X, Y, num_data=X.shape[0])), got, rtol=1e-8
    )


def test_natgrad_beats_many_adam_steps(rng):
    """One natural-gradient step reaches a better ELBO than 100 Adam steps
    on the variational parameters."""
    model, X, Y, _ = setup(rng)
    n = X.shape[0]

    ng = natgrad.natgrad_step(model, X, Y, num_data=n, gamma=1.0)
    elbo_ng = float(svgp.elbo(ng, X, Y, num_data=n))

    opt = optax.adam(1e-2)
    var_params = (model.q_mu, model.q_sqrt)
    state = opt.init(var_params)

    def loss(vp):
        m = dataclasses.replace(model, q_mu=vp[0], q_sqrt=vp[1])
        return svgp.neg_elbo(m, X, Y, n)

    for _ in range(100):
        g = jax.grad(loss)(var_params)
        upd, state = opt.update(g, state)
        var_params = optax.apply_updates(var_params, upd)
    elbo_adam = -float(loss(var_params))
    assert elbo_ng > elbo_adam


def test_alternating_natgrad_adam_training(rng):
    model, X, Y, _ = setup(rng)
    n = X.shape[0]
    frozen = lbfgs.freeze_leaves(model, likelihood=True)
    init_fn, step_fn = natgrad.make_natgrad_train_step(
        n, optax.adam(1e-2), gamma=0.5, frozen_hyper=frozen
    )
    state = init_fn(model)
    first = None
    for _ in range(30):
        state, loss = step_fn(state, X, Y)
        first = first if first is not None else float(loss)
    assert float(loss) < first
    # likelihood stayed frozen
    np.testing.assert_allclose(
        float(state.model.likelihood.raw_variance),
        float(model.likelihood.raw_variance), rtol=0,
    )
