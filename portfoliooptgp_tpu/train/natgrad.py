"""Natural-gradient updates for SVGP variational parameters.

GPflow pairs its SVGP with a NaturalGradient optimizer on (q_mu, q_sqrt) for
fast, parameterization-invariant variational updates (the "natural-gradient
option" of SURVEY.md §7.2 step 9). For a Gaussian variational family the
natural gradient of the ELBO is its ordinary gradient taken in *expectation*
parameters η, applied as a step in *natural* parameters θ:

    ξ = (m, L)            (q_mu, lower-triangular q_sqrt), per latent
    η = (m, S + m mᵀ),    S = L Lᵀ
    θ = (S⁻¹ m, −½ S⁻¹)
    θ ← θ − γ · dELBO/dη,  with dL/dη = (∂ξ/∂η)ᵀ dL/dξ   (one JAX vjp
                            through the closed-form η → θ → ξ map)

With a Gaussian likelihood and γ = 1, one step lands exactly on the optimal
q(u) for the current hyperparameters (tested against the SGPR collapsed
bound). The standard training loop alternates this step with Adam on the
hyperparameters.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from portfoliooptgp_tpu.models import svgp as svgp_mod


def _xi_of_theta(theta1, theta2):
    """θ → ξ: S = −½ θ2⁻¹, m = S θ1, L = chol(S)."""
    M = theta1.shape[0]
    S = -0.5 * jnp.linalg.inv(theta2)
    S = 0.5 * (S + S.T) + 1e-12 * jnp.eye(M, dtype=S.dtype)
    m = S @ theta1
    L = jnp.linalg.cholesky(S)
    return m, L


def _theta_of_xi(m, L):
    M = m.shape[0]
    S = L @ L.T
    Sinv = jnp.linalg.inv(S + 1e-12 * jnp.eye(M, dtype=S.dtype))
    return Sinv @ m, -0.5 * Sinv


def _theta_of_eta(eta1, eta2):
    M = eta1.shape[0]
    S = eta2 - jnp.outer(eta1, eta1)
    S = 0.5 * (S + S.T) + 1e-12 * jnp.eye(M, dtype=S.dtype)
    Sinv = jnp.linalg.inv(S)
    return Sinv @ eta1, -0.5 * Sinv


def _xi_of_eta(eta1, eta2):
    return _xi_of_theta(*_theta_of_eta(eta1, eta2))


def natgrad_step(model, X, Y, *, num_data: Optional[int] = None, gamma: float = 1.0,
                 weights=None):
    """One natural-gradient step on (q_mu, q_sqrt), hyperparameters fixed.
    Returns the updated model."""

    def elbo_of_xi(q_mu, q_sqrt):
        m = dataclasses.replace(model, q_mu=q_mu, q_sqrt=q_sqrt)
        if weights is not None:
            ve = svgp_mod.predict_f_guarded(m, X)
            mean, var = ve
            lp = m.likelihood.variational_expectations(mean, var, Y)
            scale = 1.0 if num_data is None else num_data / jnp.sum(weights)
            return jnp.sum(lp * weights[:, None]) * scale - svgp_mod.prior_kl(m)
        return svgp_mod.elbo(m, X, Y, num_data)

    dmu, dsqrt = jax.grad(elbo_of_xi, argnums=(0, 1))(model.q_mu, model.q_sqrt)

    def per_latent(m_p, L_p, dmu_p, dL_p):
        L_p = jnp.tril(L_p)
        dL_p = jnp.tril(dL_p)
        theta1, theta2 = _theta_of_xi(m_p, L_p)
        # dELBO/dη via one vjp through the closed-form map η → ξ at current η
        eta1 = m_p
        eta2 = L_p @ L_p.T + jnp.outer(m_p, m_p)
        _, vjp = jax.vjp(_xi_of_eta, eta1, eta2)
        deta1, deta2 = vjp((dmu_p, dL_p))
        new_theta1 = theta1 + gamma * deta1
        new_theta2 = theta2 + gamma * 0.5 * (deta2 + deta2.T)
        return _xi_of_theta(new_theta1, new_theta2)

    new_mu_cols, new_L = jax.vmap(per_latent, in_axes=(1, 0, 1, 0))(
        model.q_mu, model.q_sqrt, dmu, dsqrt
    )
    new_mu = new_mu_cols.T  # (M, P)
    return dataclasses.replace(model, q_mu=new_mu, q_sqrt=new_L)


class NatGradState(NamedTuple):
    model: object
    opt_state: object


def make_natgrad_train_step(num_data, hyper_optimizer, gamma: float = 0.1,
                            frozen_hyper=None):
    """(init_fn, step_fn): each step = natural-gradient update of the
    variational parameters followed by an Adam-style update of everything
    else (the GPflow NaturalGradient + Adam recipe)."""
    import optax

    def init_fn(model):
        return NatGradState(model=model, opt_state=hyper_optimizer.init(model))

    @jax.jit
    def step_fn(state: NatGradState, X, Y):
        model = natgrad_step(state.model, X, Y, num_data=num_data, gamma=gamma)
        loss, grads = jax.value_and_grad(
            lambda m: svgp_mod.neg_elbo(m, X, Y, num_data)
        )(model)
        # hyperparameter step only: zero variational-param grads
        grads = dataclasses.replace(
            grads,
            q_mu=jnp.zeros_like(grads.q_mu),
            q_sqrt=jnp.zeros_like(grads.q_sqrt),
        )
        if frozen_hyper is not None:
            grads = jax.tree.map(
                lambda g, m: jnp.zeros_like(g) if m else g, grads, frozen_hyper
            )
        updates, opt_state = hyper_optimizer.update(grads, state.opt_state, model)
        model = optax.apply_updates(model, updates)
        return NatGradState(model=model, opt_state=opt_state), loss

    return init_fn, step_fn
