"""Natural-gradient updates for SVGP variational parameters.

GPflow pairs its SVGP with a NaturalGradient optimizer on (q_mu, q_sqrt) for
fast, parameterization-invariant variational updates (the "natural-gradient
option" of SURVEY.md §7.2 step 9). For a Gaussian variational family the
natural gradient of the ELBO is its ordinary gradient taken in *expectation*
parameters η, applied as a step in *natural* parameters θ:

    ξ = (m, L)            (q_mu, lower-triangular q_sqrt), per latent
    η = (m, S + m mᵀ),    S = L Lᵀ
    θ = (S⁻¹ m, −½ S⁻¹)
    θ ← θ + γ · dELBO/dη,  applied in the equivalent precision-space form
                            P' = S⁻¹ − 2γ g_S,  m' = m + γ P'⁻¹ g_m
                            (no η materialization — see per_latent)

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

    # Precision-space form of the θ-update (algebraically identical to
    # stepping θ ← θ + γ dELBO/dη, but never materializes the expectation
    # parameter η2 = S + m mᵀ): with g_S = dELBO/dS and g_m = dELBO/dm,
    #
    #     P' = S⁻¹ − 2γ g_S       (new precision)
    #     S' = P'⁻¹,  m' = m + γ S' g_m
    #
    # The η form computes S' via (η2' − η1'η1'ᵀ), a catastrophic f32
    # cancellation once the posterior tightens (S ≪ m mᵀ): measured on the
    # bench shape it goes non-PSD → NaN between steps 450-500 at γ=0.1.
    # The precision form has no such cancellation; matmul precision is
    # pinned to full f32 for the inv/cholesky round-trips (the TPU-default
    # single-bf16-pass matmul — same fix as ops/iterative.py's CG/Lanczos).
    def per_latent(m_p, L_p, dmu_p, dL_p):
        M = m_p.shape[0]
        eye = jnp.eye(M, dtype=m_p.dtype)
        L_p = jnp.tril(L_p)
        dL_p = jnp.tril(dL_p)
        Linv = jax.scipy.linalg.solve_triangular(L_p, eye, lower=True)
        Sinv = Linv.T @ Linv
        # g_S = dELBO/dS from the autodiff gradient wrt L via the chol VJP
        S = L_p @ L_p.T
        _, chol_vjp = jax.vjp(jnp.linalg.cholesky, 0.5 * (S + S.T))
        gS = chol_vjp(dL_p)[0]
        gS = 0.5 * (gS + gS.T)
        P_new = Sinv - 2.0 * gamma * gS
        P_new = 0.5 * (P_new + P_new.T) + 1e-12 * eye
        Pc = jnp.linalg.cholesky(P_new)
        S_new = jax.scipy.linalg.cho_solve((Pc, True), eye)
        S_new = 0.5 * (S_new + S_new.T)
        m_new = m_p + gamma * (S_new @ dmu_p)
        return m_new, jnp.linalg.cholesky(S_new)

    with jax.default_matmul_precision("float32"):
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
