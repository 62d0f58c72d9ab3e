"""Hamiltonian Monte Carlo over parameter pytrees, with warmup adaptation.

Net-new vs the reference (which has no Bayesian sampler; TFP sits unused in
its requirements — SURVEY.md §2.1 last row). This module provides:

- leapfrog integration and a fixed-length HMC kernel on *flattened* params
  (pytree ↔ vector via ravel_pytree, so any model pytree works);
- dual-averaging step-size adaptation (Nesterov/Hoffman-Gelman) and diagonal
  mass-matrix estimation via Welford accumulators;
- optional cross-device averaging of adaptation statistics: pass
  `axis_name` when running under shard_map/vmap-with-axis so accept-stat and
  variance estimates are psum-shared across chains on different devices —
  the "cross-host step-size adaptation" of BASELINE.json.

The NUTS sampler (inference/nuts.py) reuses the leapfrog + adaptation here.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    gradient_avg: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def da_init(step_size: float) -> DualAveragingState:
    # preserve an array step size's dtype (f32 chains under x64 must not be
    # promoted — the step size multiplies positions in the leapfrog)
    ss = jnp.asarray(step_size)
    if not jnp.issubdtype(ss.dtype, jnp.floating):
        ss = ss.astype(jnp.result_type(float))
    return DualAveragingState(
        log_step=jnp.log(ss),
        log_step_avg=jnp.log(ss),
        gradient_avg=jnp.zeros_like(ss),
        t=jnp.asarray(0.0, ss.dtype),
        mu=jnp.log(10.0 * ss),
    )


def da_update(state: DualAveragingState, accept_prob, target: float = 0.8,
              gamma: float = 0.05, t0: float = 10.0, kappa: float = 0.75):
    t = state.t + 1.0
    g = target - accept_prob
    gradient_avg = (1.0 - 1.0 / (t + t0)) * state.gradient_avg + g / (t + t0)
    log_step = state.mu - jnp.sqrt(t) / gamma * gradient_avg
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, gradient_avg, t, state.mu)


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray  # (dim,) diagonal or (dim, dim) dense second-moment sum
    count: jnp.ndarray


def welford_init(dim: int, dtype=None, dense: bool = False) -> WelfordState:
    dtype = dtype or jnp.result_type(float)
    m2 = jnp.zeros((dim, dim) if dense else (dim,), dtype)
    return WelfordState(
        mean=jnp.zeros((dim,), dtype), m2=m2,
        count=jnp.asarray(0.0, dtype),
    )


def welford_update(state: WelfordState, x) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    if state.m2.ndim == 2:
        m2 = state.m2 + jnp.outer(delta, x - mean)
    else:
        m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState, axis_name: Optional[str] = None,
                     regularize: bool = True):
    """Diagonal variance estimate; with axis_name, moments are combined
    across devices (parallel-chain cross-host adaptation)."""
    mean, m2, count = state.mean, state.m2, state.count
    if axis_name is not None:
        n_dev = jax.lax.psum(1, axis_name)
        total = count * n_dev
        gmean = jax.lax.pmean(mean, axis_name)
        # combine M2 across shards: Σ m2_i + Σ n_i (mean_i - gmean)⊗²
        d = mean - gmean
        between = jnp.outer(d, d) if m2.ndim == 2 else d * d
        m2 = jax.lax.psum(m2 + count * between, axis_name)
        count = total
    var = m2 / jnp.maximum(count - 1.0, 1.0)
    if regularize:
        # Stan-style shrinkage toward unit scale for small samples
        w = count / (count + 5.0)
        if var.ndim == 2:
            dim = var.shape[0]
            var = w * var + (1.0 - w) * 1e-3 * jnp.eye(dim, dtype=var.dtype)
        else:
            var = w * var + (1.0 - w) * 1e-3
    return var


def velocity(inv_mass, p):
    """v = M⁻¹ p for a diagonal (dim,) or dense (dim, dim) inverse mass."""
    return inv_mass @ p if inv_mass.ndim == 2 else inv_mass * p


def mass_chol(inv_mass):
    """Factor used to draw momenta p ~ N(0, M): with Σ = M⁻¹ = L Lᵀ,
    p = L⁻ᵀ ξ. Diagonal metrics return the (dim,) sqrt vector; dense ones
    the lower Cholesky of Σ. Computed ONCE when the metric is (re)set, not
    per transition."""
    if inv_mass.ndim == 2:
        return jnp.linalg.cholesky(inv_mass)
    return jnp.sqrt(inv_mass)


def sample_momentum(key, inv_mass, chol=None, *, shape=None, dtype=None):
    """Draw p ~ N(0, M) for the metric M = inv_mass⁻¹."""
    if chol is None:
        chol = mass_chol(inv_mass)
    dim = inv_mass.shape[0]
    xi = jax.random.normal(key, shape or (dim,), dtype or inv_mass.dtype)
    if inv_mass.ndim == 2:
        return jax.scipy.linalg.solve_triangular(chol.T, xi, lower=False)
    return xi / chol


def leapfrog(grad_fn: Callable, q, p, step_size, inv_mass, num_steps):
    """Standard velocity-Verlet integration of H = -logp(q) + ½ pᵀ M⁻¹ p."""

    def body(_, carry):
        q, p, g = carry
        p_half = p + 0.5 * step_size * g  # g = ∇logp
        q_new = q + step_size * velocity(inv_mass, p_half)
        g_new = grad_fn(q_new)
        p_new = p_half + 0.5 * step_size * g_new
        return q_new, p_new, g_new

    g0 = grad_fn(q)
    return jax.lax.fori_loop(0, num_steps, body, (q, p, g0))


def kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * velocity(inv_mass, p))


class HMCState(NamedTuple):
    q: jnp.ndarray
    logp: jnp.ndarray
    key: jnp.ndarray


def hmc_step(logp_fn, grad_fn, state: HMCState, step_size, inv_mass, num_steps):
    key, k_mom, k_acc = jax.random.split(state.key, 3)
    p0 = sample_momentum(k_mom, inv_mass, shape=state.q.shape,
                         dtype=state.q.dtype)
    q_new, p_new, _ = leapfrog(grad_fn, state.q, p0, step_size, inv_mass, num_steps)
    logp_new = logp_fn(q_new)
    h0 = -state.logp + kinetic(p0, inv_mass)
    h1 = -logp_new + kinetic(p_new, inv_mass)
    accept_prob = jnp.minimum(1.0, jnp.exp(h0 - h1))
    accept_prob = jnp.where(jnp.isfinite(h1), accept_prob, 0.0)
    accept = jax.random.uniform(k_acc) < accept_prob
    q = jnp.where(accept, q_new, state.q)
    logp = jnp.where(accept, logp_new, state.logp)
    return HMCState(q, logp, key), accept_prob


def find_reasonable_step_size(logp_fn, grad_fn, q, inv_mass, key, init=1.0):
    """Double/halve until the one-step acceptance crosses 0.5
    (Hoffman & Gelman Alg. 4)."""
    p = sample_momentum(key, inv_mass, shape=q.shape, dtype=q.dtype)
    h0 = -logp_fn(q) + kinetic(p, inv_mass)

    def energy_at(eps):
        q1, p1, _ = leapfrog(grad_fn, q, p, eps, inv_mass, 1)
        return -logp_fn(q1) + kinetic(p1, inv_mass)

    eps = jnp.asarray(init, q.dtype)
    delta = h0 - energy_at(eps)
    direction = jnp.where(delta > jnp.log(0.5), 1.0, -1.0)

    def cond(carry):
        eps, it = carry
        delta = h0 - energy_at(eps)
        keep = jnp.where(direction > 0, delta > jnp.log(0.5), delta < jnp.log(0.5))
        return keep & (it < 50) & jnp.isfinite(delta)

    def body(carry):
        eps, it = carry
        return eps * jnp.where(direction > 0, 2.0, 0.5), it + 1

    eps, _ = jax.lax.while_loop(cond, body, (eps, jnp.asarray(0)))
    return eps
