"""Simplex-constrained minimization on device (the scipy-SLSQP replacement).

Every portfolio solve in the reference is scipy SLSQP over the probability
simplex {w ≥ 0, Σw = 1} with at most one extra nonlinear inequality
(volatility cap at optimization/optimizer.py:178, return floor at :201).
TPU-native design (SURVEY.md §7.4 item 3):

- the simplex is parameterized by softmax(z), making the problem
  unconstrained in z (bounds and the equality constraint hold by
  construction),
- the remaining inequality g(w) ≥ 0 is handled with an augmented
  Lagrangian: fixed outer multiplier updates around an inner L-BFGS,
- everything is jit/vmap-compatible, so per-day / per-strategy solves batch
  (the reference loops days serially, Portfolio/portfolio.py:102-146).

Parity is by tolerance: same optimum as SLSQP on the reference's problems
(verified in tests against scipy), not iterate-for-iterate equality.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from portfoliooptgp_tpu.train import lbfgs


class SolveResult(NamedTuple):
    weights: jnp.ndarray
    objective: jnp.ndarray
    constraint_violation: jnp.ndarray


def simplex_project(w):
    """Euclidean projection onto the simplex (sorting algorithm) — used to
    clean up softmax outputs into exact boundary solutions."""
    n = w.shape[-1]
    u = jnp.sort(w)[..., ::-1]
    css = jnp.cumsum(u, axis=-1) - 1.0
    idx = jnp.arange(1, n + 1, dtype=w.dtype)
    cond = u - css / idx > 0
    rho = jnp.sum(cond, axis=-1)
    theta = jnp.take_along_axis(css, rho[..., None] - 1, axis=-1)[..., 0] / rho.astype(w.dtype)
    return jnp.maximum(w - theta[..., None], 0.0)


def minimize_simplex(
    objective: Callable,
    n_assets: int,
    ineq: Optional[Callable] = None,
    *,
    w0=None,
    inner_maxiter: int = 300,
    outer_iters: int = 10,
    penalty0: float = 50.0,
    penalty_growth: float = 2.0,
) -> SolveResult:
    """Minimize objective(w) over the simplex, with optional ineq(w) ≥ 0.

    Matches the reference's SLSQP setups: uniform start
    (optimization/optimizer.py:11), Σw=1, box [0,1]ⁿ, one nonlinear
    inequality.
    """
    dtype = jnp.result_type(float)
    if w0 is None:
        w0 = jnp.full((n_assets,), 1.0 / n_assets, dtype=dtype)
    z0 = jnp.log(jnp.maximum(jnp.asarray(w0, dtype=dtype), 1e-8))

    def weights_of(z):
        return jax.nn.softmax(z)

    if ineq is None:
        res = lbfgs.fit(lambda z: objective(weights_of(z)), z0, maxiter=inner_maxiter)
        w = weights_of(res.params)
        return SolveResult(
            weights=w, objective=objective(w), constraint_violation=jnp.asarray(0.0, dtype)
        )

    def al_step(carry, _):
        z, lam, rho = carry

        def al_obj(z):
            w = weights_of(z)
            g = ineq(w)  # feasible iff g >= 0
            # augmented Lagrangian for g(w) >= 0:  (ρ/2)·max(0, λ/ρ − g)² − λ²/(2ρ)
            t = jnp.maximum(0.0, lam / rho - g)
            return objective(w) + 0.5 * rho * jnp.sum(t * t) - jnp.sum(lam * lam) / (2 * rho)

        res = lbfgs.fit(al_obj, z, maxiter=inner_maxiter)
        z = res.params
        g = ineq(weights_of(z))
        lam = jnp.maximum(0.0, lam - rho * g)
        rho = rho * penalty_growth
        return (z, lam, rho), None

    g0 = jnp.atleast_1d(ineq(weights_of(z0)))
    lam0 = jnp.zeros_like(g0)
    (z, lam, rho), _ = jax.lax.scan(
        al_step, (z0, lam0, jnp.asarray(penalty0, dtype)), None, length=outer_iters
    )
    w = weights_of(z)
    viol = jnp.sum(jnp.maximum(0.0, -jnp.atleast_1d(ineq(w))))
    return SolveResult(weights=w, objective=objective(w), constraint_violation=viol)
