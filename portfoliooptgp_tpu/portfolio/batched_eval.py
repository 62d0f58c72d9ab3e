"""Batched per-day portfolio evaluation (SURVEY.md §2.3 walk-forward axis).

The reference walks the prediction horizon day by day, building that day's
cumulative moments and calling scipy SLSQP once per day
(Portfolio/portfolio.py:102-146). Here every day's moments are precomputed as
(D, A) arrays and the per-day solves execute on device in ONE jit call:

- `min_volatility` has no day-to-day coupling (the reference quirk omits the
  transaction penalty from `uncertainty_objective`,
  optimization/optimizer.py:167-175), so its solves vmap over the day axis;
- `sharpe` and `max_return` carry the previous day's weights through the
  transaction penalty (optimization/optimizer.py:81-93), so their solves run
  in a `lax.scan` with the same roll-forward semantics as the sequential
  path — still one compiled call, no host round-trips;
- `constant` is closed-form (uniform);
- `dynamic` stays on the sequential path in `Portfolio.evaluate_portfolio`
  (its regime switch consumes the previous day's *solution* and, in the MC
  variant, host-side draws — Strategies/dynamic_strategy.py:95-133).

Same objectives, same solver (`minimize_simplex`), so solutions match the
sequential path; asserted in tests on the reference's 5-day config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu.portfolio.optimizer import (
    l1_l2_penalty,
    sharpe_objective,
    transaction_penalty,
)
from portfoliooptgp_tpu.portfolio.solver import minimize_simplex

#: Strategies whose full horizon is solvable in one jit call.
BATCHABLE_STRATEGIES = ("constant", "sharpe", "max_return", "min_volatility")


def day_moments(returns, variances, is_log_return: bool):
    """Per-day (mu, var) arrays for the whole horizon, shape (D, A) each.

    Replicates the sequential path's per-day optimizer state: day 0 uses the
    single-day prediction (set_predictions, optimization/optimizer.py:20-23);
    later days use cumulative predictions — summed log-returns
    (set_cml_log_return, :42-56) or compounded returns Π(1+r)−1
    (set_predictions_cml, :25-40) — with summed variances. Day 0 coincides
    with the cumulative prefix of length 1 in both variants, so the result
    is simply the running cumulative.
    """
    R = np.concatenate(
        [np.asarray(r, dtype=float).reshape(-1, 1) for r in returns], axis=1
    )  # (D, A)
    V = np.concatenate(
        [np.asarray(v, dtype=float).reshape(-1, 1) for v in variances], axis=1
    )
    if is_log_return:
        mu = np.cumsum(R, axis=0)
    else:
        mu = np.cumprod(1.0 + R, axis=0) - 1.0
    var = np.cumsum(V, axis=0)
    return mu, var


@partial(jax.jit, static_argnames=("strategy", "if_tx"))
def solve_horizon(
    strategy: str,
    mu,
    var,
    prev0,
    r_f,
    lambda_l1,
    lambda_l2,
    lambda_tx,
    max_volatility,
    min_return,
    if_tx: bool = True,
):
    """Solve every day of the horizon in one compiled call.

    Args: mu/var (D, A) per-day moments (diagonal covariances, matching the
    sequential path where the solver's Sigma is always diag —
    Portfolio/portfolio.py:119,131-133), prev0 the previous-weights seed for
    the transaction penalty chain.
    Returns (weights (D, A), ret (D,), vol (D,)) with ret/vol as in
    `calculate_portfolio_performance` (optimization/optimizer.py:236-242).
    """
    mu = jnp.asarray(mu)
    var = jnp.asarray(var)
    n = mu.shape[1]

    if strategy == "constant":
        W = jnp.full_like(mu, 1.0 / n)
    elif strategy == "min_volatility":
        # uncertainty_objective has no tx penalty -> days are independent
        def solve_day(mu_d, var_d):
            Sigma = jnp.diag(var_d)
            obj = lambda w: (
                jnp.sqrt(jnp.maximum(w @ Sigma @ w, 1e-18))
                + l1_l2_penalty(w, lambda_l1, lambda_l2)
            )
            ineq = lambda w: mu_d @ w - min_return
            return minimize_simplex(obj, n, ineq).weights

        W = jax.vmap(solve_day)(mu, var)
    elif strategy in ("sharpe", "max_return"):
        # tx penalty couples consecutive days -> scan carrying prev weights
        def step(prev, x):
            mu_d, var_d = x
            Sigma = jnp.diag(var_d)

            def pen(w):
                p = l1_l2_penalty(w, lambda_l1, lambda_l2)
                if if_tx:
                    p = p + transaction_penalty(w, prev, lambda_tx)
                return p

            if strategy == "sharpe":
                obj = lambda w: sharpe_objective(w, mu_d, Sigma, r_f) + pen(w)
                w = minimize_simplex(obj, n).weights
            else:
                obj = lambda w: -(mu_d @ w) + pen(w)
                ineq = lambda w: max_volatility - jnp.sqrt(
                    jnp.maximum(w @ Sigma @ w, 1e-18)
                )
                w = minimize_simplex(obj, n, ineq).weights
            return w, w

        _, W = jax.lax.scan(step, jnp.asarray(prev0, mu.dtype), (mu, var))
    else:
        raise ValueError(f"strategy {strategy!r} is not batchable")

    ret = jnp.einsum("da,da->d", mu, W)
    vol = jnp.sqrt(jnp.maximum(jnp.einsum("da,da->d", W * W, var), 0.0))
    return W, ret, vol
