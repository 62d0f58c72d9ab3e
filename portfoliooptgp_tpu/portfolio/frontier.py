"""Efficient frontier — a real constrained solve, not a sketch.

The reference's `efficient.py` draws a *synthetic* frontier/CAL illustration
with hard-coded curves (efficient.py:96-107; flagged in SURVEY.md §7.5).
Here the frontier is computed: for a grid of target returns, minimize
portfolio variance over the long-only simplex with a return floor — each
point is one run of the on-device solver, and the whole sweep is one vmap.
The tangency (max-Sharpe) portfolio comes from the same machinery.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu.portfolio.solver import minimize_simplex


class Frontier(NamedTuple):
    target_returns: np.ndarray
    returns: np.ndarray
    volatilities: np.ndarray
    weights: np.ndarray  # (n_points, P)
    tangency_weights: np.ndarray
    tangency_return: float
    tangency_volatility: float


def efficient_frontier(mu, Sigma, risk_free_rate=0.0, n_points: int = 32) -> Frontier:
    """Long-only efficient frontier over the simplex."""
    mu = jnp.asarray(np.asarray(mu, dtype=float))
    Sigma = jnp.asarray(np.asarray(Sigma, dtype=float))
    p = mu.shape[0]
    lo, hi = float(jnp.min(mu)), float(jnp.max(mu))
    targets = jnp.linspace(lo, hi, n_points)

    def solve_point(target):
        res = minimize_simplex(
            lambda w: jnp.sqrt(jnp.maximum(w @ Sigma @ w, 1e-18)),
            p,
            ineq=lambda w: mu @ w - target,
        )
        return res.weights

    weights = jax.vmap(solve_point)(targets)  # one vmapped sweep
    rets = weights @ mu
    vols = jnp.sqrt(jnp.maximum(jnp.einsum("np,pq,nq->n", weights, Sigma, weights), 0.0))

    tan = minimize_simplex(
        lambda w: -(mu @ w - risk_free_rate)
        / jnp.sqrt(jnp.maximum(w @ Sigma @ w, 1e-18)),
        p,
    )
    t_ret = float(mu @ tan.weights)
    t_vol = float(jnp.sqrt(jnp.maximum(tan.weights @ Sigma @ tan.weights, 0.0)))

    return Frontier(
        target_returns=np.asarray(targets),
        returns=np.asarray(rets),
        volatilities=np.asarray(vols),
        weights=np.asarray(weights),
        tangency_weights=np.asarray(tan.weights),
        tangency_return=t_ret,
        tangency_volatility=t_vol,
    )


def plot_frontier(frontier: Frontier, risk_free_rate=0.0, filename=None):
    """Frontier + capital-allocation line + tangency point (the real version
    of efficient.py's illustration)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(frontier.volatilities, frontier.returns, "-o", ms=3,
            color="#0065BD", label="efficient frontier")
    ax.scatter([frontier.tangency_volatility], [frontier.tangency_return],
               color="#E37222", zorder=5, label="tangency (max Sharpe)")
    xs = np.linspace(0, frontier.volatilities.max() * 1.1, 50)
    slope = (frontier.tangency_return - risk_free_rate) / max(
        frontier.tangency_volatility, 1e-12
    )
    ax.plot(xs, risk_free_rate + slope * xs, "--", color="#7F7F7F",
            label="capital allocation line")
    ax.set_xlabel("volatility")
    ax.set_ylabel("expected return")
    ax.legend()
    ax.grid(alpha=0.3)
    if filename:
        fig.savefig(filename, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig
