"""Allocation strategies (Strategies/ + strategies/ parity, unified into one
canonical lowercase module — the reference's split-casing directories only
import on case-insensitive filesystems, SURVEY.md §7.5).

Five strategies (Portfolio/portfolio.py:41-47):
- constant: uniform weights every day (Strategies/constant_baseline_strategy.py:24)
- sharpe: maximize Sharpe ratio (strategies/sharpe_strategy.py:12-28)
- max_return: maximize return under a volatility cap (max_return_strategy.py:9-25)
- min_volatility: minimize volatility under a return floor (min_volatility_strategy.py:9-25)
- dynamic: expected-return regime switch with transaction-cost-aware revert
  (Strategies/dynamic_strategy.py:95-133)
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from portfoliooptgp_tpu.portfolio.montecarlo import probability_a_greater_than_b_mvnorm
from portfoliooptgp_tpu.portfolio.optimizer import PortfolioOptimizer


class Strategy(ABC):
    """Base strategy (strategies/strategy.py:4-49)."""

    def __init__(self, broker_fee: float = 0.0, apply_broker_fee: bool = False):
        self.broker_fee = broker_fee
        self.apply_broker_fee_flag = apply_broker_fee

    def apply_broker_fee(self, weights):
        if self.apply_broker_fee_flag and self.broker_fee > 0:
            return weights * (1.0 - self.broker_fee)
        return weights

    @abstractmethod
    def optimize(self, optimizer: PortfolioOptimizer, max_volatility, min_return, **kw):
        ...


class ConstantStrategy(Strategy):
    def optimize(self, optimizer, max_volatility, min_return, **kw):
        n = optimizer.n_assets
        return np.full(n, 1.0 / n)


class SharpeRatioStrategy(Strategy):
    def optimize(self, optimizer, max_volatility, min_return, **kw):
        return optimizer.optimize_portfolio()


class MaxReturnStrategy(Strategy):
    def optimize(self, optimizer, max_volatility, min_return, **kw):
        return optimizer.maximize_returns(max_volatility=max_volatility)


class MinVolatilityStrategy(Strategy):
    def optimize(self, optimizer, max_volatility, min_return, **kw):
        return optimizer.minimize_uncertainty(min_return=min_return)


class DynamicStrategy(Strategy):
    """Regime switch on the expected return under the previous weights
    (Strategies/dynamic_strategy.py:95-133):

    - day 0 (mu_A is None): maximize returns under the volatility cap;
    - if E[r_prev·w_prev] < E[r_pred·w_prev] (expected return improving
      under the held weights): maximize returns under the volatility cap;
    - else (E_A ≥ E_B, deteriorating): minimize uncertainty with floor
      E_B − E_A, then revert to the previous weights if transaction costs
      eat the (non-positive) gain — with B−A ≤ 0 and tx ≥ 0 the revert
      fires whenever tx > 0, a reference quirk preserved verbatim.

    `decision="prob_threshold"` selects the reference's Monte-Carlo decision
    variant (the alternative `optimize` at dynamic_strategy.py:61-93):
    estimate P(B > A) elementwise over the joint MVNs with 10k samples
    (:24-58); chase returns when it clears `prob_threshold`, otherwise hold
    the previous weights.
    """

    def __init__(self, broker_fee: float = 0.0, apply_broker_fee: bool = False,
                 decision: str = "expected_return", mesh=None):
        """`mesh` (optional jax Mesh): shard the MC sampling budget over the
        mesh data axis (portfolio/montecarlo.py sharded path) — the SURVEY
        §2.3 MC-parallelism axis for larger-than-10k budgets."""
        super().__init__(broker_fee, apply_broker_fee)
        if decision not in ("expected_return", "prob_threshold"):
            raise ValueError(f"unknown dynamic decision rule: {decision!r}")
        self.decision = decision
        self.mesh = mesh

    def probability_a_greater_than_b_mvnorm(self, mu_a, cov_a, mu_b, cov_b, num_samples=10_000, seed=0):
        if self.mesh is not None:
            from portfoliooptgp_tpu.portfolio.montecarlo import (
                probability_a_greater_than_b_mvnorm_sharded,
            )

            return probability_a_greater_than_b_mvnorm_sharded(
                mu_a, cov_a, mu_b, cov_b, self.mesh, num_samples, seed
            )
        return probability_a_greater_than_b_mvnorm(mu_a, cov_a, mu_b, cov_b, num_samples, seed)

    def optimize(
        self,
        optimizer,
        max_volatility,
        min_return,
        mu_A=None,
        cov_A=None,
        mu_B=None,
        cov_B=None,
        previous_weights=None,
        broker_fee: float = 0.001,
        prob_threshold: float = 0.5,
        num_samples: int = 10_000,
        seed: int = 0,
        **kw,
    ):
        if mu_A is None:
            return optimizer.maximize_returns(max_volatility)

        if self.decision == "prob_threshold":
            # MC variant (dynamic_strategy.py:80-93): the helper is called
            # with B first — P(pred-day samples beat prev-day samples in
            # every dimension)
            prob = self.probability_a_greater_than_b_mvnorm(
                mu_B, cov_B, mu_A, cov_A, num_samples=num_samples, seed=seed
            )
            if prob >= prob_threshold:
                return optimizer.maximize_returns(max_volatility)
            return np.asarray(previous_weights, dtype=float)

        mu_A = np.asarray(mu_A, dtype=float)
        mu_B = np.asarray(mu_B, dtype=float)
        prev = np.asarray(previous_weights, dtype=float)
        expected_A = float(mu_A @ prev)
        expected_B = float(mu_B @ prev)

        if expected_A < expected_B:
            # Improving under held weights -> chase returns
            # (dynamic_strategy.py:114-117).
            return optimizer.maximize_returns(max_volatility)
        # Deteriorating (A >= B) -> conservative: minimize uncertainty with
        # floor E_B - E_A, then transaction-cost revert
        # (dynamic_strategy.py:118-132).
        w = optimizer.minimize_uncertainty(expected_B - expected_A)
        tx = float(np.sum(broker_fee * np.abs(w - prev)))
        if expected_B - expected_A - tx > 0:
            return w
        optimizer.set_previous_weights(prev)
        return prev


STRATEGY_REGISTRY = {
    "constant": ConstantStrategy,
    "sharpe": SharpeRatioStrategy,
    "max_return": MaxReturnStrategy,
    "min_volatility": MinVolatilityStrategy,
    "dynamic": DynamicStrategy,
}
