"""Portfolio layer: simplex solver, mean-variance optimizer, strategies,
returns/backtest math, Monte-Carlo comparisons."""

from portfoliooptgp_tpu.portfolio.montecarlo import (
    probability_a_greater_than_b_cdf,
    probability_a_greater_than_b_mvnorm,
)
from portfoliooptgp_tpu.portfolio.optimizer import PortfolioOptimizer
from portfoliooptgp_tpu.portfolio.portfolio import Portfolio
from portfoliooptgp_tpu.portfolio.returns import Return, Volatility
from portfoliooptgp_tpu.portfolio.solver import minimize_simplex, simplex_project
from portfoliooptgp_tpu.portfolio.strategies import (
    STRATEGY_REGISTRY,
    ConstantStrategy,
    DynamicStrategy,
    MaxReturnStrategy,
    MinVolatilityStrategy,
    SharpeRatioStrategy,
    Strategy,
)
