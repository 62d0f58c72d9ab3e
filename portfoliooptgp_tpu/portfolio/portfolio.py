"""Portfolio aggregate — per-day strategy evaluation and backtesting
(Portfolio/portfolio.py parity).

`evaluate_portfolio` walks the prediction horizon day by day
(portfolio.py:102-165): day 0 uses single-day predictions, later days use
cumulative predictions (compounded or log-sum per `is_log_return`,
:113-133); the cross-asset covariance is outer(σ,σ)·corr (:137); weights come
from the selected strategy's solve. `backtest_portfolio` replays the chosen
weights against realized returns with transaction costs and Sharpe ratios
(:167-222). Quality-metric definitions (daily Sharpe = (r−r_f)/var, portfolio
Sharpe = (cml_return−r_f)/cml_variance) are kept identical for parity even
where statistically unusual.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from portfoliooptgp_tpu.portfolio.optimizer import PortfolioOptimizer
from portfoliooptgp_tpu.portfolio.returns import Return
from portfoliooptgp_tpu.portfolio.strategies import STRATEGY_REGISTRY


class Portfolio:
    def __init__(
        self,
        assets: Sequence[str],
        asset_returns,
        predicted_volatilities,
        optimizer: PortfolioOptimizer,
        risk_free_rate: float = 0.01 / 252,
        lambda_: float = 0.01,
        broker_fee: float = 0.0,
        verbose: bool = False,
        dynamic_decision: str = "expected_return",
    ):
        self.assets = list(assets)
        self.optimizer = optimizer
        self.risk_free_rate = risk_free_rate
        self.lambda_ = lambda_
        self.broker_fee = broker_fee
        # "expected_return" (active reference path) or "prob_threshold"
        # (the MC variant, Strategies/dynamic_strategy.py:61-93)
        self.dynamic_decision = dynamic_decision
        self.returns = [np.asarray(r, dtype=float).reshape(-1, 1) for r in asset_returns]
        self.variances = [
            np.asarray(v, dtype=float).reshape(-1, 1) for v in predicted_volatilities
        ]
        self.verbose = verbose

    def _log(self, *args):
        if self.verbose:
            print(*args)

    def select_strategy(self, strategy_name: str):
        cls = STRATEGY_REGISTRY.get(strategy_name)
        if cls is None:
            raise ValueError(f"Strategy '{strategy_name}' is not recognized.")
        if strategy_name == "dynamic":
            return cls(broker_fee=self.broker_fee, decision=self.dynamic_decision)
        return cls(broker_fee=self.broker_fee)

    def get_optimal_weights(
        self,
        strategy_name="sharpe",
        max_volatility=0.02,
        min_return=0.005,
        prob_threshold=0.05,
        mu_A=None,
        cov_A=None,
        mu_B=None,
        cov_B=None,
        previous_weights=None,
    ):
        strategy = self.select_strategy(strategy_name)
        if strategy_name == "dynamic":
            return strategy.optimize(
                self.optimizer,
                max_volatility,
                min_return,
                mu_A=mu_A,
                cov_A=cov_A,
                mu_B=mu_B,
                cov_B=cov_B,
                previous_weights=previous_weights,
                broker_fee=self.broker_fee,
                prob_threshold=prob_threshold,
            )
        return strategy.optimize(self.optimizer, max_volatility, min_return)

    def calculate_performance(self, weights):
        return self.optimizer.calculate_portfolio_performance(weights)

    def evaluate_portfolio(
        self,
        strategy_name="sharpe",
        max_volatility=0.02,
        min_return=0.005,
        prob_threshold=0.05,
        isLogReturn=True,
        cov: Optional[np.ndarray] = None,
        batched: Optional[bool] = None,
    ):
        """Per-day strategy evaluation over the horizon (portfolio.py:92-165).

        For the static strategies (constant/sharpe/max_return/min_volatility)
        the whole horizon is solved on device in one jit call
        (portfolio/batched_eval.py) — the default. `batched=False` forces the
        sequential host loop; `dynamic` always runs sequentially (its regime
        switch consumes the previous day's solution).
        """
        from portfoliooptgp_tpu.portfolio import batched_eval

        if batched is None:
            batched = strategy_name in batched_eval.BATCHABLE_STRATEGIES
        if batched and strategy_name in batched_eval.BATCHABLE_STRATEGIES:
            return self._evaluate_portfolio_batched(
                strategy_name, max_volatility, min_return, isLogReturn
            )
        optimal_weights: List[np.ndarray] = []
        predicted_volatilities: List[float] = []
        cov_matrices: List[np.ndarray] = []
        daily_returns: List[List[float]] = []
        n_days = len(self.returns[0])
        n_assets = len(self.returns)

        for day in range(n_days):
            day_return = [float(self.returns[i][day, 0]) for i in range(n_assets)]
            std_devs = [float(np.sqrt(self.variances[i][day, 0])) for i in range(n_assets)]

            if day == 0:
                self.optimizer.set_predictions(
                    day_return,
                    [float(self.variances[i][0, 0]) for i in range(n_assets)],
                    self.risk_free_rate,
                )
            else:
                rets = [self.returns[i][: day + 1] for i in range(n_assets)]
                vols = [self.variances[i][: day + 1] for i in range(n_assets)]
                if isLogReturn:
                    self.optimizer.set_cml_log_return(rets, vols, self.risk_free_rate)
                else:
                    self.optimizer.set_predictions_cml(rets, vols, self.risk_free_rate)

            daily_returns.append(day_return)
            cov_matrix = np.outer(std_devs, std_devs) * (
                cov if cov is not None else np.eye(n_assets)
            )
            cov_matrices.append(cov_matrix)

            if day == 0:
                w = self.get_optimal_weights(
                    strategy_name, max_volatility, min_return, prob_threshold,
                    mu_A=None, cov_A=None,
                    mu_B=np.asarray(day_return), cov_B=cov_matrix,
                    previous_weights=None,
                )
            else:
                w = self.get_optimal_weights(
                    strategy_name, max_volatility, min_return, prob_threshold,
                    mu_A=np.asarray(daily_returns[-2]), cov_A=cov_matrices[-2],
                    mu_B=np.asarray(day_return), cov_B=cov_matrix,
                    previous_weights=optimal_weights[-1],
                )

            ret, vol = self.calculate_performance(w)
            if isLogReturn:
                ret = float(np.exp(ret) - 1.0)
            self._log(f"Day {day + 1}: weights ({strategy_name}): {w}, ret={ret:.4%}, vol={vol:.4%}")
            optimal_weights.append(np.asarray(w))
            predicted_volatilities.append(vol)

        return optimal_weights, predicted_volatilities

    def _evaluate_portfolio_batched(
        self, strategy_name, max_volatility, min_return, isLogReturn
    ):
        """One-jit-call horizon evaluation (portfolio/batched_eval.py)."""
        from portfoliooptgp_tpu.portfolio import batched_eval

        mu, var = batched_eval.day_moments(self.returns, self.variances, isLogReturn)
        opt = self.optimizer
        W, ret, vol = batched_eval.solve_horizon(
            strategy_name,
            mu,
            var,
            np.asarray(opt.previous_weights, dtype=float),
            self.risk_free_rate,
            opt.lambda_l1,
            opt.lambda_l2,
            opt.lambda_tx,
            max_volatility,
            min_return,
            if_tx=opt.if_tx_penalty,
        )
        W = np.asarray(W)
        ret = np.asarray(ret)
        vol = np.asarray(vol)
        # sequential parity: the loop leaves the optimizer holding the last
        # day's moments; previous_weights rolls forward after every solve
        # (except constant, which never solves)
        opt.set_predictions(mu[-1], var[-1], self.risk_free_rate)
        if strategy_name != "constant":
            opt.set_previous_weights(W[-1])
        if self.verbose:
            for day in range(W.shape[0]):
                r = float(np.exp(ret[day]) - 1.0) if isLogReturn else float(ret[day])
                self._log(
                    f"Day {day + 1}: weights ({strategy_name}): {W[day]}, "
                    f"ret={r:.4%}, vol={vol[day]:.4%}"
                )
        return [W[d] for d in range(W.shape[0])], [float(v) for v in vol]

    def backtest_portfolio(
        self,
        historical_returns,
        strategy_name="sharpe",
        optimal_weights=None,
        predicted_volatilities=None,
    ):
        """Replay weights against realized returns (portfolio.py:167-222).
        Returns (cumulative-return series, cumulative-cost series)."""
        calc = Return(historical_returns, optimal_weights, transaction_cost_rate=self.broker_fee)
        portfolio_returns, transaction_costs = calc.calculate_portfolio_returns()

        return_cmls, trx_cmls, sharpe_ratios = [], [], []
        for i, (ret, trx, var) in enumerate(
            zip(portfolio_returns, transaction_costs, predicted_volatilities)
        ):
            daily_sharpe = (ret - self.risk_free_rate) / var if var else np.nan
            sharpe_ratios.append(daily_sharpe)
            self._log(
                f"Day {i+1}: net return={ret:.4%} trx={trx:.6%} var={var:.6%} sharpe={daily_sharpe:.4f}"
            )
            return_cmls.append(calc.calculate_cumulative_return(portfolio_returns[: i + 1]))
            trx_cmls.append(calc.calculate_cumulative_transaction_costs(transaction_costs[: i + 1]))

        cumulative_return = calc.calculate_cumulative_return(portfolio_returns)
        cumulative_trx = calc.calculate_cumulative_transaction_costs()
        cumulative_variance = float(np.sum(predicted_volatilities))
        sharpe = (cumulative_return - self.risk_free_rate) / cumulative_variance
        self._log(
            f"Cumulative return {cumulative_return:.4%}, costs {cumulative_trx:.6%}, "
            f"variance {cumulative_variance:.6%}, Sharpe {sharpe:.6f}"
        )
        self.last_summary = {
            "cumulative_return": cumulative_return,
            "cumulative_transaction_costs": cumulative_trx,
            "cumulative_variance": cumulative_variance,
            "sharpe_ratio": float(sharpe),
            "daily_sharpe_ratios": sharpe_ratios,
        }
        return return_cmls, trx_cmls
