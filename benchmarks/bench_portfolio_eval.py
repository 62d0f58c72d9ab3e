"""Per-day portfolio solve throughput: batched one-jit-call horizon vs the
sequential host loop, at a 250-day backtest horizon (VERDICT r2 item 8).

The reference solves one scipy SLSQP per day per strategy
(Portfolio/portfolio.py:102-146). `portfolio/batched_eval.solve_horizon`
executes the whole horizon on device — vmapped for min_volatility, scanned
(previous-weights transaction chain) for sharpe/max_return.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from portfoliooptgp_tpu.portfolio.optimizer import PortfolioOptimizer
from portfoliooptgp_tpu.portfolio.portfolio import Portfolio

DAYS = 250
SEQ_DAYS = 16  # sequential path measured short and reported per-day
ASSETS = 5


def make_portfolio(days=DAYS, verbose=False):
    # draw the full horizon and slice, so the short sequential leg sees the
    # same per-asset series prefix as the 250-day batched leg
    rng = np.random.default_rng(0)
    preds = [0.002 + 0.01 * rng.normal(size=DAYS)[:days] for _ in range(ASSETS)]
    pvars = [((0.01 + 0.005 * rng.random(size=DAYS)) ** 2)[:days] for _ in range(ASSETS)]
    opt = PortfolioOptimizer(n_assets=ASSETS, lambda_l1=0.01, lambda_tx=1e-5)
    return Portfolio(
        [f"A{i}" for i in range(ASSETS)], preds, pvars, opt,
        risk_free_rate=0.01 / 252, broker_fee=1e-5, verbose=verbose,
    )


def main():
    for strategy in ("sharpe", "max_return", "min_volatility"):
        # warm (compile) with a fresh portfolio, then time a fresh one
        make_portfolio().evaluate_portfolio(
            strategy_name=strategy, isLogReturn=True, batched=True
        )
        p = make_portfolio()
        t0 = time.perf_counter()
        w, v = p.evaluate_portfolio(strategy_name=strategy, isLogReturn=True, batched=True)
        tb = time.perf_counter() - t0

        # sequential leg on a short prefix (it is ~500x slower; a full
        # 250-day sequential run is ~9 min/strategy)
        p = make_portfolio(days=SEQ_DAYS)
        t0 = time.perf_counter()
        ws, vs = p.evaluate_portfolio(strategy_name=strategy, isLogReturn=True, batched=False)
        ts = time.perf_counter() - t0

        err = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(w[:SEQ_DAYS], ws)
        )
        ms_day_b, ms_day_s = tb / DAYS * 1e3, ts / SEQ_DAYS * 1e3
        print(
            f"{strategy:15s} batched[{DAYS}d]={tb*1e3:8.1f} ms ({ms_day_b:6.2f} ms/day)  "
            f"sequential[{SEQ_DAYS}d]={ts*1e3:8.1f} ms ({ms_day_s:7.2f} ms/day)  "
            f"per-day speedup={ms_day_s/ms_day_b:6.1f}x  max|dw| (first {SEQ_DAYS}d)={err:.2e}"
        )


if __name__ == "__main__":
    main()
