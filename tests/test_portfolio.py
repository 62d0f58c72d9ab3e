"""Portfolio layer: solver parity vs scipy SLSQP on the reference's problem
shapes, strategy semantics, returns/backtest math."""

import numpy as np
import pytest
import scipy.optimize

from portfoliooptgp_tpu.portfolio import (
    Portfolio,
    PortfolioOptimizer,
    Return,
    minimize_simplex,
    probability_a_greater_than_b_cdf,
    probability_a_greater_than_b_mvnorm,
    simplex_project,
)

MU = np.array([0.01, 0.02, -0.005, 0.015, 0.0])
VAR = np.array([0.01, 0.04, 0.02, 0.03, 0.015]) ** 2
RF = 0.01 / 252


def scipy_solve(objective, n=5, extra_constraints=()):
    cons = [{"type": "eq", "fun": lambda w: np.sum(w) - 1}] + list(extra_constraints)
    res = scipy.optimize.minimize(
        objective, np.full(n, 1 / n), bounds=[(0, 1)] * n, constraints=cons, method="SLSQP"
    )
    return res.x, res.fun


def test_simplex_project():
    w = simplex_project(np.array([0.5, 0.6, -0.2]))
    np.testing.assert_allclose(np.sum(np.asarray(w)), 1.0, atol=1e-12)
    assert np.all(np.asarray(w) >= 0)


def test_sharpe_solve_matches_scipy():
    opt = PortfolioOptimizer(n_assets=5, lambda_l1=0.01, lambda_tx=0.0005)
    opt.set_predictions(MU, VAR, RF)

    def np_obj(w):
        ret = MU @ w
        vol = np.sqrt(w @ np.diag(VAR) @ w)
        pen = 0.01 * np.abs(w).sum() + 0.0005 * np.abs(w - 0.2).sum()
        return -(ret - RF) / vol + pen

    w_ref, f_ref = scipy_solve(np_obj)
    w = opt.optimize_portfolio()
    np.testing.assert_allclose(np.sum(w), 1.0, atol=1e-6)
    # same or better objective (both are local optimizers on the same problem)
    assert np_obj(w) <= f_ref + 1e-4


def test_max_return_respects_volatility_cap():
    opt = PortfolioOptimizer(n_assets=5, lambda_l1=0.0, lambda_tx=0.0)
    opt.set_predictions(MU, VAR, RF)
    cap = 0.02
    w = opt.maximize_returns(max_volatility=cap)
    vol = float(np.sqrt(w @ np.diag(VAR) @ w))
    assert vol <= cap + 1e-4
    # matches scipy
    def np_obj(w):
        return -(MU @ w)

    w_ref, f_ref = scipy_solve(
        np_obj,
        extra_constraints=[{"type": "ineq", "fun": lambda w: cap - np.sqrt(w @ np.diag(VAR) @ w)}],
    )
    assert np_obj(w) <= f_ref + 1e-4


def test_min_volatility_respects_return_floor():
    opt = PortfolioOptimizer(n_assets=5, lambda_l1=0.0, lambda_tx=0.0)
    opt.set_predictions(MU, VAR, RF)
    floor = 0.005
    w = opt.minimize_uncertainty(min_return=floor)
    assert float(MU @ w) >= floor - 1e-5

    def np_obj(w):
        return np.sqrt(w @ np.diag(VAR) @ w)

    w_ref, f_ref = scipy_solve(
        np_obj, extra_constraints=[{"type": "ineq", "fun": lambda w: MU @ w - floor}]
    )
    assert np_obj(w) <= f_ref + 1e-4


def test_nassets_generalization():
    """The reference hardcodes 5 assets (optimization/optimizer.py:11-12);
    ours must be n-asset general."""
    mu3 = np.array([0.01, 0.005, 0.02])
    var3 = np.array([0.01, 0.02, 0.015]) ** 2
    opt = PortfolioOptimizer(n_assets=3)
    opt.set_predictions(mu3, var3, RF)
    w = opt.optimize_portfolio()
    assert w.shape == (3,)
    np.testing.assert_allclose(np.sum(w), 1.0, atol=1e-6)


def test_cumulative_prediction_semantics():
    opt = PortfolioOptimizer(n_assets=2)
    rets = [[0.01, 0.02], [0.03, -0.01]]
    vars_ = [[0.1, 0.2], [0.3, 0.4]]
    opt.set_predictions_cml(rets, vars_, RF)
    np.testing.assert_allclose(
        np.asarray(opt.mu), [1.01 * 1.02 - 1, 1.03 * 0.99 - 1], rtol=1e-12
    )
    np.testing.assert_allclose(np.diag(np.asarray(opt.Sigma)), [0.3, 0.7], rtol=1e-12)
    opt.set_cml_log_return(rets, vars_, RF)
    np.testing.assert_allclose(np.asarray(opt.mu), [0.03, 0.02], atol=1e-12)


def test_return_calculator_semantics():
    # 2 assets, 3 days; asset_returns arrives [asset][day] and is transposed
    asset_returns = [[0.01, 0.02, 0.0], [0.0, -0.01, 0.03]]
    weights = np.array([[0.5, 0.5], [1.0, 0.0], [0.0, 1.0]])
    calc = Return(asset_returns, weights, transaction_cost_rate=0.001)
    rets, trx = calc.calculate_portfolio_returns()
    # day0: gross 0.005, cost = 0.001*(0.5+0.5)=0.001
    np.testing.assert_allclose(rets[0], 0.005 - 0.001, atol=1e-12)
    # day1: gross 0.02, cost = 0.001*(|1-0.5|+|0-0.5|)=0.001
    np.testing.assert_allclose(rets[1], 0.02 - 0.001, atol=1e-12)
    # day2: gross 0.03, cost = 0.001*2
    np.testing.assert_allclose(rets[2], 0.03 - 0.002, atol=1e-12)
    np.testing.assert_allclose(
        calc.calculate_cumulative_return(rets), np.prod(1 + np.asarray(rets)) - 1, rtol=1e-12
    )
    np.testing.assert_allclose(calc.calculate_cumulative_transaction_costs(trx), sum(trx), rtol=1e-12)


def test_return_shape_mismatch_raises():
    with pytest.raises(ValueError):
        Return([[0.01, 0.02]], np.ones((3, 2)))


def test_mc_probability_sanity():
    # A strictly dominates B
    p = probability_a_greater_than_b_mvnorm(
        [1.0, 1.0], np.eye(2) * 1e-4, [0.0, 0.0], np.eye(2) * 1e-4
    )
    assert p > 0.99
    # symmetric case ~ 0.25 for 2 dims (each dim independent fair)
    p2 = probability_a_greater_than_b_mvnorm(
        [0.0, 0.0], np.eye(2), [0.0, 0.0], np.eye(2), num_samples=40_000
    )
    assert abs(p2 - 0.25) < 0.02
    p3 = float(probability_a_greater_than_b_cdf(1.0, 1.0, 0.0, 1.0))
    expected = 1 - scipy.stats.norm.cdf(0, loc=1.0, scale=np.sqrt(2))
    np.testing.assert_allclose(p3, expected, rtol=1e-6)


def _make_portfolio(strategy_verbose=False):
    rng = np.random.default_rng(0)
    n_assets, n_days = 5, 5
    preds = [0.002 + 0.01 * rng.normal(size=n_days) for _ in range(n_assets)]
    pvars = [(0.01 + 0.005 * rng.random(size=n_days)) ** 2 for _ in range(n_assets)]
    opt = PortfolioOptimizer(n_assets=n_assets, lambda_l1=0.01, lambda_tx=1e-5)
    corr = np.corrcoef(rng.normal(size=(n_assets, 50)))
    p = Portfolio(
        ["A", "B", "C", "D", "E"], preds, pvars, opt,
        risk_free_rate=RF, broker_fee=1e-5, verbose=strategy_verbose,
    )
    return p, preds, corr


class _RecordingOptimizer:
    """Stub that records which optimizer entry point the strategy fires."""

    def __init__(self):
        self.calls = []
        self.n_assets = 5

    def maximize_returns(self, max_volatility=None):
        self.calls.append(("maximize_returns", max_volatility))
        return np.full(5, 0.2)

    def minimize_uncertainty(self, min_return=None):
        self.calls.append(("minimize_uncertainty", min_return))
        return np.array([0.4, 0.3, 0.1, 0.1, 0.1])

    def set_previous_weights(self, w):
        self.calls.append(("set_previous_weights", None))


def test_dynamic_strategy_branch_mapping():
    """Pin the regime-branch -> optimizer-call mapping to the reference
    (Strategies/dynamic_strategy.py:95-133):
      day 0             -> maximize_returns
      E_A <  E_B        -> maximize_returns (improving: chase returns)
      E_A >= E_B        -> minimize_uncertainty(E_B - E_A) + tx-cost revert
    """
    from portfoliooptgp_tpu.portfolio.strategies import DynamicStrategy

    strat = DynamicStrategy()
    prev = np.full(5, 0.2)
    cov = np.eye(5) * 1e-4

    # Day 0: mu_A is None -> maximize_returns.
    opt = _RecordingOptimizer()
    strat.optimize(opt, 0.02, 0.001, mu_A=None)
    assert opt.calls[0][0] == "maximize_returns"

    # Improving regime: E[mu_A . prev] < E[mu_B . prev] -> maximize_returns,
    # no uncertainty solve, no revert.
    opt = _RecordingOptimizer()
    mu_a = np.full(5, 0.001)
    mu_b = np.full(5, 0.010)
    w = strat.optimize(opt, 0.02, 0.001, mu_A=mu_a, cov_A=cov, mu_B=mu_b,
                       cov_B=cov, previous_weights=prev)
    assert [c[0] for c in opt.calls] == ["maximize_returns"]
    assert opt.calls[0][1] == 0.02  # volatility cap threaded through

    # Deteriorating regime: E_A >= E_B -> minimize_uncertainty(E_B - E_A);
    # with broker_fee > 0 and B - A <= 0 the tx revert always returns prev
    # (reference quirk, dynamic_strategy.py:125-132).
    opt = _RecordingOptimizer()
    w = strat.optimize(opt, 0.02, 0.001, mu_A=mu_b, cov_A=cov, mu_B=mu_a,
                       cov_B=cov, previous_weights=prev, broker_fee=0.001)
    assert opt.calls[0][0] == "minimize_uncertainty"
    np.testing.assert_allclose(opt.calls[0][1], float((mu_a - mu_b) @ prev))
    np.testing.assert_allclose(w, prev)  # reverted

    # Deteriorating with zero fee and E_A == E_B: realized = 0 - 0 = 0,
    # not > 0 -> still reverts (strict inequality in the reference).
    opt = _RecordingOptimizer()
    w = strat.optimize(opt, 0.02, 0.001, mu_A=mu_a, cov_A=cov, mu_B=mu_a,
                       cov_B=cov, previous_weights=prev, broker_fee=0.0)
    assert opt.calls[0][0] == "minimize_uncertainty"
    np.testing.assert_allclose(w, prev)


@pytest.mark.parametrize("strategy", ["constant", "sharpe", "max_return", "min_volatility", "dynamic"])
def test_evaluate_and_backtest_all_strategies(strategy):
    p, preds, corr = _make_portfolio()
    weights, vols = p.evaluate_portfolio(
        strategy_name=strategy, max_volatility=0.02, min_return=0.001,
        isLogReturn=False, cov=corr,
    )
    assert len(weights) == 5 and len(vols) == 5
    for w in weights:
        np.testing.assert_allclose(np.sum(w), 1.0, atol=1e-5)
        assert np.all(w >= -1e-9)
    cmls, trxs = p.backtest_portfolio(
        historical_returns=preds, strategy_name=strategy,
        optimal_weights=weights, predicted_volatilities=vols,
    )
    assert len(cmls) == 5
    assert np.isfinite(p.last_summary["sharpe_ratio"])
    # constant strategy: uniform every day
    if strategy == "constant":
        for w in weights:
            np.testing.assert_allclose(w, 0.2, atol=1e-12)


def test_dynamic_strategy_prob_threshold_variant():
    """MC decision variant (Strategies/dynamic_strategy.py:61-93): day 0
    maximizes returns; later days chase returns iff P(B > A) >= threshold,
    else hold the previous weights."""
    from portfoliooptgp_tpu.portfolio.strategies import DynamicStrategy

    strat = DynamicStrategy(decision="prob_threshold")
    prev = np.array([0.3, 0.2, 0.2, 0.2, 0.1])
    cov = np.eye(5) * 1e-6

    # day 0
    opt = _RecordingOptimizer()
    strat.optimize(opt, 0.02, 0.001, mu_A=None, prob_threshold=0.5)
    assert opt.calls[0][0] == "maximize_returns"

    # B clearly above A in every dimension -> P(B>A) ~ 1 -> chase returns
    opt = _RecordingOptimizer()
    mu_a = np.full(5, -0.05)
    mu_b = np.full(5, 0.05)
    w = strat.optimize(opt, 0.02, 0.001, mu_A=mu_a, cov_A=cov, mu_B=mu_b,
                       cov_B=cov, previous_weights=prev, prob_threshold=0.5)
    assert [c[0] for c in opt.calls] == ["maximize_returns"]

    # B clearly below A -> P(B>A) ~ 0 -> hold previous weights, no solve
    opt = _RecordingOptimizer()
    w = strat.optimize(opt, 0.02, 0.001, mu_A=mu_b, cov_A=cov, mu_B=mu_a,
                       cov_B=cov, previous_weights=prev, prob_threshold=0.5)
    assert opt.calls == []
    np.testing.assert_allclose(w, prev)


def test_portfolio_dynamic_decision_plumbing(rng):
    """Portfolio(dynamic_decision="prob_threshold") evaluates end-to-end and
    the prob_threshold knob reaches the strategy."""
    p, preds, corr = _portfolio_fixture_like(rng)
    w, v = p.evaluate_portfolio(
        strategy_name="dynamic", max_volatility=0.02, min_return=0.001,
        prob_threshold=0.5, cov=corr,
    )
    assert len(w) == 5
    for wi in w:
        np.testing.assert_allclose(np.sum(wi), 1.0, atol=1e-5)


def _portfolio_fixture_like(rng):
    from portfoliooptgp_tpu.portfolio.optimizer import PortfolioOptimizer
    from portfoliooptgp_tpu.portfolio.portfolio import Portfolio

    n_assets, n_days = 5, 5
    preds = [0.002 + 0.01 * rng.normal(size=n_days) for _ in range(n_assets)]
    pvars = [(0.01 + 0.005 * rng.random(size=n_days)) ** 2 for _ in range(n_assets)]
    opt = PortfolioOptimizer(n_assets=n_assets, lambda_l1=0.01, lambda_tx=1e-5)
    corr = np.corrcoef(rng.normal(size=(n_assets, 50)))
    p = Portfolio(
        ["A", "B", "C", "D", "E"], preds, pvars, opt,
        risk_free_rate=RF, broker_fee=1e-5,
        dynamic_decision="prob_threshold",
    )
    return p, preds, corr


@pytest.mark.parametrize("strategy", ["constant", "sharpe", "max_return", "min_volatility"])
@pytest.mark.parametrize("isLogReturn", [True, False])
def test_batched_evaluate_matches_sequential(strategy, isLogReturn):
    """The one-jit-call horizon path (portfolio/batched_eval.py) must produce
    the sequential loop's solutions on the reference's 5-day config —
    VERDICT r2 item 8."""
    p_seq, _, corr = _make_portfolio()
    p_bat, _, _ = _make_portfolio()
    kw = dict(strategy_name=strategy, max_volatility=0.02, min_return=0.001,
              isLogReturn=isLogReturn, cov=corr)
    w_seq, v_seq = p_seq.evaluate_portfolio(batched=False, **kw)
    w_bat, v_bat = p_bat.evaluate_portfolio(batched=True, **kw)
    assert len(w_seq) == len(w_bat) == 5
    for ws, wb in zip(w_seq, w_bat):
        np.testing.assert_allclose(wb, ws, atol=2e-5)
    np.testing.assert_allclose(v_bat, v_seq, atol=2e-5)
    # optimizer end-state parity (previous_weights roll-forward)
    np.testing.assert_allclose(
        p_bat.optimizer.previous_weights, p_seq.optimizer.previous_weights, atol=2e-5
    )
