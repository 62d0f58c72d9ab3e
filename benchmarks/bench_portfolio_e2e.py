"""Flagship end-to-end portfolio workflow benchmark (VERDICT r4 item 2).

Mirrors the reference's __main__ pipeline (Multi-Input_GPR/main.py:482-614)
at its scale: 5 portfolio assets x walk-forward daily retraining over the
test week (run_step_4, batched pad-and-mask MLE on the chip), ARIMA
baselines, cross-asset correlations, then all 5 allocation strategies
evaluated per-day and backtested. One deterministic synthetic market
(committed generator, fixed seed) stands in for the reference's committed
CSVs — same shapes, dates span, and feature structure (6 candidate
covariates across Stocks/Index/Commodities trees, |rho| > 0.30 gating).

Outputs wall-clock portfolio_e2e_s (cold, including jit compiles — the
first-run experience; the sequential reference has no compile but pays
days x assets x L-BFGS retrains) plus a warm pass and the backtest quality
metrics, checked against committed goldens
(tests/goldens/portfolio_e2e_goldens.json, generated with --goldens on the
float64 CPU path whose parity vs the sequential loop is pinned by
tests/test_pipelines.py).

Run:  python benchmarks/bench_portfolio_e2e.py            # on the TPU host
      python benchmarks/bench_portfolio_e2e.py --goldens  # regen goldens (CPU f64)
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDENS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens",
    "portfolio_e2e_goldens.json")

ASSETS = ["ALFA", "BRVO", "CHLI", "DLTA", "EKKO"]
FEATURES = ["Brent_Oil", "XAU_USD", "SP500", "NasDaq100", "MACR", "RNDX"]
DATES = dict(
    train_start_date="2024-02-01",
    train_end_date="2024-05-10",
    test_start_date="2024-05-13",
    test_end_date="2024-05-17",
)
STRATEGIES = ["constant", "sharpe", "max_return", "min_volatility", "dynamic"]


def _write_eod(dirpath, name, dates, close):
    import pandas as pd

    os.makedirs(dirpath, exist_ok=True)
    pd.DataFrame({
        "date": pd.to_datetime(dates).strftime("%Y-%m-%d"),
        "open": close * 0.998,
        "high": close * 1.01,
        "low": close * 0.99,
        "close": close,
        "adjusted_close": close,
        "volume": 1_000_000,
    }).to_csv(os.path.join(dirpath, name), index=False)


def make_market(root: str, seed: int = 7):
    """Deterministic 5-asset market with 6 candidate covariates: two common
    macro drivers; each asset loads on them with idiosyncratic noise, so
    the |rho| > 0.30 gate keeps driver-linked features and drops the
    uncorrelated one (RNDX), like the reference's Brent/DXY/SP500 mix."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    days = pd.bdate_range("2024-02-01", "2024-05-31")
    n = len(days)
    drv1 = np.cumsum(0.010 * rng.normal(size=n))
    drv2 = np.cumsum(0.008 * rng.normal(size=n))

    def series(b1, b2, idio):
        return 100 * np.exp(b1 * drv1 + b2 * drv2
                            + np.cumsum(idio * rng.normal(size=n)))

    for i, t in enumerate(ASSETS):
        _write_eod(os.path.join(root, "Stocks", t), f"{t}_us_d.csv", days,
                   series(0.9 + 0.05 * i, 0.4 - 0.05 * i, 0.004))
    _write_eod(os.path.join(root, "Commodities", "Brent_Oil"),
               "Brent_Oil_us_d.csv", days, series(1.0, 0.0, 0.003))
    _write_eod(os.path.join(root, "Commodities", "XAU_USD"),
               "XAU_USD_us_d.csv", days, series(0.0, 1.0, 0.003))
    _write_eod(os.path.join(root, "Stocks", "Index", "SP500"),
               "SP500_us_d.csv", days, series(0.8, 0.5, 0.002))
    _write_eod(os.path.join(root, "Stocks", "Index", "NasDaq100"),
               "NasDaq100_us_d.csv", days, series(0.9, 0.3, 0.002))
    _write_eod(os.path.join(root, "Stocks", "MACR"), "MACR_us_d.csv", days,
               series(0.5, 0.8, 0.003))
    _write_eod(os.path.join(root, "Stocks", "RNDX"), "RNDX_us_d.csv", days,
               100 * np.exp(np.cumsum(0.01 * rng.normal(size=n))))
    return root


def run_workflow(data_root: str, maxiter: int = 200, verbose: bool = False):
    """The cmd_portfolio flow (cli.py:121-181) against `data_root`.
    Returns (elapsed_s, quality dict)."""
    from portfoliooptgp_tpu.models import arima
    from portfoliooptgp_tpu.pipelines import MultiInputGPR
    from portfoliooptgp_tpu.pipelines.multi_input import full_correlations
    from portfoliooptgp_tpu.portfolio import Portfolio, PortfolioOptimizer

    t0 = time.perf_counter()
    preds, pvars, actuals, trains = [], [], [], []
    for ticker in ASSETS:
        mi = MultiInputGPR(
            ticker=ticker, features=FEATURES, data_root=data_root,
            threshold=0.30, removal_percentage=0.2, maxiter=maxiter,
            isFixedLikelihood=True, **DATES,
        )
        p = mi.run_step_4()
        preds.append(p.f_mean)
        pvars.append(p.f_var)
        actuals.append(p.actual)
        trains.append(p.Y_train)
        # ARIMA(3,1,0) baseline per asset (main.py:561-562)
        _, _, _, (ym, ys), _ = mi._load_target(DATES["train_end_date"],
                                               predict_Y="close")
        arima.fit_forecast(np.asarray(p.Y_train).reshape(-1), (3, 1, 0), 5)

    corr = full_correlations(
        np.column_stack([np.asarray(t).reshape(-1) for t in trains]))
    opt = PortfolioOptimizer(
        n_assets=len(ASSETS), lambda_l1=0.001, lambda_l2=0.001,
        lambda_tx=1e-5, if_tx_penalty=True,
    )
    port = Portfolio(ASSETS, preds, pvars, opt, risk_free_rate=0.01 / 252,
                     broker_fee=1e-5, verbose=verbose)
    quality = {}
    for strat in STRATEGIES:
        w, v = port.evaluate_portfolio(
            strategy_name=strat, max_volatility=0.02, min_return=0.001,
            prob_threshold=0.55, isLogReturn=False, cov=corr,
        )
        cml, trx = port.backtest_portfolio(actuals, strat, w, v)
        quality[strat] = {
            "cumulative_return": float(np.asarray(cml)[-1]),
            "total_transaction_costs": float(np.asarray(trx)[-1]),
            "sharpe_ratio": float(port.last_summary["sharpe_ratio"]),
        }
    return time.perf_counter() - t0, quality


def compare_to_goldens(quality, goldens, atol=0.02):
    """Backtest parity vs the committed float64 CPU goldens. Cumulative
    returns are a few percent over the 5-day horizon; atol=0.02 absolute
    on returns/costs and 1.0 on the (noisier) daily Sharpe ratio."""
    worst = {"metric": None, "diff": 0.0}
    for strat, g in goldens["strategies"].items():
        q = quality[strat]
        for k, tol in (("cumulative_return", atol),
                       ("total_transaction_costs", atol),
                       ("sharpe_ratio", 1.0)):
            d = abs(q[k] - g[k])
            if d > worst["diff"]:
                worst = {"metric": f"{strat}.{k}", "diff": d}
            if d > tol:
                return False, worst
    return True, worst


def measure_sequential(data_root: str, maxiter: int = 200) -> float:
    """Wall time of the reference-shaped SEQUENTIAL path: per-day retraining
    loop (run_step_4(batched=False), the literal main.py:414-456 structure)
    for all 5 assets. This is the vs_baseline denominator of the driver's
    portfolio_e2e_s metric — measured once on this host and stored in the
    goldens file (re-run --goldens to refresh)."""
    from portfoliooptgp_tpu.pipelines import MultiInputGPR

    t0 = time.perf_counter()
    for ticker in ASSETS:
        mi = MultiInputGPR(
            ticker=ticker, features=FEATURES, data_root=data_root,
            threshold=0.30, removal_percentage=0.2, maxiter=maxiter,
            isFixedLikelihood=True, **DATES,
        )
        mi.run_step_4(batched=False)
    return time.perf_counter() - t0


def main():
    if "--goldens" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        with tempfile.TemporaryDirectory() as root:
            make_market(root)
            elapsed, quality = run_workflow(root)
            seq = measure_sequential(root)
        payload = {
            "_provenance": "float64 CPU run of benchmarks/bench_portfolio_e2e.py"
                           " --goldens (sequential-parity pinned by"
                           " tests/test_pipelines.py)",
            "cpu_f64_seconds": round(elapsed, 2),
            "cpu_sequential_seconds": round(seq, 2),
            "strategies": quality,
        }
        with open(GOLDENS_PATH, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {GOLDENS_PATH} ({elapsed:.1f}s)")
        print(json.dumps(quality, indent=1))
        return

    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    with tempfile.TemporaryDirectory() as root:
        make_market(root)
        cold, quality = run_workflow(root)
        warm, quality2 = run_workflow(root)
    print(f"portfolio e2e cold (incl. compiles): {cold:.2f}s  warm: {warm:.2f}s")
    with open(GOLDENS_PATH) as fh:
        goldens = json.load(fh)
    ok, worst = compare_to_goldens(quality, goldens)
    print(f"quality vs goldens: {'MATCH' if ok else 'MISMATCH'} "
          f"(worst {worst['metric']}: {worst['diff']:.4f})")
    print(json.dumps(quality, indent=1))


if __name__ == "__main__":
    main()
