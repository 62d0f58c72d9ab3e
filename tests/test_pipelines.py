"""End-to-end pipeline tests over synthetic CSV trees (hermetic)."""

import numpy as np
import pandas as pd
import pytest

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import arima
from portfoliooptgp_tpu.pipelines import MultiInputGPR, StockPredictor, blend


def write_eod(dirpath, name, dates, close):
    dirpath.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {
            "date": pd.to_datetime(dates).strftime("%Y-%m-%d"),
            "open": close * 0.998,
            "high": close * 1.01,
            "low": close * 0.99,
            "close": close,
            "adjusted_close": close,
            "volume": 1_000_000,
        }
    ).to_csv(dirpath / name, index=False)


@pytest.fixture
def market(tmp_path, rng):
    """Synthetic market: a target stock, two correlated covariates and one
    uncorrelated, in Stocks/ + Commodities/ trees; plus weekly/monthly files."""
    days = pd.bdate_range("2024-02-01", "2024-05-31")
    driver = np.cumsum(0.01 * rng.normal(size=len(days)))
    mk = lambda beta, noise: 100 * np.exp(beta * driver + noise * rng.normal(size=len(days)).cumsum() * 0.001)

    target = mk(1.0, 1.0)
    write_eod(tmp_path / "Stocks" / "TGT", "TGT_us_d.csv", days, target)
    write_eod(tmp_path / "Stocks" / "COR", "COR_us_d.csv", days, mk(0.95, 0.5))
    write_eod(tmp_path / "Commodities" / "Brent_Oil", "Brent_Oil_us_d.csv", days, mk(0.9, 0.5))
    # uncorrelated noise asset
    write_eod(tmp_path / "Stocks" / "RND", "RND_us_d.csv", days,
              100 * np.exp(np.cumsum(0.01 * rng.normal(size=len(days)))))

    # weekly / monthly resamples for the multi-timescale pipeline
    df = pd.DataFrame({"date": days, "close": target}).set_index("date")
    wk = df.resample("W").last().dropna()
    mo = df.resample("ME").last().dropna()
    write_eod(tmp_path / "Stocks" / "TGT", "TGT_us_w.csv", wk.index, wk["close"].to_numpy())
    write_eod(tmp_path / "Stocks" / "TGT", "TGT_us_m.csv", mo.index, mo["close"].to_numpy())
    return str(tmp_path)


DATES = dict(
    train_start_date="2024-02-01",
    train_end_date="2024-05-10",
    test_start_date="2024-05-13",
    test_end_date="2024-05-17",
)


def test_blend_upsample_and_weights(rng):
    xd = np.arange(20.0)[:, None]
    xw = np.arange(0.0, 20.0, 5.0)[:, None]
    vw = (xw * 2.0).reshape(-1, 1)
    up = blend.upsample_predictions(xd, xw, vw, period="w")
    np.testing.assert_allclose(np.asarray(up[:16, 0]), 2.0 * xd[:16, 0], atol=1e-12)

    # blend-weight fit: daily predictor is exact => alpha ~ 1
    y = rng.normal(size=20)
    w = blend.optimize_blend_weights(y, y, rng.normal(size=20), rng.normal(size=20), lambda_=0.0)
    assert w.alpha > 0.9
    assert 0 <= w.alpha <= 1 and 0 <= w.beta <= 1 and w.alpha + w.beta <= 1 + 1e-9


def test_single_asset_pipeline(market):
    sp = StockPredictor(
        ["TGT"], data_root=market,
        kernel_menu=[km.SquaredExponential.create(), km.Matern12.create()],
        horizon_days=30, **DATES,
    )
    res = sp.run_ticker("TGT")
    n_daily = res.timeframes["d"].X.shape[0]
    assert res.X_combined_daily.shape[0] == n_daily + 30
    assert res.f_mean.shape == res.f_var.shape == (n_daily + 30, 1)
    lo, hi = res.confidence_bands("f")
    assert np.all(np.asarray(hi) >= np.asarray(lo))
    assert 0 <= res.alpha <= 1 and res.alpha + res.beta <= 1 + 1e-9
    # in-sample blended mean should track the (normalized) daily returns
    mse = float(np.mean((np.asarray(res.f_mean[:n_daily]) - np.asarray(res.timeframes["d"].Y)) ** 2))
    assert mse < 1.0  # well below the variance of z-scored targets


def test_single_asset_pipeline_polynomial_mean(market):
    """Mean functions thread through the pipeline and train jointly with the
    kernel — the reference's script workload uses Polynomial(2)
    (test_scripts/GPR.py:103)."""
    from portfoliooptgp_tpu.kernels.means import PolynomialMean

    sp = StockPredictor(
        ["TGT"], data_root=market,
        kernel_menu=[km.SquaredExponential.create()],
        horizon_days=10, mean_function=PolynomialMean.create(degree=2), **DATES,
    )
    res = sp.run_ticker("TGT")
    model = res.timeframes["d"].model
    assert type(model.mean_function).__name__ == "PolynomialMean"
    assert model.mean_function.degree == 2
    # the polynomial weights must have moved off their init (trained jointly)
    w0 = np.zeros(3); w0[0] = 1.0
    assert not np.allclose(np.asarray(model.mean_function.w), w0)
    assert np.all(np.isfinite(np.asarray(res.f_mean)))


def make_mi(market, **kw):
    args = dict(
        ticker="TGT", features=["COR", "Brent_Oil", "RND"], data_root=market,
        threshold=0.30, removal_percentage=0.2, maxiter=200, **DATES,
    )
    args.update(kw)
    return MultiInputGPR(**args)


def test_multi_input_correlation_gating(market):
    # step 1 gates on close-vs-close correlations when predict_Y='close'.
    # Price-level random walks correlate spuriously (RND hits |ρ|≈0.65), so
    # probe the gate with a threshold that separates the driver-linked
    # covariates (ρ≈0.999) from the spurious one.
    mi = make_mi(market, predict_Y="close", threshold=0.99)
    out = mi.run_step_1()
    assert "COR" in out["kept_features"]
    assert "Brent_Oil" in out["kept_features"]
    assert "RND" not in out["kept_features"]
    assert out["X"].shape[1] == len(out["kept_features"]) + 1  # +time column
    assert out["mse"] < 1.0


def test_multi_input_step_2_removal(market):
    mi = make_mi(market)
    out = mi.run_step_2()
    assert np.isfinite(out["mse_all"]) and np.isfinite(out["mse_removed"])
    assert len(out["Y_removed"]) > 0


def test_multi_input_step_3_horizon(market):
    mi = make_mi(market)
    pred = mi.run_step_3()
    assert pred.f_mean.shape == (5, 1) and pred.f_var.shape == (5, 1)
    assert np.all(pred.f_var >= 0)


def test_multi_input_step_4_walk_forward(market):
    mi = make_mi(market, isFixedLikelihood=True)
    pred = mi.run_step_4()  # default path = batched pad-and-mask engine
    assert len(pred.f_mean) == len(pred.actual) == 5  # 5 test business days
    assert np.all(np.isfinite(pred.f_mean)) and np.all(pred.f_var >= 0)


def test_multi_input_step_4_batched_matches_sequential(market):
    """The flagship CLI path (batched) must reproduce the reference's
    sequential retrain-per-day loop within optimizer tolerance
    (Multi-Input_GPR/main.py:414-456)."""
    mi = make_mi(market, isFixedLikelihood=True, maxiter=300)
    pb = mi.run_step_4(batched=True)
    ps = mi.run_step_4(batched=False)
    np.testing.assert_allclose(pb.actual, ps.actual, rtol=0, atol=0)
    np.testing.assert_allclose(pb.f_mean, ps.f_mean, rtol=0.05, atol=5e-4)
    np.testing.assert_allclose(pb.f_var, ps.f_var, rtol=0.2, atol=1e-6)


def test_arima_fit_forecast():
    rng = np.random.default_rng(0)
    # AR(1)-in-differences series with known coefficient
    n = 400
    dz = np.zeros(n)
    for t in range(1, n):
        dz[t] = 0.6 * dz[t - 1] + 0.1 * rng.normal()
    y = 100 + np.cumsum(dz)
    res = arima.fit_arima(y, order=(1, 1, 0))
    np.testing.assert_allclose(res.ar_coefs[0], 0.6, atol=0.1)
    fc = arima.forecast(y, res, steps=5)
    assert fc.shape == (5,)
    assert np.all(np.isfinite(fc))


def test_arima_ma_terms_recover_coefficients():
    """General (p,d,q) CSS fit: an ARMA(1,1)-in-differences series with
    known coefficients is recovered, and the forecast recursion carries the
    MA memory (VERDICT r3 item 10: the reference only ever fits (3,1,0),
    statsmodels handles general orders)."""
    rng = np.random.default_rng(1)
    n = 3000
    phi_true, theta_true = 0.55, 0.35
    eps = 0.1 * rng.normal(size=n)
    dz = np.zeros(n)
    for t in range(1, n):
        dz[t] = phi_true * dz[t - 1] + eps[t] + theta_true * eps[t - 1]
    y = 50 + np.cumsum(dz)

    res = arima.fit_arima(y, order=(1, 1, 1))
    np.testing.assert_allclose(res.ar_coefs[0], phi_true, atol=0.08)
    np.testing.assert_allclose(res.ma_coefs[0], theta_true, atol=0.08)

    fc = arima.forecast(y, res, steps=5)
    assert fc.shape == (5,) and np.all(np.isfinite(fc))
    # the h=1 forecast must use the last innovation (pure-AR ignores it):
    # Δŷ_{T+1} = φ Δy_T + θ ε_T, integrated from y_T
    m = max(res.order[0], res.order[2])
    eps_in = arima._css_residuals(np.diff(y), res.ar_coefs, res.ma_coefs)
    want1 = y[-1] + res.ar_coefs[0] * np.diff(y)[-1] \
        + res.ma_coefs[0] * eps_in[-1]
    np.testing.assert_allclose(fc[0], want1, rtol=1e-10)

    # ARMA(2,1,2) on the same series stays finite and fits at least as well
    res2 = arima.fit_arima(y, order=(2, 1, 2))
    assert np.isfinite(res2.sigma2) and res2.sigma2 <= res.sigma2 * 1.05


def test_arima_enforces_stationary_invertible():
    """ADVICE r4: the CSS polish is reparametrized through the Monahan/PACF
    transform, so fitted AR coefficients are always stationary and MA
    coefficients invertible — even on a near-unit-root series — and the
    multi-step forecast cannot diverge."""
    rng = np.random.default_rng(7)
    n = 400
    # explosive-looking level series: strong trend + tiny noise drives the
    # Hannan–Rissanen init toward the unit circle
    y = np.cumsum(1.0 + 0.995 * np.arange(n) * 0.01 + 0.02 * rng.normal(size=n))

    for order in [(1, 1, 1), (3, 1, 2)]:
        res = arima.fit_arima(y, order=order)
        # direct root criteria (the PACF-space check is vacuous — the
        # inverse transform clips into (−1, 1) for ANY coefficients):
        # characteristic roots of 1 − φ(B) and of 1 + θ(B), in x = 1/B
        # form, must lie strictly inside the unit circle
        if len(res.ar_coefs):
            roots = np.roots(np.r_[1.0, -res.ar_coefs])
            assert np.all(np.abs(roots) < 1.0 + 1e-8)
        if len(res.ma_coefs):
            roots = np.roots(np.r_[1.0, res.ma_coefs])
            assert np.all(np.abs(roots) < 1.0 + 1e-8), res.ma_coefs
        fc = arima.forecast(y, res, steps=50)
        assert np.all(np.isfinite(fc))
        # a stationary in-differences model cannot blow up over 50 steps
        assert np.max(np.abs(np.diff(fc))) < 10 * np.max(np.abs(np.diff(y)))

    # round-trip of the transform itself
    r = np.array([0.6, -0.4, 0.2])
    np.testing.assert_allclose(
        arima._coef_to_pacf(arima._pacf_to_coef(r)), r, atol=1e-12)


def test_arima_invertible_ma2_is_reachable():
    """Sign regression guard for the +θ CSS convention: the PACF map must be
    applied to −θ. With the wrong sign, an invertible MA(2) with
    θ = (−1.6, 0.7) (roots of 1 + θ(B) at |B| ≈ 1.2) is OUTSIDE the
    reachable set and the fit lands far away with ~4× the true σ²."""
    rng = np.random.default_rng(11)
    n = 6000
    theta_true = np.array([-1.6, 0.7])
    eps = 0.1 * rng.normal(size=n)
    dz = eps.copy()
    dz[1:] += theta_true[0] * eps[:-1]
    dz[2:] += theta_true[1] * eps[:-2]
    y = 10 + np.cumsum(dz)

    res = arima.fit_arima(y, order=(0, 1, 2))
    np.testing.assert_allclose(res.ma_coefs, theta_true, atol=0.08)
    np.testing.assert_allclose(res.sigma2, 0.01, rtol=0.3)
    roots = np.roots(np.r_[1.0, res.ma_coefs])
    assert np.all(np.abs(roots) < 1.0 + 1e-8)


def test_arima_pipeline(market):
    mi = make_mi(market)
    out = mi.run_arima()
    assert out["forecast"].shape == (5,)
    assert np.isfinite(out["mse"])
