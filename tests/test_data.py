"""Data-layer tests with synthetic CSV fixtures (hermetic, like the
reference's mocked data tests — SURVEY.md §4), plus entropy properties."""

import numpy as np
import pandas as pd
import pytest

from portfoliooptgp_tpu.data import DataHandler, loader, transforms
from portfoliooptgp_tpu.data import calendar as cal
from portfoliooptgp_tpu.ops import entropy


@pytest.fixture
def data_root(tmp_path, rng):
    """Synthetic Stocks/ + Commodities/ trees in both CSV schemas."""
    dates = pd.bdate_range("2024-02-01", periods=80)
    close = 100 * np.cumprod(1 + 0.01 * rng.normal(size=80))
    stocks = tmp_path / "Stocks" / "FAKE"
    stocks.mkdir(parents=True)
    pd.DataFrame(
        {
            "date": dates.strftime("%Y-%m-%d"),
            "open": close * (1 - 0.002),
            "high": close * 1.01,
            "low": close * 0.99,
            "close": close,
            "adjusted_close": close,
            "volume": 1000000,
        }
    ).to_csv(stocks / "FAKE_us_d.csv", index=False)

    comm = tmp_path / "Commodities" / "FOIL"
    comm.mkdir(parents=True)
    pd.DataFrame(
        {
            "Date": dates[::-1].strftime("%m/%d/%Y"),
            "Price": [f"{c:,.2f}" for c in close[::-1]],
            "Open": [f"{c:,.2f}" for c in close[::-1]],
            "High": [f"{c:,.2f}" for c in close[::-1]],
            "Low": [f"{c:,.2f}" for c in close[::-1]],
            "Vol.": ["123K"] * 80,
            "Change %": ["0.1%"] * 80,
        }
    ).to_csv(comm / "FOIL.csv", index=False)
    return str(tmp_path)


def make_handler(data_root):
    return DataHandler("2024-02-01", "2024-05-01", "2024-05-02", "2024-05-20", data_root=data_root)


def test_process_data_shapes_and_stats(data_root):
    h = make_handler(data_root)
    X, Y, dates, (y_mean, y_std), (x_mean, x_std) = h.process_data("Stocks", "FAKE", "d")
    assert X.shape == Y.shape and X.shape[1] == 1
    np.testing.assert_allclose(np.mean(np.asarray(Y)), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.std(np.asarray(Y), ddof=1), 1.0, atol=1e-10)
    assert y_std > 0 and x_std > 0


def test_gpr_variant_keeps_raw_x(data_root):
    h = make_handler(data_root)
    X, Y, dates, _, (x_mean, x_std) = h.process_data(
        "Stocks", "FAKE", "d", normalize_x=False
    )
    assert x_mean == 0.0 and x_std == 1.0
    assert float(X[0, 0]) == 0.0  # day index starts at train_start
    # business days: index is days-since-start, strictly increasing
    assert np.all(np.diff(np.asarray(X[:, 0])) > 0)


def test_investing_schema_remap(data_root):
    df = loader.load_frame(data_root, "Commodities", "FOIL", "d")
    assert list(df.columns[:5]) == ["date", "open", "high", "low", "close"]
    assert df["date"].is_monotonic_increasing
    assert df["close"].dtype == float


def test_return_semantics(data_root):
    df = loader.load_frame(data_root, "Stocks", "FAKE", "d")
    df = transforms.add_return_columns(df)
    # first return equals second (back-filled NaN, GPR/data_handler.py:35-38)
    assert df["return"].iloc[0] == df["return"].iloc[1]
    want = df["close"].iloc[2] / df["close"].iloc[1] - 1
    np.testing.assert_allclose(df["return"].iloc[2], want, rtol=1e-12)
    np.testing.assert_allclose(
        df["daily_log_return"].iloc[2], np.log1p(want), rtol=1e-10
    )


def test_concatenate_x(data_root):
    h = make_handler(data_root)
    a = np.arange(5.0)
    X = h.concatenate_X([a, a * 2, a * 3])
    assert X.shape == (5, 3)
    np.testing.assert_allclose(X[:, 1], a * 2)
    with pytest.raises(ValueError):
        h.concatenate_X([a, np.arange(4.0)])


def test_future_dates_grids():
    fut_d = cal.future_dates("2024-05-10", "d", 30)
    assert len(fut_d) == 30 and fut_d[0] == pd.Timestamp("2024-05-11")
    fut_w = cal.future_dates("2024-05-10", "w", 30)
    assert len(fut_w) == 4
    fut_m = cal.future_dates("2024-05-10", "m", 90)
    assert len(fut_m) == 3
    with pytest.raises(ValueError):
        cal.future_dates("2024-05-10", "x")


def test_generate_future_dates(data_root):
    h = make_handler(data_root)
    X = h.generate_future_dates("FAKE", "d", 30, file_type="Stocks")
    assert X.shape == (30, 1)
    assert np.all(np.diff(np.asarray(X[:, 0])) == 1)


def test_denoise_and_filter(data_root):
    h = make_handler(data_root)
    X, Y, *_ = h.process_data("Stocks", "FAKE", "d", isDenoised=True, isFiltered=True)
    assert np.all(np.isfinite(np.asarray(Y)))
    s = pd.Series([1.0, 10.0, 1.0, 10.0, 1.0])
    d = transforms.sliding_window_denoise(s, 3)
    assert d.iloc[2] == 7.0  # mean(10,1,10)
    assert np.isfinite(d).all()


def test_entropy_properties(rng):
    # deterministic monotone ramp: one ordinal pattern -> PE = 0
    ramp = np.arange(100.0)
    assert entropy.PE(ramp, order=3) == 0.0
    assert entropy.RPE(ramp, order=3) == 1.0  # max distance from uniform
    # white noise: PE near 1, RPE near 0
    noise = rng.normal(size=5000)
    assert entropy.PE(noise, order=3) > 0.99
    assert entropy.RPE(noise, order=3) < 0.01
    for name, v in entropy.all_measures(noise).items():
        assert 0.0 <= v <= 1.0 + 1e-9, name
    # weighted variants behave on noise too
    assert entropy.WPE(noise) > 0.98
    assert entropy.DE(noise) > 0.9


def test_entropy_short_series_raises():
    with pytest.raises(ValueError):
        entropy.PE(np.arange(2.0), order=3)


def test_fetch_without_token_raises(data_root, monkeypatch):
    monkeypatch.delenv("API_TOKEN", raising=False)
    h = make_handler(data_root)
    with pytest.raises(RuntimeError):
        h.fetch_and_save_data("FAKE", "d", "2024-02-01", "2024-05-01")


def test_wrangle_align_by_dates():
    from portfoliooptgp_tpu.data import wrangle

    a = pd.DataFrame({"date": ["2024-01-01", "2024-01-02", "2024-01-03"], "close": [1, 2, 3]})
    b = pd.DataFrame({"date": ["2024-01-02", "2024-01-03", "2024-01-04"], "close": [4, 5, 6]})
    aa, bb = wrangle.align_by_dates(a, b)
    assert len(aa) == len(bb) == 2
    assert (aa["date"] == bb["date"]).all()


def test_wrangle_remap_index_csv(tmp_path):
    from portfoliooptgp_tpu.data import wrangle

    src = tmp_path / "idx.csv"
    pd.DataFrame(
        {
            "Date": ["01/03/2024", "01/02/2024"],
            "Price": ["1,234.56", "1,230.00"],
            "Open": ["1,230.00", "1,228.00"],
            "High": ["1,240.00", "1,232.00"],
            "Low": ["1,229.00", "1,227.00"],
            "Vol.": ["1M", "2M"],
            "Change %": ["0.4%", "-0.1%"],
        }
    ).to_csv(src, index=False)
    out = wrangle.remap_index_csv(str(src), str(tmp_path / "out.csv"))
    assert out["date"].is_monotonic_increasing
    assert out["close"].iloc[1] == 1234.56


def test_process_2d_x(data_root):
    """process_2D_X parity (utils/data_handler.py:107-125): stock frame with
    return/intraday columns, normalized on the chosen target."""
    h = make_handler(data_root)
    X, Y, dates, (y_mean, y_std), (x_mean, x_std) = h.process_2D_X(
        "FAKE", predict_Y="close")
    assert X.shape == Y.shape and X.shape[1] == 1
    assert abs(float(np.mean(np.asarray(Y)))) < 1e-8  # z-scored
    assert y_std > 0


def test_plot_arima_comparison(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from portfoliooptgp_tpu.viz.visualizer import Visualizer
    out = tmp_path / "cmp.png"
    Visualizer().plot_arima_comparison(
        [180, 182, 183], [181, 182.5, 183.5], [180.5, 181.5, 182.5],
        filename=str(out))
    assert out.exists()
