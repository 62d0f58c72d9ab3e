"""Native C++ CSV loader: parity with pandas, threaded multi-file loads."""

import numpy as np
import pandas as pd
import pytest

from portfoliooptgp_tpu import native
from portfoliooptgp_tpu.data import loader

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built (no g++)"
)


@pytest.fixture
def csv_tree(tmp_path, rng):
    paths = []
    for t in ("AAA", "BBB", "CCC"):
        d = tmp_path / t
        d.mkdir()
        dates = pd.bdate_range("2024-01-02", periods=500)
        close = 100 * np.cumprod(1 + 0.01 * rng.normal(size=500))
        pd.DataFrame(
            {
                "date": dates.strftime("%Y-%m-%d"),
                "open": np.round(close * 0.998, 4),
                "high": np.round(close * 1.01, 4),
                "low": np.round(close * 0.99, 4),
                "close": np.round(close, 4),
                "adjusted_close": np.round(close, 4),
                "volume": rng.integers(1e5, 1e8, size=500),
            }
        ).to_csv(d / f"{t}.csv", index=False)
        paths.append(str(d / f"{t}.csv"))
    return paths


def test_native_matches_pandas(csv_tree):
    for path in csv_tree:
        nat = loader.read_eod_csv(path, use_native=True)
        ref = loader.read_eod_csv(path, use_native=False)
        assert len(nat) == len(ref)
        pd.testing.assert_series_equal(
            nat["date"].astype("datetime64[us]"), ref["date"].astype("datetime64[us]")
        )
        for col in ("open", "high", "low", "close", "adjusted_close", "volume"):
            np.testing.assert_allclose(
                nat[col].to_numpy(), ref[col].to_numpy(dtype=float), rtol=1e-12
            )


def test_native_date_filtering(csv_tree):
    nat = loader.read_eod_csv(csv_tree[0], "2024-03-01", "2024-06-01", use_native=True)
    ref = loader.read_eod_csv(csv_tree[0], "2024-03-01", "2024-06-01", use_native=False)
    assert len(nat) == len(ref) > 0


def test_load_many_threaded(csv_tree):
    tables = native.load_eod_many(csv_tree, n_threads=4)
    assert len(tables) == 3
    for t in tables:
        assert t["close"].shape == (500,)
        assert np.all(np.diff(t["dates"]) > 0)


def test_missing_file_raises():
    with pytest.raises(IOError):
        native.load_eod("/nonexistent/nope.csv")
