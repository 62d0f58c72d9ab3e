"""Config-1/2 on-chip evidence: the single-asset multi-timescale GPR
pipeline (GPR/main.py: 8-kernel menu x {daily, weekly, monthly} MLE,
posterior blending with SLSQP-fit (alpha, beta), 30-day horizon) timed end
to end on the TPU.

Run ON THE TPU HOST:  python benchmarks/bench_single_asset.py [--reps 2]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DATES = dict(
    train_start_date="2024-02-01",
    train_end_date="2024-05-10",
    test_start_date="2024-05-13",
    test_end_date="2024-05-17",
)


def write_eod(dirpath, name, dates, close):
    import pandas as pd

    os.makedirs(dirpath, exist_ok=True)
    close = np.asarray(close, dtype=float)
    pd.DataFrame({
        "date": pd.to_datetime(dates).strftime("%Y-%m-%d"),
        "open": close * 0.998, "high": close * 1.01, "low": close * 0.99,
        "close": close, "adjusted_close": close, "volume": 1_000_000,
    }).to_csv(os.path.join(dirpath, name), index=False)


def make_market(root, seed=3):
    import pandas as pd

    rng = np.random.default_rng(seed)
    days = pd.bdate_range("2024-02-01", "2024-05-31")
    driver = np.cumsum(0.01 * rng.normal(size=len(days)))
    target = 100 * np.exp(driver + 0.001 * rng.normal(size=len(days)).cumsum())
    d = os.path.join(root, "Stocks", "TGT")
    write_eod(d, "TGT_us_d.csv", days, target)
    df = pd.DataFrame({"date": days, "close": target}).set_index("date")
    wk = df.resample("W").last().dropna()
    mo = df.resample("ME").last().dropna()
    write_eod(d, "TGT_us_w.csv", wk.index, wk["close"].to_numpy())
    write_eod(d, "TGT_us_m.csv", mo.index, mo["close"].to_numpy())


def main():
    import jax

    import _cache
    _cache.enable()

    from portfoliooptgp_tpu.kernels import default_kernel_menu
    from portfoliooptgp_tpu.pipelines.single_asset import StockPredictor

    reps = 2
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    print(f"backend={jax.default_backend()} menu=8 kernels x d/w/m, "
          f"horizon=30d", flush=True)

    with tempfile.TemporaryDirectory() as root:
        make_market(root)
        for r in range(reps):
            t0 = time.perf_counter()
            sp = StockPredictor(["TGT"], data_root=root,
                                kernel_menu=default_kernel_menu(),
                                horizon_days=30, **DATES)
            res = sp.run_ticker("TGT")
            elapsed = time.perf_counter() - t0
            n_daily = res.timeframes["d"].X.shape[0]
            mse = float(np.mean((np.asarray(res.f_mean[:n_daily])
                                 - np.asarray(res.timeframes["d"].Y)) ** 2))
            lo, hi = res.confidence_bands("f")
            assert np.all(np.isfinite(np.asarray(res.f_mean)))
            assert np.all(np.asarray(hi) >= np.asarray(lo))
            assert 0 <= res.alpha <= 1 and res.alpha + res.beta <= 1 + 1e-9
            print(f"rep {r}: {elapsed:.2f}s  (alpha={res.alpha:.3f} "
                  f"beta={res.beta:.3f} in-sample mse={mse:.4f})", flush=True)


if __name__ == "__main__":
    main()
