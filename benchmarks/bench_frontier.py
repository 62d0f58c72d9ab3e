"""Config-5 hardware evidence (VERDICT r4 item 6): the ICM multi-output GP
-> (optional NUTS hyperposterior averaging) -> efficient-frontier pipeline
at a 20-asset shape, timed on the real chip.

BASELINE.json config 5; the reference only mocks the frontier
(efficient.py:96-107), so the quality gates are structural: tangency
weights on the simplex, frontier vol monotone in target return, PSD
posterior covariance.

Run ON THE TPU HOST:  python benchmarks/bench_frontier.py [--nuts]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ASSETS = 20


def make_assets(root: str, seed: int = 11):
    import pandas as pd

    rng = np.random.default_rng(seed)
    days = pd.bdate_range("2023-06-01", "2024-05-31")
    n = len(days)
    drivers = np.cumsum(0.01 * rng.normal(size=(n, 3)), axis=0)
    names = [f"AS{i:02d}" for i in range(N_ASSETS)]
    for i, t in enumerate(names):
        beta = rng.normal(scale=0.6, size=3) + np.array([0.8, 0.0, 0.0])
        close = 100 * np.exp(drivers @ beta
                             + np.cumsum(0.004 * rng.normal(size=n)))
        d = os.path.join(root, "Stocks", t)
        os.makedirs(d, exist_ok=True)
        pd.DataFrame({
            "date": days.strftime("%Y-%m-%d"),
            "open": close * 0.998, "high": close * 1.01, "low": close * 0.99,
            "close": close, "adjusted_close": close, "volume": 1_000_000,
        }).to_csv(os.path.join(d, f"{t}_us_d.csv"), index=False)
    return names, days


def main():
    import jax

    import _cache
    _cache.enable()

    from portfoliooptgp_tpu.data.handler import DataHandler
    from portfoliooptgp_tpu.pipelines.frontier_pipeline import (
        run_frontier_pipeline)

    use_nuts = "--nuts" in sys.argv
    print(f"backend={jax.default_backend()} assets={N_ASSETS} "
          f"nuts={use_nuts}", flush=True)

    with tempfile.TemporaryDirectory() as root:
        names, days = make_assets(root)
        dh = DataHandler(
            train_start_date=str(days[0].date()),
            train_end_date=str(days[-1].date()),
            test_start_date=str(days[-1].date()),
            test_end_date=str(days[-1].date()),
            data_root=root,
        )
        t0 = time.perf_counter()
        # budget sized so the one-jit sampling executes in <~1 min on the
        # chip: ~3.3 ms per 2-chain leapfrog at (P=20, N=261); a single
        # device execution lasting several minutes trips the remote
        # tunnel's watchdog and kills the worker (NEXT_STEPS protocol)
        res = run_frontier_pipeline(
            names, dh, rank=3, maxiter=300,
            use_nuts=use_nuts, nuts_warmup=100, nuts_samples=100,
            nuts_chains=2, nuts_max_depth=6,
        )
        elapsed = time.perf_counter() - t0

    f = res.frontier
    w = np.asarray(f.tangency_weights)
    assert np.all(np.isfinite(res.mu)) and np.all(np.isfinite(res.Sigma))
    evals = np.linalg.eigvalsh(res.Sigma)
    assert evals.min() > -1e-8, f"non-PSD posterior Sigma ({evals.min()})"
    assert abs(w.sum() - 1.0) < 1e-4 and np.all(w >= -1e-6), "tangency simplex"
    vols = np.asarray(f.volatilities)
    rets = np.asarray(f.returns)
    order = np.argsort(rets)
    assert np.all(np.diff(vols[order]) > -1e-6), \
        "frontier vol not monotone in sorted return"
    sharpe = (f.tangency_return - 0.01 / 252) / max(f.tangency_volatility,
                                                    1e-12)
    print(f"frontier pipeline ({'MLE+NUTS' if use_nuts else 'MLE'}): "
          f"{elapsed:.2f}s  (draws={res.nuts_draws}, tangency "
          f"sharpe={sharpe:.3f}, vol={f.tangency_volatility:.5f})",
          flush=True)


if __name__ == "__main__":
    main()
