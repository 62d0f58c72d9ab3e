"""Single-asset multi-timescale pipeline — the `StockPredictor.run` workflow
(GPR/main.py:22-86) rebuilt on the TPU-native stack.

Per ticker: process daily/weekly/monthly data → kernel-menu training per
timescale (each menu entry trained with frozen σ²=1e-5, maxiter=100, winner
by train MSE — GPR/model_trainer.py:10-26) → per-timescale posterior
predictions → upsample weekly/monthly to daily → fit (α, β) blend weights →
extend with future-date grids → blended combined prediction with 95% bands.
Plotting is optional/injected (the reference writes PNGs inline,
GPR/main.py:28, 80-86)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu.data.handler import DataHandler
from portfoliooptgp_tpu.kernels import default_kernel_menu
from portfoliooptgp_tpu.pipelines import blend as blend_mod
from portfoliooptgp_tpu.train import trainer


@dataclass
class TimeframeResult:
    X: jnp.ndarray
    Y: jnp.ndarray
    dates: object
    y_stats: tuple
    model: object
    kernel_index: int
    mse: float


@dataclass
class SingleAssetResult:
    ticker: str
    timeframes: Dict[str, TimeframeResult]
    alpha: float
    beta: float
    X_combined_daily: jnp.ndarray
    f_mean: jnp.ndarray
    f_var: jnp.ndarray
    y_mean: jnp.ndarray
    y_var: jnp.ndarray

    def confidence_bands(self, which="f"):
        mean, var = (self.f_mean, self.f_var) if which == "f" else (self.y_mean, self.y_var)
        sd = jnp.sqrt(jnp.maximum(var, 0.0))
        return mean - 1.96 * sd, mean + 1.96 * sd


class StockPredictor:
    """GPR/main.py:12-86 parity orchestrator."""

    def __init__(
        self,
        tickers: Sequence[str],
        train_start_date: str,
        train_end_date: str,
        test_start_date: str,
        test_end_date: str,
        kernel_menu: Optional[Sequence] = None,
        lambda_: float = 0.01,
        predict_Y: str = "return",
        data_root: str = ".",
        maxiter: int = 100,
        noise_variance: float = 1e-5,
        horizon_days: int = 30,
        plot_fn: Optional[Callable] = None,
        mean_function=None,
    ):
        self.tickers = list(tickers)
        self.data_handler = DataHandler(
            train_start_date, train_end_date, test_start_date, test_end_date,
            data_root=data_root,
        )
        self.kernel_menu_fn = (lambda: list(kernel_menu)) if kernel_menu is not None else default_kernel_menu
        self.lambda_ = lambda_
        self.predict_Y = predict_Y
        self.maxiter = maxiter
        self.noise_variance = noise_variance
        self.horizon_days = horizon_days
        self.plot_fn = plot_fn
        # script workloads train with non-zero mean functions — Polynomial(2)
        # at test_scripts/GPR.py:103, Linear at test_scripts/GPFlow.py:186-205
        self.mean_function = mean_function

    def _train_timeframe(self, ticker: str, timeframe: str) -> TimeframeResult:
        X, Y, dates, y_stats, _ = self.data_handler.process_data(
            "Stocks", ticker, timeframe, predict_Y=self.predict_Y, normalize_x=False
        )
        menu = self.kernel_menu_fn()
        res = trainer.train_best_model(
            X, Y, menu, noise_variance=self.noise_variance, maxiter=self.maxiter,
            mean_function=self.mean_function,
        )
        return TimeframeResult(
            X=X, Y=Y, dates=dates, y_stats=y_stats,
            model=res.best.model, kernel_index=res.best_index, mse=float(res.best.mse),
        )

    def run_ticker(self, ticker: str, timeframes=("d", "w", "m")) -> SingleAssetResult:
        tf_results = {t: self._train_timeframe(ticker, t) for t in timeframes}
        d, w, m = (tf_results[t] for t in ("d", "w", "m"))

        # in-sample single predictions for the blend fit (GPR/main.py:47-56)
        f_d, *_ = blend_mod.predict_single(d.model, d.X, d.Y, d.X)
        f_w, *_ = blend_mod.predict_single(w.model, w.X, w.Y, w.X)
        f_m, *_ = blend_mod.predict_single(m.model, m.X, m.Y, m.X)
        f_w_up = blend_mod.upsample_predictions(d.X, w.X, f_w, period="w")
        f_m_up = blend_mod.upsample_predictions(d.X, m.X, f_m, period="m")
        weights = blend_mod.optimize_blend_weights(
            d.Y, f_d, f_w_up, f_m_up, lambda_=self.lambda_
        )

        # horizon grids per timescale (GPR/main.py:60-66)
        combined = {}
        for tag, r in (("d", d), ("w", w), ("m", m)):
            fut = self.data_handler.generate_future_dates(
                ticker, tag, self.horizon_days, file_type="Stocks"
            )
            combined[tag] = jnp.concatenate([r.X, fut], axis=0)

        f_mean, f_var, y_mean, y_var = blend_mod.predict_combined(
            weights.alpha, weights.beta, d.model, w.model, m.model,
            (d.X, d.Y), (w.X, w.Y), (m.X, m.Y),
            combined["d"], combined["w"], combined["m"],
        )
        result = SingleAssetResult(
            ticker=ticker, timeframes=tf_results,
            alpha=weights.alpha, beta=weights.beta,
            X_combined_daily=combined["d"],
            f_mean=f_mean, f_var=f_var, y_mean=y_mean, y_var=y_var,
        )
        if self.plot_fn is not None:
            self.plot_fn(result)
        return result

    def run(self, timeframes=("d", "w", "m")) -> Dict[str, SingleAssetResult]:
        return {t: self.run_ticker(t, timeframes) for t in self.tickers}
