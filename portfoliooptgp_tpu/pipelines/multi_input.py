"""Multi-input GPR pipeline — `MultiInputGPR` (Multi-Input_GPR/main.py)
rebuilt: correlation-gated covariate selection, composite feature×time
kernels, robustness study with random removals, horizon prediction, and
walk-forward daily retraining feeding the portfolio layer.

Step semantics (main.py):
- step 1 (:137-192): in-sample fit on [covariates..., time] inputs;
- step 2 (:194-263): refit with `removal_percentage` rows removed, MSE on the
  removed points;
- step 3 (:267-353): train+test horizon prediction, returns the last 5 days;
- step 4 (:356-459): walk-forward — for each test day i retrain on rows [:i]
  and predict row i (the reference's hot outer loop; here each refit's
  4-restart MLE is one vmapped batch, and `train_likelihood=False` mirrors
  the isFixedLikelihood=True path with σ² pinned).
Reference quirk preserved: when a menu of kernels is supplied the *last*
trained one wins, not the best (main.py:174-178,419-430; SURVEY.md §7.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu.data.handler import DataHandler
from portfoliooptgp_tpu.kernels import Exponential, composite_kernel
from portfoliooptgp_tpu.models import arima as arima_mod
from portfoliooptgp_tpu.models import gpr as gpr_mod
from portfoliooptgp_tpu.models.gpr import GPR
from portfoliooptgp_tpu.train import trainer

COMMODITY_FEATURES = {"Brent_Oil", "DXY", "XAU_USD"}
INDEX_FEATURES = {"SP500", "NasDaq100", "DJI", "RUT2000"}


def correlation(a, b) -> float:
    """Pearson correlation of two flattened series
    (Multi-Input_GPR/main.py:48-64)."""
    a = np.asarray(a, dtype=float).reshape(-1)
    b = np.asarray(b, dtype=float).reshape(-1)
    return float(np.corrcoef(np.stack([a, b]))[0, 1])


def full_correlations(X, Y=None) -> np.ndarray:
    """Full correlation matrix of [X columns (, Y)]
    (Multi-Input_GPR/main.py:67-94)."""
    X = np.asarray(X, dtype=float)
    if Y is not None:
        X = np.column_stack([X, np.asarray(Y, dtype=float).reshape(-1)])
    return np.corrcoef(X.T)


def remove_random_points(X, Y, removal_percentage: float, seed: int = 0):
    """(X_kept, Y_kept, X_removed, Y_removed, mask)
    (Multi-Input_GPR/main.py:96-115)."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    k = int(n * removal_percentage)
    mask = np.ones(n, dtype=bool)
    mask[rng.choice(n, size=k, replace=False)] = False
    return X[mask], Y[mask], X[~mask], Y[~mask], mask


@dataclass
class StepPrediction:
    f_mean: np.ndarray
    f_var: np.ndarray
    actual: np.ndarray
    Y_train: np.ndarray


class MultiInputGPR:
    def __init__(
        self,
        ticker: str,
        features: Sequence[str],
        train_start_date: str,
        train_end_date: str,
        test_start_date: str,
        test_end_date: str,
        kernel_pairs: Optional[Sequence] = None,
        threshold: float = 0.30,
        removal_percentage: float = 0.1,
        window_size: int = 3,
        predict_Y: str = "return",
        isFixedLikelihood: bool = True,
        noise_variance: float = 1e-3,
        data_root: str = ".",
        maxiter: int = 1000,
        verbose: bool = False,
        seed: int = 0,
    ):
        self.ticker = ticker
        self.features = list(features)
        self.kernel_pairs = list(kernel_pairs) if kernel_pairs else [(Exponential, Exponential)]
        self.threshold = threshold
        self.removal_percentage = removal_percentage
        self.predict_Y = predict_Y
        self.isFixed = isFixedLikelihood
        self.noise_variance = noise_variance
        self.maxiter = maxiter
        self.verbose = verbose
        self.seed = seed
        self.train_start_date = train_start_date
        self.train_end_date = train_end_date
        self.test_start_date = test_start_date
        self.test_end_date = test_end_date
        self.data_handler = DataHandler(
            train_start_date, train_end_date, test_start_date, test_end_date,
            window_size=window_size, data_root=data_root,
        )

    def _log(self, *a):
        if self.verbose:
            print(*a)

    def _file_type(self, feature: str) -> str:
        if feature in COMMODITY_FEATURES:
            return "Commodities"
        if feature in INDEX_FEATURES:
            return "Stocks/Index"
        return "Stocks"

    def _load_target(self, end_date: str, predict_Y: Optional[str] = None):
        return self.data_handler.process_data(
            "Stocks", self.ticker, "d", self.train_start_date, end_date,
            predict_Y=predict_Y or self.predict_Y,
        )

    def _gather_features(self, target_Y, target_stats, end_date: str,
                         predict_Y: str = "close"):
        """Correlation-gated covariate columns (main.py:369-394): keep a
        feature iff |corr(denormalized feature, denormalized target)| >
        threshold."""
        y_mean, y_std = target_stats
        cols = []
        kept = []
        for feature in self.features:
            ftype = self._file_type(feature)
            X_f, Y_f, _, (fm, fs), _ = self.data_handler.process_data(
                ftype, feature, "d", self.train_start_date, end_date,
                predict_Y=predict_Y,
            )
            corr = correlation(
                np.asarray(Y_f) * fs + fm, np.asarray(target_Y) * y_std + y_mean
            )
            self._log(f"Correlation between {feature} and {self.ticker}: {corr:.4f}")
            if abs(corr) > self.threshold:
                cols.append(np.asarray(Y_f))
                kept.append(feature)
        return cols, kept

    def _build_inputs(self, end_date: str, predict_Y_features: str = "close",
                      target_predict_Y: Optional[str] = None,
                      kept: Optional[Sequence[str]] = None):
        """Assemble X = [covariates..., time]. When `kept` is given, load
        exactly those features without re-gating — the reference gates ONCE
        on the train window and reuses the selection for the full window
        (main.py:386-394 fills _X and X_full in the same pass)."""
        X_t, Y_t, dates, y_stats, x_stats = self._load_target(end_date, target_predict_Y)
        if kept is None:
            cols, kept = self._gather_features(Y_t, y_stats, end_date, predict_Y_features)
        else:
            cols = []
            for feature in kept:
                _, Y_f, *_ = self.data_handler.process_data(
                    self._file_type(feature), feature, "d",
                    self.train_start_date, end_date, predict_Y=predict_Y_features,
                )
                cols.append(np.asarray(Y_f))
            kept = list(kept)
        cols.append(np.asarray(X_t))
        X = self.data_handler.concatenate_X(cols)
        return jnp.asarray(X), Y_t, dates, y_stats, x_stats, kept

    def _train(self, X, Y):
        """Kernel-pair loop with last-model-wins (main.py:419-430 quirk)."""
        model = None
        for k1, k2 in self.kernel_pairs:
            kern = composite_kernel(X.shape[1], k1, k2)
            if self.isFixed:
                m0 = GPR.create(kern, noise_variance=self.noise_variance)
                model = trainer.train_model(m0, X, Y, maxiter=self.maxiter).model
            else:
                model = trainer.train_likelihood(X, Y, kern, maxiter=self.maxiter).model
        return model

    # -- step 1: in-sample fit (main.py:137-192) -------------------------
    def run_step_1(self):
        X, Y, dates, y_stats, x_stats, kept = self._build_inputs(self.train_end_date)
        model = self._train(X, Y)
        f_mean, f_var = gpr_mod.predict_f(model, X, Y, X)
        mse = float(jnp.mean((f_mean - Y) ** 2))
        self._log(f"Mean Squared Error: {mse:.4f}")
        return {
            "model": model, "X": X, "Y": Y, "f_mean": f_mean, "f_var": f_var,
            "mse": mse, "kept_features": kept, "y_stats": y_stats,
        }

    # -- step 2: robustness with removed points (main.py:194-263) --------
    def run_step_2(self):
        X, Y, dates, y_stats, x_stats, kept = self._build_inputs(self.train_end_date)
        Xr, Yr, Xrm, Yrm, mask = remove_random_points(
            np.asarray(X), np.asarray(Y), self.removal_percentage, self.seed
        )
        model = self._train(jnp.asarray(Xr), jnp.asarray(Yr))
        f_mean, f_var = gpr_mod.predict_f(model, jnp.asarray(Xr), jnp.asarray(Yr), X)
        mse_all = float(jnp.mean((f_mean - Y) ** 2))
        mse_removed = float(np.mean((np.asarray(f_mean)[~mask] - Yrm) ** 2))
        self._log(f"MSE all: {mse_all:.4f}, MSE removed: {mse_removed:.4f}")
        return {
            "model": model, "mse_all": mse_all, "mse_removed": mse_removed,
            "X_removed": Xrm, "Y_removed": Yrm,
        }

    # -- step 3: horizon prediction (main.py:267-353) --------------------
    def run_step_3(self, horizon_tail: int = 5):
        # step 3/4 load covariates with the target's predict_Y over the train
        # window (main.py:283-295), unlike steps 1/2 which use close prices
        X, Y, _, _, _, kept = self._build_inputs(
            self.train_end_date, predict_Y_features=self.predict_Y
        )
        Xf, Yf, _, yf_stats, _, _ = self._build_inputs(
            self.test_end_date, predict_Y_features=self.predict_Y,
            target_predict_Y=self.predict_Y, kept=kept,
        )
        model = self._train(X, Y)
        f_mean, f_var = gpr_mod.predict_f(model, X, Y, Xf)
        mse = float(jnp.mean((f_mean - Yf) ** 2))
        self._log(f"MSE normalized (train+test, main.py:340 quirk): {mse:.4f}")
        yf_mean, yf_std = yf_stats
        return StepPrediction(
            f_mean=np.asarray(f_mean[-horizon_tail:]) * yf_std + yf_mean,
            f_var=np.asarray(f_var[-horizon_tail:]) * yf_std**2,
            actual=np.asarray(Yf[-horizon_tail:]) * yf_std + yf_mean,
            Y_train=np.asarray(Y),
        )

    # -- step 4: walk-forward retraining (main.py:356-459) ---------------
    def run_step_4(self, batched: bool = True):
        """Walk-forward daily retraining over the test window.

        batched=True (default) trains every day's refit as ONE fused
        batched L-BFGS via `pipelines.walk_forward.batched_walk_forward` —
        the pad-and-mask system that replaces the reference's sequential
        per-day loop (main.py:414-456). batched=False keeps the literal
        day-by-day loop; both produce the same predictions up to optimizer
        tolerance (tests/test_pipelines.py pins batched-vs-sequential).
        """
        X, Y, _, _, _, kept = self._build_inputs(
            self.train_end_date, predict_Y_features=self.predict_Y
        )
        # full-window loads use 'return' for target and covariates
        # (main.py:376-395 step-4 variant)
        Xf, Yf, _, yf_stats, _, _ = self._build_inputs(
            self.test_end_date, predict_Y_features="return",
            target_predict_Y="return", kept=kept,
        )
        n_train, n_full = Y.shape[0], Yf.shape[0]
        yf_mean, yf_std = yf_stats
        if batched:
            return self._step_4_batched(
                Xf, Yf, n_train, yf_mean, yf_std, np.asarray(Y)
            )
        f_means, f_vars, actuals = [], [], []
        for i in range(n_train, n_full):
            model = self._train(Xf[:i], Yf[:i])
            f_mean, f_var = gpr_mod.predict_f(model, Xf[:i], Yf[:i], Xf[: i + 1])
            f_means.append(float(f_mean[-1, 0]) * yf_std + yf_mean)
            f_vars.append(float(f_var[-1, 0]) * yf_std**2)
            actuals.append(float(Yf[i, 0]) * yf_std + yf_mean)
            self._log(f"walk-forward day {i - n_train + 1}: f_mean={f_means[-1]:.5f}")
        return StepPrediction(
            f_mean=np.asarray(f_means), f_var=np.asarray(f_vars),
            actual=np.asarray(actuals), Y_train=np.asarray(Y),
        )

    def _step_4_batched(self, Xf, Yf, n_train, yf_mean, yf_std, Y_train):
        """All walk-forward days as one pad-and-mask batched training.

        Only the LAST kernel pair is trained: the sequential loop trains the
        whole menu but keeps the last model (main.py:419-430 last-wins
        quirk), so the earlier pairs never influence the output.
        """
        from portfoliooptgp_tpu.pipelines.walk_forward import batched_walk_forward

        k1, k2 = self.kernel_pairs[-1]

        def make_model(noise_variance):
            kern = composite_kernel(Xf.shape[1], k1, k2)
            return GPR.create(kern, noise_variance=noise_variance)

        if self.isFixed:
            noise_inits = (self.noise_variance,)
        else:
            noise_inits = tuple(trainer.STARTING_VARIANCES)
        res = batched_walk_forward(
            Xf, Yf, n_train, make_model,
            restart_noise_inits=noise_inits,
            maxiter=self.maxiter,
            train_likelihood_variance=not self.isFixed,
        )
        d = res.f_mean.shape[0]
        for j in range(d):
            self._log(
                f"walk-forward day {j + 1}: "
                f"f_mean={float(res.f_mean[j]) * yf_std + yf_mean:.5f}"
            )
        return StepPrediction(
            f_mean=np.asarray(res.f_mean) * yf_std + yf_mean,
            f_var=np.asarray(res.f_var) * yf_std**2,
            actual=np.asarray(Yf[n_train:, 0]) * yf_std + yf_mean,
            Y_train=Y_train,
        )

    # -- ARIMA baseline (main.py:462-477) --------------------------------
    def run_arima(self, steps: int = 5, order=(3, 1, 0)):
        df = self.data_handler.process_df(
            "Stocks", self.ticker, "d", self.train_start_date, self.train_end_date, "close"
        )
        df_test = self.data_handler.process_df(
            "Stocks", self.ticker, "d", self.test_start_date, self.test_end_date, "close"
        )
        fc = arima_mod.fit_forecast(df.to_numpy().reshape(-1), order, steps)
        actual = df_test.to_numpy().reshape(-1)[:steps]
        mse = float(np.mean((fc[: len(actual)] - actual) ** 2))
        self._log(f"ARIMA MSE: {mse:.4f}")
        return {"forecast": fc, "actual": actual, "mse": mse}
