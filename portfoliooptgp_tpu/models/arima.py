"""ARIMA(p, d, 0) baseline forecaster.

The reference fits statsmodels ARIMA(3,1,0) and takes a 5-step forecast as
the non-GP baseline (Multi-Input_GPR/main.py:462-477, models/arima.py:1-15).
statsmodels is not a dependency here; for a pure-AR model the
conditional-sum-of-squares fit is ordinary least squares on the differenced
series (no intercept, matching statsmodels' default trend for d>0), and
forecasting is the deterministic AR recursion followed by integration.
Host-side numpy — this is a tiny baseline, not a TPU path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ARIMAResult(NamedTuple):
    ar_coefs: np.ndarray
    sigma2: float
    order: tuple


def fit_arima(y, order=(3, 1, 0)) -> ARIMAResult:
    p, d, q = order
    if q != 0:
        raise NotImplementedError("moving-average terms not supported (reference uses (3,1,0))")
    z = np.asarray(y, dtype=float).reshape(-1)
    for _ in range(d):
        z = np.diff(z)
    if len(z) <= p:
        raise ValueError("series too short for AR order")
    # CSS: z_t = Σ_i φ_i z_{t-i} + ε_t, solved by least squares
    X = np.column_stack([z[p - i - 1 : len(z) - i - 1] for i in range(p)])
    target = z[p:]
    phi, *_ = np.linalg.lstsq(X, target, rcond=None)
    resid = target - X @ phi
    sigma2 = float(resid @ resid / max(len(target) - p, 1))
    return ARIMAResult(ar_coefs=phi, sigma2=sigma2, order=(p, d, q))


def forecast(y, result: ARIMAResult, steps: int = 5) -> np.ndarray:
    p, d, _ = result.order
    z = np.asarray(y, dtype=float).reshape(-1)
    levels = [z.copy()]
    for _ in range(d):
        levels.append(np.diff(levels[-1]))
    hist = list(levels[-1])
    preds = []
    for _ in range(steps):
        zt = float(np.dot(result.ar_coefs, hist[-1 : -p - 1 : -1]))
        preds.append(zt)
        hist.append(zt)
    # integrate back up d times
    out = np.asarray(preds)
    for lev in reversed(levels[:-1]):
        out = lev[-1] + np.cumsum(out)
    return out


def fit_forecast(y, order=(3, 1, 0), steps: int = 5) -> np.ndarray:
    return forecast(y, fit_arima(y, order), steps)
