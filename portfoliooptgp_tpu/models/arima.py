"""ARIMA(p, d, q) baseline forecaster.

The reference fits statsmodels ARIMA(3,1,0) and takes a 5-step forecast as
the non-GP baseline (Multi-Input_GPR/main.py:462-477, models/arima.py:1-15).
statsmodels is not a dependency here; the fit is conditional sum of squares
(CSS, statsmodels' pre-1.0 default and still its CSS option) with no
intercept, matching statsmodels' default trend for d>0:

- pure AR (q=0): CSS is ordinary least squares on the differenced series —
  solved exactly, no iteration (this is the only order the reference ever
  uses, so the parity path stays closed-form);
- general ARMA (q>0): ε_t = z_t − Σφ_i z_{t−i} − Σθ_j ε_{t−j} with ε
  initialized to zero over the pre-sample, Hannan–Rissanen initialization
  (long-AR residual proxies + OLS), then an L-BFGS-B polish of the CSS
  objective.

Host-side numpy/scipy — this is a tiny baseline, not a TPU path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class ARIMAResult(NamedTuple):
    ar_coefs: np.ndarray
    ma_coefs: np.ndarray
    sigma2: float
    order: tuple


def _css_residuals(z, phi, theta):
    """CSS innovation recursion: ε_t for t = m..len(z)-1 with m = max(p, q)
    conditioning steps (pre-sample ε treated as zero)."""
    p, q = len(phi), len(theta)
    m = max(p, q)
    n = len(z)
    eps = np.zeros(n)
    for t in range(m, n):
        ar = np.dot(phi, z[t - p:t][::-1]) if p else 0.0
        ma = np.dot(theta, eps[t - q:t][::-1]) if q else 0.0
        eps[t] = z[t] - ar - ma
    return eps[m:]


def _pacf_to_coef(r):
    """Levinson–Durbin map from partial autocorrelations r ∈ (−1,1)^k to AR
    coefficients of a stationary process (Monahan 1984). Applied to −θ it
    likewise yields invertible MA coefficients."""
    a = np.zeros(len(r))
    for j in range(len(r)):
        a[:j] = a[:j] - r[j] * a[:j][::-1]
        a[j] = r[j]
    return a


def _coef_to_pacf(a):
    """Inverse Levinson–Durbin; nonstationary inputs are clipped into the
    open unit box so they can seed the constrained optimization."""
    a = np.array(a, dtype=float)
    r = np.zeros(len(a))
    for j in range(len(a) - 1, -1, -1):
        r[j] = a[j]
        if j > 0:
            denom = 1.0 - r[j] * r[j]
            if abs(denom) < 1e-12:
                denom = np.copysign(1e-12, denom)
            a[:j] = (a[:j] + r[j] * a[:j][::-1]) / denom
    return np.clip(r, -0.98, 0.98)


def _hannan_rissanen_init(z, p, q):
    """Stage-1 long-AR fit for residual proxies, stage-2 OLS of z on its own
    lags and lagged residuals — the standard ARMA starting point."""
    n = len(z)
    h = min(max(2 * (p + q), 8), n // 2)
    eps = np.zeros(n)
    if h >= 1 and n > 2 * h:
        Xh = np.column_stack([z[h - i - 1: n - i - 1] for i in range(h)])
        a, *_ = np.linalg.lstsq(Xh, z[h:], rcond=None)
        eps[h:] = z[h:] - Xh @ a
    m = max(p, q)
    cols = [z[m - i - 1: n - i - 1] for i in range(p)]
    cols += [eps[m - j - 1: n - j - 1] for j in range(q)]
    X = np.column_stack(cols) if cols else np.zeros((n - m, 0))
    beta, *_ = np.linalg.lstsq(X, z[m:], rcond=None)
    return beta[:p], beta[p:]


def fit_arima(y, order=(3, 1, 0)) -> ARIMAResult:
    p, d, q = order
    z = np.asarray(y, dtype=float).reshape(-1)
    for _ in range(d):
        z = np.diff(z)
    if len(z) <= max(p, q, 1):
        raise ValueError("series too short for ARMA order")

    if q == 0:
        # CSS for pure AR: z_t = Σ_i φ_i z_{t-i} + ε_t — exact least squares
        X = np.column_stack([z[p - i - 1: len(z) - i - 1] for i in range(p)])
        target = z[p:]
        phi, *_ = np.linalg.lstsq(X, target, rcond=None)
        resid = target - X @ phi
        sigma2 = float(resid @ resid / max(len(target) - p, 1))
        return ARIMAResult(ar_coefs=phi, ma_coefs=np.zeros(0), sigma2=sigma2,
                           order=(p, d, q))

    from scipy.optimize import minimize

    # Optimize in the Monahan/PACF space: x unconstrained, r = tanh(x) in
    # (−1,1), Levinson–Durbin maps r to coefficients. Every iterate is a
    # stationary AR / invertible MA model, matching statsmodels' default
    # enforce_stationarity/enforce_invertibility behavior.
    phi0, theta0 = _hannan_rissanen_init(z, p, q)
    # Sign convention: this module's CSS recursion is
    # ε_t = z_t − φ·z − θ·ε, i.e. the MA polynomial is 1 + θ(B).
    # Invertibility of 1 + θ(B) ⇔ stationarity of 1 − (−θ)(B), so the
    # Levinson–Durbin map is applied to −θ (see _pacf_to_coef docstring);
    # mapping +θ would parametrize the stationary set instead of the
    # invertible one — reachable non-invertible fits AND unreachable
    # invertible optima for q ≥ 2.
    x0 = np.arctanh(np.concatenate([_coef_to_pacf(phi0),
                                    _coef_to_pacf(-theta0)]))

    def unpack(x):
        r = np.tanh(x)
        return _pacf_to_coef(r[:p]), -_pacf_to_coef(r[p:])

    def css(x):
        phi, theta = unpack(x)
        eps = _css_residuals(z, phi, theta)
        return float(eps @ eps)

    res = minimize(css, x0, method="L-BFGS-B")
    phi_hat, theta_hat = unpack(res.x)
    x = np.concatenate([phi_hat, theta_hat])
    eps = _css_residuals(z, x[:p], x[p:])
    sigma2 = float(eps @ eps / max(len(eps) - p - q, 1))
    return ARIMAResult(ar_coefs=x[:p], ma_coefs=x[p:], sigma2=sigma2,
                       order=(p, d, q))


def forecast(y, result: ARIMAResult, steps: int = 5) -> np.ndarray:
    p, d, q = result.order
    z = np.asarray(y, dtype=float).reshape(-1)
    levels = [z.copy()]
    for _ in range(d):
        levels.append(np.diff(levels[-1]))
    zd = levels[-1]
    hist = list(zd)
    # in-sample innovations for the MA memory (zero for future steps)
    if q:
        m = max(p, q)
        eps_tail = np.zeros(m + len(_css_residuals(zd, result.ar_coefs,
                                                   result.ma_coefs)))
        eps_tail[m:] = _css_residuals(zd, result.ar_coefs, result.ma_coefs)
        eps_hist = list(eps_tail)
    preds = []
    for h in range(steps):
        ar = (float(np.dot(result.ar_coefs, hist[-1: -p - 1: -1]))
              if p else 0.0)
        ma = 0.0
        if q:
            ma = float(np.dot(result.ma_coefs, eps_hist[-1: -q - 1: -1]))
            eps_hist.append(0.0)  # future innovations have zero expectation
        zt = ar + ma
        preds.append(zt)
        hist.append(zt)
    # integrate back up d times
    out = np.asarray(preds)
    for lev in reversed(levels[:-1]):
        out = lev[-1] + np.cumsum(out)
    return out


def fit_forecast(y, order=(3, 1, 0), steps: int = 5) -> np.ndarray:
    return forecast(y, fit_arima(y, order), steps)
