"""Multi-timescale prediction blending (GPR/predictor.py + GPR/optimizer.py).

Semantics preserved exactly, including the statistically naive parts that are
the reference's parity surface (SURVEY.md §3.5, §7.5):

- weekly/monthly posterior means AND variances are linearly interpolated onto
  the daily day-index grid (GPR/predictor.py:35-51);
- the blend is convex with weights (α, β, 1−α−β) applied to means and
  variances alike (:10-33);
- (α, β) are fit by minimizing MSE + λ(|α|+|β|) over α,β ∈ [0,1], α+β ≤ 1
  (GPR/optimizer.py:13-27) — solved on-device via a 3-way softmax (the third
  logit is the slack 1−α−β).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from portfoliooptgp_tpu.models import gpr as gpr_mod
from portfoliooptgp_tpu.train import lbfgs


def predict_single(model, X, Y, Xnew):
    """(f_mean, f_var, y_mean, y_var) like Predictor.predict_single
    (GPR/predictor.py:5-8), with one shared posterior cache."""
    cache = gpr_mod.posterior(model, X, Y)
    f_mean, f_var = gpr_mod.predict_f(model, X, Y, Xnew, cache=cache)
    y_mean, y_var = gpr_mod.predict_y(model, X, Y, Xnew, cache=cache)
    return f_mean, f_var, y_mean, y_var


def upsample_predictions(x_daily, x_coarse, values, period="w"):
    """Linear interpolation of coarse-timescale values onto the daily grid
    (GPR/predictor.py:35-51). `period='d'` passes through unchanged."""
    if period == "d":
        return jnp.asarray(values)
    xd = np.asarray(x_daily).reshape(-1)
    xc = np.asarray(x_coarse).reshape(-1)
    v = np.asarray(values).reshape(-1)
    s = pd.Series(v, index=xc).reindex(xd).interpolate(method="linear")
    # reference leaves NaNs at edges outside the coarse range; fill like its
    # pandas pipeline does implicitly when ranges align (ffill/bfill edges)
    s = s.ffill().bfill()
    return jnp.asarray(s.to_numpy().reshape(-1, 1))


class BlendWeights(NamedTuple):
    alpha: float
    beta: float


def blend(alpha, beta, daily, weekly_upsampled, monthly_upsampled):
    return (
        alpha * daily
        + beta * weekly_upsampled
        + (1.0 - alpha - beta) * monthly_upsampled
    )


def optimize_blend_weights(Y, f_daily, f_weekly_up, f_monthly_up, lambda_=0.01,
                           maxiter=300) -> BlendWeights:
    """Fit (α, β) by SLSQP-equivalent on-device optimization
    (GPR/optimizer.py:20-27; λ set per-run, e.g. 0.1 at GPR/main.py:117)."""
    Y = jnp.asarray(Y).reshape(-1)
    d = jnp.asarray(f_daily).reshape(-1)
    w = jnp.asarray(f_weekly_up).reshape(-1)
    m = jnp.asarray(f_monthly_up).reshape(-1)

    def loss(z):
        abc = jax.nn.softmax(z)
        alpha, beta = abc[0], abc[1]
        pred = blend(alpha, beta, d, w, m)
        mse = jnp.mean((Y - pred) ** 2)
        return mse + lambda_ * (jnp.abs(alpha) + jnp.abs(beta))

    z0 = jnp.log(jnp.asarray([0.33, 0.33, 0.34]))
    res = lbfgs.fit(loss, z0, maxiter=maxiter)
    abc = jax.nn.softmax(res.params)
    return BlendWeights(alpha=float(abc[0]), beta=float(abc[1]))


def predict_combined(alpha, beta, daily_model, weekly_model, monthly_model,
                     data_daily, data_weekly, data_monthly,
                     X_daily, X_weekly, X_monthly):
    """Predictor.predict_combined parity (GPR/predictor.py:10-33): predict per
    timescale, upsample weekly/monthly means and variances (f and y), blend
    convexly. `data_*` are the (X_train, Y_train) pairs per timescale."""
    out = {}
    for tag, model, (Xt, Yt), Xn in (
        ("d", daily_model, data_daily, X_daily),
        ("w", weekly_model, data_weekly, X_weekly),
        ("m", monthly_model, data_monthly, X_monthly),
    ):
        out[tag] = predict_single(model, Xt, Yt, Xn)

    up = {}
    for tag in ("w", "m"):
        up[tag] = tuple(
            upsample_predictions(X_daily, {"w": X_weekly, "m": X_monthly}[tag], v, period=tag)
            for v in out[tag]
        )

    blended = tuple(
        blend(alpha, beta, out["d"][i], up["w"][i], up["m"][i]) for i in range(4)
    )
    return blended  # (f_mean, f_var, y_mean, y_var)
