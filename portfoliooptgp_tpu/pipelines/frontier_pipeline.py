"""Config-5 workflow: n-asset multi-output GP posterior → efficient frontier.

BASELINE.json config 5: "Full portfolio: 20-asset multi-output GP posterior →
efficient-frontier weight optimization (efficient.py) with Bayesian
hyperparam NUTS". The reference only sketches this (efficient.py is a
hard-coded illustration). Pipeline:

1. load every asset's return series on the shared trading-day grid;
2. fit one ICM multi-output GPR by MLE (cross-asset covariance B learned,
   not assumed from empirical correlations);
3. optionally sample hyperparameters with NUTS and average the posterior
   predictive moments over draws (Bayesian model averaging);
4. posterior (μ, Σ) of next-period returns → long-only efficient frontier +
   tangency portfolio.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.data.handler import DataHandler
from portfoliooptgp_tpu.models import icm
from portfoliooptgp_tpu.portfolio.frontier import Frontier, efficient_frontier
from portfoliooptgp_tpu.train import lbfgs


@dataclass
class FrontierResult:
    assets: list
    mu: np.ndarray
    Sigma: np.ndarray
    frontier: Frontier
    model: object
    nuts_draws: Optional[int] = None


def run_frontier_pipeline(
    assets: Sequence[str],
    data_handler: DataHandler,
    *,
    predict_y: str = "return",
    rank: int = 2,
    noise_variance: float = 1e-2,
    maxiter: int = 300,
    horizon_rows: int = 1,
    use_nuts: bool = False,
    nuts_warmup: int = 200,
    nuts_samples: int = 200,
    nuts_chains: int = 2,
    nuts_max_depth: int = 8,
    risk_free_rate: float = 0.01 / 252,
    seed: int = 0,
) -> FrontierResult:
    # 1. shared-grid multi-output target matrix
    columns, X_ref = [], None
    for asset in assets:
        X, Y, *_ = data_handler.process_data(
            "Stocks", asset, "d", predict_Y=predict_y, normalize=False,
            normalize_x=False,
        )
        if X_ref is None:
            X_ref = X
        elif X.shape != X_ref.shape:
            raise ValueError(
                f"{asset} is not on the shared trading grid "
                f"({X.shape[0]} vs {X_ref.shape[0]} rows)"
            )
        columns.append(np.asarray(Y).reshape(-1))
    Ymat = jnp.asarray(np.column_stack(columns))
    # scale the day index for a well-conditioned kernel
    Xs = (X_ref - X_ref.mean()) / (X_ref.std() + 1e-12)
    p = len(assets)

    # 2. MLE fit of the ICM model
    model0 = icm.ICMGPR.create(
        km.SquaredExponential.create(), num_outputs=p, rank=rank,
        noise_variance=noise_variance, seed=seed,
    )
    # _chol variant: eigh(B)-only decomposition + batched Pallas-tier
    # Cholesky — equivalent values (rel ~1e-7) but avoids differentiating
    # TPU's serial eigh(Kx) in every optimizer/leapfrog step (models/icm.py)
    res = lbfgs.fit(
        lambda m: icm.neg_log_marginal_likelihood_chol(m, Xs, Ymat),
        model0, maxiter=maxiter,
    )
    model = res.params

    # horizon input: one step past the end of the grid in scaled units
    step = float(Xs[-1, 0] - Xs[-2, 0]) if Xs.shape[0] > 1 else 1.0
    Xnew = Xs[-1:] + step * horizon_rows

    draws = None
    if use_nuts:
        # 3. Bayesian averaging of predictive moments over the hyperposterior
        from portfoliooptgp_tpu.inference import sample_nuts

        def logdensity(m):
            flat, _ = jax.flatten_util.ravel_pytree(m)
            return -icm.neg_log_marginal_likelihood_chol(m, Xs, Ymat) - 0.5 * jnp.sum(flat**2)

        samples, _ = sample_nuts(
            logdensity, model, jax.random.PRNGKey(seed),
            num_warmup=nuts_warmup, num_samples=nuts_samples,
            num_chains=nuts_chains, max_depth=nuts_max_depth,
        )
        flat_samples = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), samples
        )
        draws = int(jax.tree.leaves(flat_samples)[0].shape[0])
        thin = max(draws // 64, 1)
        thinned = jax.tree.map(lambda x: x[::thin], flat_samples)

        def moments(m):
            # _chol variant: the vmap over draws would otherwise run one
            # serial TPU eigh(Kx) per draw in a single device execution
            return icm.posterior_asset_moments_chol(m, Xs, Ymat, Xnew)

        mus, Sigmas = jax.vmap(moments)(thinned)
        mu = jnp.mean(mus, axis=0)
        # law of total (co)variance: E[Σ] + Cov[μ]
        mu_dev = mus - mu
        Sigma = jnp.mean(Sigmas, axis=0) + mu_dev.T @ mu_dev / mus.shape[0]
    else:
        mu, Sigma = icm.posterior_asset_moments_chol(model, Xs, Ymat, Xnew)

    # 4. frontier
    frontier = efficient_frontier(
        np.asarray(mu), np.asarray(Sigma), risk_free_rate=risk_free_rate
    )
    return FrontierResult(
        assets=list(assets), mu=np.asarray(mu), Sigma=np.asarray(Sigma),
        frontier=frontier, model=model, nuts_draws=draws,
    )
