"""Monte-Carlo probability estimates for the dynamic strategy.

Replaces scipy.stats sampling on CPU (Strategies/dynamic_strategy.py:24-58,
10,000 samples per decision) with batched `jax.random` draws — trivially
shardable across the mesh data axis for larger budgets (SURVEY.md §2.3 MC
sampling parallelism). Also the closed-form 1-D comparison
(dynamic_strategy.py:13-20).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm


def probability_a_greater_than_b_cdf(mu_a, sigma_a, mu_b, sigma_b):
    """P(A > B) for independent 1-D normals: 1 − Φ(0; μ_A−μ_B, √(σ_A²+σ_B²))."""
    mu_diff = mu_a - mu_b
    sigma_diff = jnp.sqrt(sigma_a**2 + sigma_b**2)
    return 1.0 - norm.cdf(0.0, loc=mu_diff, scale=sigma_diff)


def _mvn_sample(key, mu, cov, num_samples):
    mu = jnp.asarray(mu, dtype=jnp.result_type(float))
    cov = jnp.asarray(cov, dtype=mu.dtype)
    # jitter for rank-deficient covariances (correlation-scaled outer products
    # in Portfolio/portfolio.py:137 can be singular)
    L = jnp.linalg.cholesky(cov + 1e-12 * jnp.eye(cov.shape[0], dtype=mu.dtype))
    z = jax.random.normal(key, (num_samples, mu.shape[0]), dtype=mu.dtype)
    return mu + z @ L.T


def probability_a_greater_than_b_mvnorm(
    mu_a, cov_a, mu_b, cov_b, num_samples: int = 10_000, seed: int = 0
):
    """MC estimate of P(A > B in every dimension) for two MVNs
    (dynamic_strategy.py:24-58; all-dims comparison at :52)."""
    key_a, key_b = jax.random.split(jax.random.PRNGKey(seed))
    sa = _mvn_sample(key_a, mu_a, cov_a, num_samples)
    sb = _mvn_sample(key_b, mu_b, cov_b, num_samples)
    return float(jnp.mean(jnp.all(sa > sb, axis=1)))
