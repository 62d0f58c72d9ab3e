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


def probability_a_greater_than_b_mvnorm_sharded(
    mu_a, cov_a, mu_b, cov_b, mesh, num_samples: int = 10_000, seed: int = 0
):
    """Mesh-sharded MC estimate: each device draws its num_samples/n_dev
    share from a per-device folded key and a single `psum` combines the
    hit counts — the SURVEY §2.3 "MC sampling parallelism" axis as an
    actual code path. The estimate is a valid MC probability at every
    device count (different RNG streams per device, so the value differs
    from the single-device draw only by MC error ~1/√num_samples)."""
    from jax.sharding import PartitionSpec as P

    from portfoliooptgp_tpu.parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    local = -(-num_samples // n_dev)  # ceil: total ≥ requested budget
    mu_a = jnp.asarray(mu_a, jnp.result_type(float))
    cov_a = jnp.asarray(cov_a, mu_a.dtype)
    mu_b = jnp.asarray(mu_b, mu_a.dtype)
    cov_b = jnp.asarray(cov_b, mu_a.dtype)

    def shard(mu_a, cov_a, mu_b, cov_b):
        idx = jax.lax.axis_index(DATA_AXIS)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), idx)
        key_a, key_b = jax.random.split(key)
        sa = _mvn_sample(key_a, mu_a, cov_a, local)
        sb = _mvn_sample(key_b, mu_b, cov_b, local)
        hits = jnp.sum(jnp.all(sa > sb, axis=1))
        return jax.lax.psum(hits, DATA_AXIS)

    f = jax.shard_map(
        shard, mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )
    return float(f(mu_a, cov_a, mu_b, cov_b)) / (local * n_dev)
