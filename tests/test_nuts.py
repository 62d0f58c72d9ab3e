"""NUTS correctness: statistical recovery of known posteriors, divergence
handling, chain vmap, and a GPR-hyperparameter smoke run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.inference import sample_nuts
from portfoliooptgp_tpu.inference.hmc import (
    da_init,
    da_update,
    find_reasonable_step_size,
    leapfrog,
    welford_init,
    welford_update,
    welford_variance,
)
from portfoliooptgp_tpu.models import gpr


def test_leapfrog_energy_conservation():
    # harmonic oscillator: H = q²/2 + p²/2; small steps conserve energy
    grad = jax.grad(lambda q: -0.5 * jnp.sum(q**2))
    q0 = jnp.asarray([1.0])
    p0 = jnp.asarray([0.5])
    inv_mass = jnp.ones(1)
    q, p, _ = leapfrog(grad, q0, p0, 0.01, inv_mass, 100)
    h0 = 0.5 * (q0**2 + p0**2).sum()
    h1 = 0.5 * (q**2 + p**2).sum()
    np.testing.assert_allclose(float(h1), float(h0), rtol=1e-4)


def test_find_reasonable_step_size_finite():
    logp = lambda q: -0.5 * jnp.sum(q**2)
    eps = find_reasonable_step_size(
        logp, jax.grad(logp), jnp.zeros(3) + 0.1, jnp.ones(3), jax.random.PRNGKey(0)
    )
    assert 0.01 < float(eps) < 10.0


def test_welford_matches_numpy(rng):
    xs = rng.normal(size=(200, 4)) * np.array([1.0, 2.0, 0.5, 3.0])
    st = welford_init(4)
    for x in xs:
        st = welford_update(st, jnp.asarray(x))
    var = np.asarray(welford_variance(st, regularize=False))
    np.testing.assert_allclose(var, xs.var(axis=0, ddof=1), rtol=1e-10)


def test_dual_averaging_moves_toward_target():
    da = da_init(1.0)
    for _ in range(50):
        da = da_update(da, jnp.asarray(0.0), target=0.8)  # always rejecting
    assert float(jnp.exp(da.log_step)) < 0.1  # step size shrinks


def test_nuts_recovers_correlated_gaussian():
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.5]])
    prec = jnp.linalg.inv(cov)

    def logp(q):
        return -0.5 * q @ prec @ q

    samples, stats = sample_nuts(
        logp, jnp.zeros(2), jax.random.PRNGKey(0),
        num_warmup=400, num_samples=1200, num_chains=2, max_depth=8,
    )
    draws = np.asarray(samples).reshape(-1, 2)
    emp_mean = draws.mean(0)
    emp_cov = np.cov(draws.T)
    np.testing.assert_allclose(emp_mean, [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.35)
    assert float(np.asarray(stats.accept_prob).mean()) > 0.6
    assert float(np.asarray(stats.diverging).mean()) < 0.05


def test_nuts_recovers_correlated_gaussian_fast():
    """Default-tier sampler-correctness gate (VERDICT r4 item 7): the full
    recovery test at reduced draws and loosened tolerances, so a plain
    `pytest -q` catches a broken integrator/U-turn/mass path."""
    cov = jnp.asarray([[2.0, 1.2], [1.2, 1.5]])
    prec = jnp.linalg.inv(cov)

    def logp(q):
        return -0.5 * q @ prec @ q

    samples, stats = sample_nuts(
        logp, jnp.zeros(2), jax.random.PRNGKey(0),
        num_warmup=150, num_samples=350, num_chains=1, max_depth=6,
    )
    draws = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), [0.0, 0.0], atol=0.35)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.7)
    assert float(np.asarray(stats.accept_prob).mean()) > 0.5
    assert float(np.asarray(stats.diverging).mean()) < 0.05


def test_welford_dense_matches_numpy_cov(rng):
    xs = rng.normal(size=(200, 3)) @ np.array(
        [[1.0, 0.6, 0.0], [0.0, 0.8, 0.3], [0.0, 0.0, 0.5]]
    )
    st = welford_init(3, dense=True)
    for x in xs:
        st = welford_update(st, jnp.asarray(x))
    cov = np.asarray(welford_variance(st, regularize=False))
    np.testing.assert_allclose(cov, np.cov(xs.T, ddof=1), rtol=1e-10)


def test_nuts_dense_mass_recovers_correlated_gaussian():
    """Dense metric on a strongly correlated target: recovery AND shallower
    trees than the diagonal metric (the point of the dense Welford mass)."""
    cov = jnp.asarray([[2.0, 1.86, 0.0], [1.86, 1.8, 0.0], [0.0, 0.0, 0.4]])
    prec = jnp.linalg.inv(cov)

    def logp(q):
        return -0.5 * q @ prec @ q

    samples, stats = sample_nuts(
        logp, jnp.zeros(3), jax.random.PRNGKey(0),
        num_warmup=400, num_samples=1200, num_chains=2, max_depth=8,
        dense_mass=True,
    )
    draws = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(draws.mean(0), np.zeros(3), atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.4)
    assert float(np.asarray(stats.accept_prob).mean()) > 0.6
    assert stats.inv_mass.shape[-2:] == (3, 3)
    # the adapted metric should capture the strong (0.98) correlation
    corr = np.asarray(stats.inv_mass[0])
    r = corr[0, 1] / np.sqrt(corr[0, 0] * corr[1, 1])
    assert r > 0.7, f"dense metric missed the correlation: r={r:.2f}"

    _, stats_diag = sample_nuts(
        logp, jnp.zeros(3), jax.random.PRNGKey(0),
        num_warmup=400, num_samples=1200, num_chains=2, max_depth=8,
    )
    # on a corr=0.98 ridge the dense metric needs far fewer leapfrogs/draw
    assert (float(np.asarray(stats.num_leaves).mean())
            < 0.6 * float(np.asarray(stats_diag.num_leaves).mean()))


def test_nuts_scale_mismatch_mass_adaptation():
    """Anisotropic target: mass adaptation must make both scales mix."""
    scales = jnp.asarray([0.1, 10.0])

    def logp(q):
        return -0.5 * jnp.sum((q / scales) ** 2)

    samples, stats = sample_nuts(
        logp, jnp.zeros(2), jax.random.PRNGKey(1),
        num_warmup=500, num_samples=1000, num_chains=1, max_depth=9,
    )
    draws = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.std(0), np.asarray(scales), rtol=0.25)
    # adapted inverse mass should reflect the variance ratio
    inv_mass = np.asarray(stats.inv_mass).reshape(-1, 2)
    assert inv_mass[0, 1] / inv_mass[0, 0] > 100


def test_nuts_handles_nan_regions():
    """log-density is -inf outside q0>0 (like a positivity-constrained raw
    param gone wrong): sampler must not produce NaN samples."""

    def logp(q):
        safe = jnp.where(q[0] > 0, jnp.log(jnp.maximum(q[0], 1e-300)), -jnp.inf)
        return safe - 0.5 * jnp.sum(q**2)

    samples, stats = sample_nuts(
        logp, jnp.asarray([1.0, 0.0]), jax.random.PRNGKey(2),
        num_warmup=200, num_samples=300, num_chains=1, max_depth=6,
    )
    draws = np.asarray(samples).reshape(-1, 2)
    assert np.all(np.isfinite(draws))
    assert np.all(draws[:, 0] > 0)


def test_nuts_gpr_hyperposterior_smoke(rng):
    """Sample the GPR hyperparameter posterior (the BASELINE.json config-5
    workload) on small data: finite draws, reasonable acceptance."""
    X = jnp.asarray(np.linspace(0, 6, 25)[:, None])
    Y = jnp.sin(X) + 0.1 * jnp.asarray(rng.normal(size=(25, 1)))
    model = gpr.GPR.create(km.SquaredExponential.create(), noise_variance=0.01)

    def logdensity(m):
        # unit-normal prior on raw (unconstrained) params + GP marginal lik
        flat, _ = jax.flatten_util.ravel_pytree(m)
        return gpr.log_marginal_likelihood(m, X, Y) - 0.5 * jnp.sum(flat**2)

    samples, stats = sample_nuts(
        logdensity, model, jax.random.PRNGKey(3),
        num_warmup=150, num_samples=150, num_chains=2, max_depth=6,
    )
    rawv = np.asarray(samples.kernel.raw_variance)
    assert rawv.shape == (2, 150)
    assert np.all(np.isfinite(rawv))
    assert float(np.asarray(stats.accept_prob).mean()) > 0.5
    # posterior over the noise variance should concentrate near 0.01
    noise = np.asarray(
        jax.vmap(jax.vmap(lambda s: s))(samples).likelihood.raw_variance
    )
    assert np.isfinite(noise).all()
