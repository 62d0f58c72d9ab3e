"""Batched (fused-loss) L-BFGS vs the vmapped per-model optimizer."""

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr
from portfoliooptgp_tpu.train import batched_lbfgs, lbfgs


def test_batched_rosenbrock():
    def batched_loss(Z):
        x, y = Z[:, 0], Z[:, 1]
        return (1 - x) ** 2 + 100 * (y - x**2) ** 2

    Z0 = jnp.asarray([[-1.2, 1.0], [0.0, 0.0], [2.0, 2.0]])
    res = batched_lbfgs.fit_matrix(batched_loss, Z0, maxiter=400)
    np.testing.assert_allclose(np.asarray(res.params), 1.0, atol=1e-5)
    assert bool(jnp.all(res.converged))


def test_batched_quadratics_independent():
    """Rows with different conditioning converge independently."""
    scales = jnp.asarray([1.0, 100.0, 0.01])

    def batched_loss(Z):
        return jnp.sum(Z**2 * scales[:, None], axis=-1)

    Z0 = jnp.ones((3, 4)) * 5.0
    res = batched_lbfgs.fit_matrix(batched_loss, Z0, maxiter=200)
    np.testing.assert_allclose(np.asarray(res.params), 0.0, atol=1e-4)


def test_fused_gpr_restarts_match_vmapped(rng):
    """The fused trainer must reach optima at least as good as the vmapped
    optax L-BFGS on the same batch of GPR restarts."""
    X = jnp.asarray(np.linspace(0, 6, 40)[:, None], dtype=jnp.float32)
    Y = jnp.asarray(
        np.sin(np.asarray(X)) + 0.1 * rng.normal(size=(40, 1)), dtype=jnp.float32
    )
    models = [
        gpr.GPR.create(km.SquaredExponential.create(variance=v), noise_variance=0.05)
        for v in (0.3, 1.0, 3.0, 10.0)
    ]
    stacked = jax.tree.map(lambda x: x.astype(jnp.float32), lbfgs.stack_pytrees(models))
    frozen = lbfgs.freeze_leaves(models[0], likelihood=True)

    fused_models, fused = batched_lbfgs.fit_batched_fused(
        lambda ms: gpr.batched_neg_log_marginal_likelihood(ms, X, Y),
        stacked, frozen=frozen, maxiter=200, gtol=1e-6,
    )
    ref = lbfgs.fit_batched(
        lambda m: gpr.neg_log_marginal_likelihood(m, X, Y),
        stacked, maxiter=200, frozen=frozen, gtol=1e-6,
    )
    # per-restart losses within tolerance of the vmapped optimizer
    np.testing.assert_allclose(
        np.asarray(fused.loss), np.asarray(ref.loss), rtol=1e-3, atol=1e-2
    )
    # frozen likelihood stayed exactly at its initial raw value
    np.testing.assert_allclose(
        np.asarray(fused_models.likelihood.raw_variance),
        np.asarray(stacked.likelihood.raw_variance),
        rtol=0,
    )


def test_frozen_mask_flat():
    def batched_loss(Z):
        return jnp.sum((Z - 3.0) ** 2, axis=-1)

    Z0 = jnp.zeros((2, 3))
    mask = jnp.asarray([True, False, False])
    res = batched_lbfgs.fit_matrix(batched_loss, Z0, maxiter=100, frozen_mask=mask)
    np.testing.assert_allclose(np.asarray(res.params[:, 0]), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(res.params[:, 1:]), 3.0, atol=1e-6)


def test_divergent_row_does_not_poison_batch():
    """A row whose loss is NaN everywhere must not stop the others."""

    def batched_loss(Z):
        base = jnp.sum(Z**2, axis=-1)
        return base.at[0].set(jnp.nan)

    Z0 = jnp.ones((3, 2)) * 2.0
    res = batched_lbfgs.fit_matrix(batched_loss, Z0, maxiter=100)
    np.testing.assert_allclose(np.asarray(res.params[1:]), 0.0, atol=1e-6)
