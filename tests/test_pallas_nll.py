"""Fused Pallas NLL kernel vs the XLA reference path (interpret mode on the
CPU mesh; the same code compiles to Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr
from portfoliooptgp_tpu.ops.pallas import nll as nll_mod
from portfoliooptgp_tpu.train import lbfgs


def make_problem(rng, B=4, N=100):
    X = jnp.asarray(np.sort(rng.uniform(0, 20, (N, 1)), 0), dtype=jnp.float32)
    Y = jnp.asarray(
        np.sin(np.asarray(X)) + 0.1 * rng.normal(size=(N, 1)), dtype=jnp.float32
    )
    models = [
        gpr.GPR.create(
            km.SquaredExponential.create(variance=v, lengthscales=l),
            noise_variance=0.05,
        )
        for v, l in zip(np.geomspace(0.5, 2, B), np.geomspace(0.5, 3, B))
    ]
    # cast leaves to f32 for the fast path
    stacked = jax.tree.map(
        lambda x: x.astype(jnp.float32), lbfgs.stack_pytrees(models)
    )
    return stacked, X, Y


def test_fused_nll_matches_reference(rng):
    stacked, X, Y = make_problem(rng)
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-4)


def test_fused_nll_gradients_match(rng):
    stacked, X, Y = make_problem(rng, B=3, N=60)

    def loss_fast(m):
        return jnp.sum(gpr.batched_neg_log_marginal_likelihood(m, X, Y, fast=True))

    def loss_ref(m):
        return jnp.sum(gpr.batched_neg_log_marginal_likelihood(m, X, Y, fast=False))

    g_fast = jax.grad(loss_fast)(stacked)
    g_ref = jax.grad(loss_ref)(stacked)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_fused_nll_nonaligned_shapes(rng):
    # N=77 forces lane padding; B=3 forces sublane padding
    stacked, X, Y = make_problem(rng, B=3, N=77)
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-4)


def test_triangular_inverse_kernel(rng):
    B, N = 3, 64
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = np.einsum("brc,bdc->brd", A, A) + N * np.eye(N, dtype=np.float32)
    y = rng.normal(size=(B, N)).astype(np.float32)
    noise = np.full(B, 0.1, np.float32)
    _, L_layout, _ = nll_mod._factor_solve(
        jnp.asarray(K), jnp.asarray(y), jnp.asarray(noise), interpret=True
    )
    W = nll_mod.triangular_inverse_pallas(L_layout, interpret=True)
    Wb = np.transpose(np.asarray(W), (1, 0, 2))[:B, :N, :N]
    Lb = np.transpose(np.asarray(L_layout), (1, 2, 0))[:B, :N, :N]
    for b in range(B):
        np.testing.assert_allclose(
            Wb[b] @ Lb[b], np.eye(N), atol=2e-4
        )


def test_dispatch_falls_back_cleanly(rng):
    # float64 inputs must silently use the XLA path (parity mode)
    stacked, X, Y = make_problem(rng, B=2, N=40)
    X64, Y64 = X.astype(jnp.float64), Y.astype(jnp.float64)
    stacked64 = jax.tree.map(lambda x: x.astype(jnp.float64), stacked)
    out = gpr.batched_neg_log_marginal_likelihood(stacked64, X64, Y64, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked64, X64, Y64, fast=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)
