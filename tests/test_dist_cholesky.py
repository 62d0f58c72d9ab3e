"""Distributed blocked Cholesky NLL vs the dense single-device value."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr
from portfoliooptgp_tpu.parallel import mesh as mesh_mod
from portfoliooptgp_tpu.parallel.dist_cholesky import sharded_gpr_nll


@pytest.fixture
def problem(rng):
    n = 512
    X = jnp.asarray(np.sort(rng.uniform(0, 30, (n, 1)), 0))
    Y = jnp.sin(X) + 0.1 * jnp.asarray(rng.normal(size=(n, 1)))
    kern = km.SquaredExponential.create(variance=1.3, lengthscales=1.7)
    model = gpr.GPR.create(kern, noise_variance=0.05)
    K = kern.K(X)
    return model, K, X, Y


def test_sharded_nll_matches_dense(problem):
    model, K, X, Y = problem
    m = mesh_mod.make_mesh()  # 8 devices on data axis
    got = float(sharded_gpr_nll(K, Y, 0.05, m, block_size=32))
    want = float(gpr.neg_log_marginal_likelihood(model, X, Y))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sharded_nll_various_blocks(problem):
    model, K, X, Y = problem
    m = mesh_mod.make_mesh()
    want = float(gpr.neg_log_marginal_likelihood(model, X, Y))
    for nb in (16, 64):
        got = float(sharded_gpr_nll(K, Y, 0.05, m, block_size=nb))
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sharded_nll_fewer_devices(problem):
    model, K, X, Y = problem
    m = mesh_mod.make_mesh(data=4, restart=2)
    got = float(sharded_gpr_nll(K, Y, 0.05, m, block_size=64))
    want = float(gpr.neg_log_marginal_likelihood(model, X, Y))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def _dense_nll(K, Y, noise):
    n = K.shape[0]
    Ks = K + noise * jnp.eye(n, dtype=K.dtype)
    L = jnp.linalg.cholesky(Ks)
    a = jax.scipy.linalg.solve_triangular(L, Y, lower=True)
    return (
        0.5 * jnp.sum(a * a)
        + jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * jnp.log(2.0 * jnp.pi)
    )


def test_sharded_nll_grads_match_dense(problem):
    """The custom VJP (distributed blocked inverse) must equal dense
    autodiff gradients w.r.t. K, y, and the noise scalar."""
    model, K, X, Y = problem
    m = mesh_mod.make_mesh()
    noise = jnp.asarray(0.05, K.dtype)

    gK, gY, gn = jax.grad(
        lambda K, Y, s: sharded_gpr_nll(K, Y, s, m, block_size=32),
        argnums=(0, 1, 2),
    )(K, Y, noise)
    wK, wY, wn = jax.grad(_dense_nll, argnums=(0, 1, 2))(K, Y, noise)

    # dense autodiff spreads the symmetric gradient the same way (full
    # symmetric dNLL/dK), so the comparison is direct
    np.testing.assert_allclose(np.asarray(gK), np.asarray(wK), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gY), np.asarray(wY), rtol=1e-8)
    np.testing.assert_allclose(float(gn), float(wn), rtol=1e-8)


def test_sharded_nll_grads_match_dense_fast(rng):
    """Default-tier gate for the distributed-Cholesky custom VJP (VERDICT r4
    item 7): fast shape N=64 over the full 8-device mesh so a plain
    `pytest -q` covers the sharded factorization gradient."""
    n = 64
    X = jnp.asarray(np.sort(rng.uniform(0, 10, (n, 1)), 0))
    Y = jnp.sin(X) + 0.1 * jnp.asarray(rng.normal(size=(n, 1)))
    kern = km.SquaredExponential.create(variance=1.3, lengthscales=1.7)
    K = kern.K(X)
    m = mesh_mod.make_mesh()
    noise = jnp.asarray(0.05, K.dtype)

    gK, gY, gn = jax.grad(
        lambda K, Y, s: sharded_gpr_nll(K, Y, s, m, block_size=8),
        argnums=(0, 1, 2),
    )(K, Y, noise)
    wK, wY, wn = jax.grad(_dense_nll, argnums=(0, 1, 2))(K, Y, noise)
    np.testing.assert_allclose(np.asarray(gK), np.asarray(wK), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gY), np.asarray(wY), rtol=1e-8)
    np.testing.assert_allclose(float(gn), float(wn), rtol=1e-8)


def test_sharded_nll_trains_hyperparameters(problem):
    """grad flows through K(X; θ) → sharded NLL: one gradient step on the
    kernel hyperparameters must match the dense path exactly."""
    model, K, X, Y = problem
    m = mesh_mod.make_mesh(data=4, restart=2)

    def loss_sharded(kern):
        return sharded_gpr_nll(kern.K(X), Y, 0.05, m, block_size=64)

    def loss_dense(kern):
        return _dense_nll(kern.K(X), Y, jnp.asarray(0.05, X.dtype))

    g_s = jax.grad(loss_sharded)(model.kernel)
    g_d = jax.grad(loss_dense)(model.kernel)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_shape_validation(problem):
    model, K, X, Y = problem
    m = mesh_mod.make_mesh()
    with pytest.raises(ValueError):
        sharded_gpr_nll(K[:500, :500], Y[:500], 0.05, m, block_size=32)
    with pytest.raises(ValueError):
        sharded_gpr_nll(K, Y, 0.05, m, block_size=48)  # 48 does not divide 64


def test_cyclic_layout_matches_dense(problem):
    """1-D block-cyclic row ownership: same NLL as dense/contiguous."""
    model, K, X, Y = problem
    m = mesh_mod.make_mesh()
    want = float(gpr.neg_log_marginal_likelihood(model, X, Y))
    for nb in (16, 32, 64):
        got = float(sharded_gpr_nll(K, Y, 0.05, m, block_size=nb, layout="cyclic"))
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_cyclic_layout_grads_match_dense(problem):
    model, K, X, Y = problem
    m = mesh_mod.make_mesh()
    noise = jnp.asarray(0.05, K.dtype)
    gK, gY, gn = jax.grad(
        lambda K, Y, s: sharded_gpr_nll(K, Y, s, m, block_size=32, layout="cyclic"),
        argnums=(0, 1, 2),
    )(K, Y, noise)
    wK, wY, wn = jax.grad(_dense_nll, argnums=(0, 1, 2))(K, Y, noise)
    np.testing.assert_allclose(np.asarray(gK), np.asarray(wK), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gY), np.asarray(wY), rtol=1e-8)
    np.testing.assert_allclose(float(gn), float(wn), rtol=1e-8)


def test_cyclic_permutation_is_permutation():
    from portfoliooptgp_tpu.parallel.dist_cholesky import cyclic_row_permutation
    perm = cyclic_row_permutation(512, 8, 32)
    assert sorted(perm.tolist()) == list(range(512))
    # device 0's first block is global block 0; device 1's is global block 1
    assert perm[0] == 0 and perm[64] == 32
