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


def test_shape_validation(problem):
    model, K, X, Y = problem
    m = mesh_mod.make_mesh()
    with pytest.raises(ValueError):
        sharded_gpr_nll(K[:500, :500], Y[:500], 0.05, m, block_size=32)
    with pytest.raises(ValueError):
        sharded_gpr_nll(K, Y, 0.05, m, block_size=48)  # 48 does not divide 64
