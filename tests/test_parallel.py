"""Sharded-ELBO correctness on the virtual 8-device CPU mesh: the psum path
must agree with the single-device ELBO, gradients included."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import svgp
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.parallel import elbo_sharded, mesh as mesh_mod


@pytest.fixture
def setup(rng):
    n = 64
    X = jnp.asarray(np.sort(rng.uniform(0, 6, size=(n, 1)), axis=0))
    Y = jnp.sin(X) + 0.1 * jnp.asarray(rng.normal(size=(n, 1)))
    model = svgp.SVGP.create(
        km.SquaredExponential.create(),
        inducing_points=np.linspace(0, 6, 12)[:, None],
        likelihood=Gaussian.create(0.05),
    )
    return model, X, Y


def test_mesh_construction():
    m = mesh_mod.make_mesh()
    assert m.size == 8
    assert set(m.axis_names) == {"data", "restart"}
    m2 = mesh_mod.make_mesh(data=4, restart=2)
    assert m2.shape["data"] == 4 and m2.shape["restart"] == 2


def test_sharded_elbo_matches_single_device(setup):
    model, X, Y = setup
    m = mesh_mod.make_mesh()
    Xs, Ys, w = elbo_sharded.prepare_global_batch(m, X, Y)
    got = float(elbo_sharded.sharded_neg_elbo(model, Xs, Ys, w, 64, m))
    want = float(svgp.neg_elbo(model, X, Y, num_data=64))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_sharded_elbo_with_padding(setup):
    """60 rows over 8 shards: 4 padding rows must contribute nothing."""
    model, X, Y = setup
    X, Y = X[:60], Y[:60]
    m = mesh_mod.make_mesh()
    Xs, Ys, w = elbo_sharded.prepare_global_batch(m, X, Y)
    assert Xs.shape[0] == 64 and float(jnp.sum(w)) == 60
    got = float(elbo_sharded.sharded_neg_elbo(model, Xs, Ys, w, 60, m))
    want = float(svgp.neg_elbo(model, X, Y, num_data=60))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_sharded_gradients_match(setup):
    model, X, Y = setup
    m = mesh_mod.make_mesh()
    Xs, Ys, w = elbo_sharded.prepare_global_batch(m, X, Y)

    g_sharded = jax.grad(
        lambda mod: elbo_sharded.sharded_neg_elbo(mod, Xs, Ys, w, 64, m)
    )(model)
    g_single = jax.grad(lambda mod: svgp.neg_elbo(mod, X, Y, num_data=64))(model)
    for a, b in zip(jax.tree.leaves(g_sharded), jax.tree.leaves(g_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_distributed_train_step_reduces_loss(setup):
    model, X, Y = setup
    m = mesh_mod.make_mesh()
    Xs, Ys, w = elbo_sharded.prepare_global_batch(m, X, Y)
    init_fn, step_fn = elbo_sharded.make_elbo_train_step(
        64, mesh=m, optimizer=optax.adam(5e-2)
    )
    state = init_fn(model)
    state, first = step_fn(state, Xs, Ys, w)
    for _ in range(30):
        state, loss = step_fn(state, Xs, Ys, w)
    assert float(loss) < float(first)


def test_single_device_train_step_matches_sharded_trajectory(setup):
    """One step on the mesh == one step on one device (same grads, same Adam
    update), proving sharding changes performance, not semantics."""
    model, X, Y = setup
    m = mesh_mod.make_mesh()
    Xs, Ys, w = elbo_sharded.prepare_global_batch(m, X, Y)
    init_m, step_m = elbo_sharded.make_elbo_train_step(64, mesh=m)
    init_s, step_s = elbo_sharded.make_elbo_train_step(64, mesh=None)
    w1 = jnp.ones((64,), X.dtype)
    sm, lm = step_m(init_m(model), Xs, Ys, w)
    ss, ls = step_s(init_s(model), X, Y, w1)
    np.testing.assert_allclose(float(lm), float(ls), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(sm.model), jax.tree.leaves(ss.model)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9)


def test_restart_axis_sharding(setup):
    """Batched restarts sharded over the restart axis still select the same
    winner as the unsharded batch."""
    from portfoliooptgp_tpu.models import gpr as gpr_mod
    from portfoliooptgp_tpu.train import lbfgs

    _, X, Y = setup
    m = mesh_mod.make_mesh(data=1, restart=8)
    models = [
        gpr_mod.GPR.create(km.SquaredExponential.create(variance=v), noise_variance=0.05)
        for v in np.geomspace(0.1, 10.0, 8)
    ]
    stacked = lbfgs.stack_pytrees(models)
    sharded = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.NamedSharding(m, jax.sharding.PartitionSpec("restart"))
        ),
        stacked,
    )
    loss = lambda mod: gpr_mod.neg_log_marginal_likelihood(mod, X, Y)
    res = lbfgs.fit_batched(loss, sharded, maxiter=50)
    res_ref = lbfgs.fit_batched(loss, stacked, maxiter=50)
    np.testing.assert_allclose(np.asarray(res.loss), np.asarray(res_ref.loss), rtol=1e-6)


def test_sharded_mc_probability_matches_single_device():
    """Mesh-sharded MC P(A>B) (SURVEY §2.3 MC-parallelism axis): the psum'd
    estimate agrees with the single-device estimate within MC error and is
    deterministic for a fixed seed."""
    from portfoliooptgp_tpu.parallel.mesh import make_mesh
    from portfoliooptgp_tpu.portfolio.montecarlo import (
        probability_a_greater_than_b_mvnorm,
        probability_a_greater_than_b_mvnorm_sharded,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    mesh = make_mesh(data=len(jax.devices()), restart=1)
    mu_a = np.array([0.01, 0.012, 0.008])
    mu_b = np.array([0.008, 0.009, 0.007])
    cov = 1e-4 * (0.5 * np.eye(3) + 0.5)
    p1 = probability_a_greater_than_b_mvnorm(mu_a, cov, mu_b, cov,
                                             num_samples=40_000)
    p2 = probability_a_greater_than_b_mvnorm_sharded(
        mu_a, cov, mu_b, cov, mesh, num_samples=40_000)
    p2_again = probability_a_greater_than_b_mvnorm_sharded(
        mu_a, cov, mu_b, cov, mesh, num_samples=40_000)
    assert p2 == p2_again  # deterministic per-device folded keys
    assert abs(p1 - p2) < 0.02  # MC error at 40k samples
    assert 0.0 < p2 < 1.0
