"""Host-prefetch minibatch iterator feeding the sharded ELBO step."""

import numpy as np
import jax.numpy as jnp
import pytest

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.data.iterator import MinibatchIterator
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.models.svgp import SVGP
from portfoliooptgp_tpu.parallel import mesh as mesh_mod
from portfoliooptgp_tpu.train import svgp_trainer


@pytest.fixture
def data(rng):
    n = 100
    X = np.linspace(0, 10, n)[:, None]
    Y = np.sin(X) + 0.1 * rng.normal(size=(n, 1))
    return X, Y


def test_one_epoch_covers_every_row_once(data):
    X, Y = data
    with MinibatchIterator(X, Y, 32, num_epochs=1, seed=1) as it:
        batches = list(it)
    # 100 rows / 32 → 4 batches, last padded with weight-0 rows
    assert len(batches) == 4
    seen = []
    total_w = 0.0
    for Xb, Yb, wb in batches:
        assert Xb.shape == (32, 1) and wb.shape == (32,)
        w = np.asarray(wb)
        total_w += w.sum()
        seen.extend(np.asarray(Xb)[w > 0, 0].tolist())
    assert total_w == 100
    np.testing.assert_allclose(sorted(seen), X[:, 0])


def test_drop_remainder_and_determinism(data):
    X, Y = data
    with MinibatchIterator(X, Y, 32, num_epochs=1, seed=7, drop_remainder=True) as a:
        ba = [np.asarray(x) for x, _, _ in a]
    with MinibatchIterator(X, Y, 32, num_epochs=1, seed=7, drop_remainder=True) as b:
        bb = [np.asarray(x) for x, _, _ in b]
    assert len(ba) == 3
    for x1, x2 in zip(ba, bb):
        np.testing.assert_array_equal(x1, x2)


def test_sharded_batches_on_mesh(data):
    X, Y = data
    m = mesh_mod.make_mesh()  # 8-device data axis
    with MinibatchIterator(X, Y, 40, mesh=m, num_epochs=1) as it:
        Xb, Yb, wb = next(it)
    assert Xb.shape == (40, 1)
    # rows really land sharded over the data axis: 8 shards of 5 rows
    assert len(Xb.sharding.device_set) == 8
    shard_rows = sorted(s.data.shape[0] for s in Xb.addressable_shards)
    assert shard_rows == [5] * 8
    with pytest.raises(ValueError):
        MinibatchIterator(X, Y, 12, mesh=m)  # 12 % 8 != 0


def test_minibatched_svgp_training_reduces_elbo(data):
    X, Y = data
    m = mesh_mod.make_mesh()
    Z = np.linspace(0, 10, 12)[:, None]
    model = SVGP.create(
        km.SquaredExponential.create(),
        inducing_points=jnp.asarray(Z),
        likelihood=Gaussian.create(1e-2),
    )
    from portfoliooptgp_tpu.models import svgp as svgp_mod

    elbo0 = float(svgp_mod.elbo(model, jnp.asarray(X), jnp.asarray(Y)))
    res = svgp_trainer.train_svgp_minibatched(
        model, jnp.asarray(X), jnp.asarray(Y),
        batch_size=40, num_epochs=60, mesh=m, seed=3,
    )
    elbo1 = float(svgp_mod.elbo(res.model, jnp.asarray(X), jnp.asarray(Y)))
    assert int(res.iters) == 60 * 3  # ceil(100/40)=3 steps/epoch
    assert elbo1 > elbo0 + 10.0
