"""SVGP trainer workflows (test_scripts/SVGP.py parity) + intraday loader +
multi-host init no-op."""

import jax.numpy as jnp
import numpy as np
import pandas as pd

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.data import loader
from portfoliooptgp_tpu.models import svgp
from portfoliooptgp_tpu.parallel import distributed
from portfoliooptgp_tpu.train.svgp_trainer import train_svgp, train_svgp_menu


def make_data(rng, n=80):
    X = jnp.asarray(np.sort(rng.uniform(0, 360, (n, 1)), 0))
    Y = jnp.asarray(np.sin(np.asarray(X) / 30) + 0.1 * rng.normal(size=(n, 1)))
    return X, Y


def test_train_svgp_improves_elbo(rng):
    X, Y = make_data(rng)
    model = svgp.SVGP.create(
        km.SquaredExponential.create(lengthscales=30.0),
        inducing_points=np.linspace(0, 360, 20)[:, None],
    )
    t = train_svgp(model, X, Y, maxiter=100)
    assert float(t.elbo) > float(svgp.elbo(model, X, Y, num_data=X.shape[0]))
    # likelihood frozen by default (set_trainable False, SVGP.py:526)
    np.testing.assert_allclose(
        float(t.model.likelihood.raw_variance),
        float(model.likelihood.raw_variance), rtol=0,
    )


def test_svgp_menu_selects_sensible_kernel(rng):
    X, Y = make_data(rng, n=90)
    Xtr, Ytr, Xte, Yte = X[:70], Y[:70], X[70:], Y[70:]
    menu = [
        km.SquaredExponential.create(lengthscales=30.0),
        km.Linear.create(),
    ]
    res = train_svgp_menu(
        Xtr, Ytr, Xte, Yte, menu,
        inducing_points=np.linspace(0, 360, 20)[:, None], maxiter=100,
    )
    assert len(res.test_mses) == 2
    assert res.best_index == 0  # smooth periodic-ish data beats linear kernel
    assert res.test_mses[0] < res.test_mses[1]


def test_intraday_loader(tmp_path):
    for day, fname in [("2024-03-03", "a.csv"), ("2024-03-04", "b.csv")]:
        pd.DataFrame(
            {
                "DateTime": [f"{day} 00:00:00", f"{day} 00:01:00"],
                "Open": [100.0, 101.0], "High": [102.0, 103.0],
                "Low": [99.0, 100.0], "Close": [101.0, 102.0],
                "Type": [1, 1], "Volume": [55, 66],
            }
        ).to_csv(tmp_path / fname, index=False)
    # pass files out of order; loader must sort by time
    df = loader.read_intraday_csv([str(tmp_path / "b.csv"), str(tmp_path / "a.csv")])
    assert list(df.columns[:5]) == ["datetime", "open", "high", "low", "close"]
    assert df["datetime"].is_monotonic_increasing
    assert len(df) == 4


def test_distributed_initialize_noop(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    distributed.initialize()  # single-process: must be a no-op
    assert distributed.is_primary()
