"""Batched walk-forward vs the sequential reference loop."""

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr
from portfoliooptgp_tpu.pipelines import walk_forward as wf
from portfoliooptgp_tpu.train import lbfgs, trainer


def make_series(rng, n=48):
    X = jnp.asarray(np.linspace(0, 8, n)[:, None])
    Y = jnp.sin(X) + 0.08 * jnp.asarray(rng.normal(size=(n, 1)))
    return X, Y


def test_masked_nll_equals_subset_nll(rng):
    X, Y = make_series(rng)
    model = gpr.GPR.create(km.SquaredExponential.create(), noise_variance=0.05)
    for k in (10, 25, 48):
        mask = jnp.asarray((np.arange(48) < k).astype(float))
        got = float(wf.masked_nll(model, X, Y, mask))
        want = float(gpr.neg_log_marginal_likelihood(model, X[:k], Y[:k]))
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_masked_predict_matches_subset_predict(rng):
    X, Y = make_series(rng)
    model = gpr.GPR.create(km.Matern32.create(), noise_variance=0.05)
    k = 30
    mask = jnp.asarray((np.arange(48) < k).astype(float))
    mean, var = wf.masked_predict_next(model, X, Y, mask, k)
    want_mean, want_var = gpr.predict_f(model, X[:k], Y[:k], X[k : k + 1])
    np.testing.assert_allclose(float(mean), float(want_mean[0, 0]), rtol=1e-7)
    np.testing.assert_allclose(float(var), float(want_var[0, 0]), rtol=1e-6, atol=1e-10)


def test_batched_walk_forward_matches_sequential_small(rng):
    """Default-tier walk-forward parity gate (VERDICT r3 item 5): a 2-day,
    1-restart case of the batched-vs-sequential check, sized to run in a few
    seconds so plain `pytest` fails if pad-and-mask batching breaks. The
    full 5-day 2-restart case below stays in the --slow tier."""
    X, Y = make_series(rng, n=32)
    n_train, n_days = 30, 2
    res = wf.batched_walk_forward(
        X, Y, n_train,
        make_model=lambda v: gpr.GPR.create(km.SquaredExponential.create(), v),
        restart_noise_inits=(1e-3,),
        maxiter=150, gtol=1e-7,
    )
    for d in range(n_days):
        i = n_train + d
        t = trainer.train_likelihood(
            X[:i], Y[:i], km.SquaredExponential.create(),
            starting_variances=(1e-3,), maxiter=150,
        )
        m, v = gpr.predict_f(t.model, X[:i], Y[:i], X[i: i + 1])
        np.testing.assert_allclose(float(res.f_mean[d]), float(m[0, 0]),
                                   rtol=0.05, atol=5e-3)
        np.testing.assert_allclose(float(res.f_var[d]), float(v[0, 0]),
                                   rtol=0.2, atol=1e-4)


def test_batched_walk_forward_matches_sequential(rng):
    """The batched pad-and-mask walk-forward must reproduce the sequential
    retrain-per-day loop (train_likelihood semantics) within optimizer
    tolerance."""
    X, Y = make_series(rng, n=40)
    n_train, n_days = 35, 5

    res = wf.batched_walk_forward(
        X, Y, n_train,
        make_model=lambda v: gpr.GPR.create(km.SquaredExponential.create(), v),
        restart_noise_inits=(1e-3, 1e-1),
        maxiter=300, gtol=1e-7,
    )
    assert res.f_mean.shape == (n_days,)

    # sequential reference
    seq_means, seq_vars = [], []
    for d in range(n_days):
        i = n_train + d
        t = trainer.train_likelihood(
            X[:i], Y[:i], km.SquaredExponential.create(),
            starting_variances=(1e-3, 1e-1), maxiter=300,
        )
        m, v = gpr.predict_f(t.model, X[:i], Y[:i], X[i : i + 1])
        seq_means.append(float(m[0, 0]))
        seq_vars.append(float(v[0, 0]))

    np.testing.assert_allclose(np.asarray(res.f_mean), seq_means, rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.f_var), seq_vars, rtol=0.2, atol=1e-4)


def test_walk_forward_warm_start_matches_cold(rng):
    """warm_start=True (day-0 pre-train + tiled polish) must land on the
    same optima as the cold run: growing-prefix refits move hyperparameters
    little, so the polish phase converges to the same losses/predictions."""
    X, Y = make_series(rng, n=40)
    kw = dict(
        make_model=lambda v: gpr.GPR.create(km.SquaredExponential.create(), v),
        restart_noise_inits=(1e-3, 1e-1),
        gtol=1e-7,
    )
    cold = wf.batched_walk_forward(X, Y, 35, maxiter=300, **kw)
    warm = wf.batched_walk_forward(
        X, Y, 35, maxiter=300, warm_start=True, warm_maxiter=60, **kw
    )
    np.testing.assert_allclose(
        np.asarray(warm.losses), np.asarray(cold.losses), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(warm.f_mean), np.asarray(cold.f_mean), rtol=0.02, atol=2e-3
    )


def test_walk_forward_fused_f32_path(rng):
    """float32 inputs route through the fused Pallas kernel (interpret mode
    on CPU) and still produce finite, sane predictions."""
    X, Y = make_series(rng, n=40)
    X32, Y32 = X.astype(jnp.float32), Y.astype(jnp.float32)
    res = wf.batched_walk_forward(
        X32, Y32, 32,
        make_model=lambda v: jax.tree.map(
            lambda x: x.astype(jnp.float32),
            gpr.GPR.create(km.SquaredExponential.create(), v),
        ),
        restart_noise_inits=(1e-2,),
        maxiter=150,
    )
    assert np.all(np.isfinite(np.asarray(res.f_mean)))
    assert np.all(np.asarray(res.f_var) >= 0)
    # predictions should roughly track the underlying sine
    truth = np.sin(np.asarray(X[32:40, 0]))
    assert np.mean((np.asarray(res.f_mean) - truth) ** 2) < 0.1


def test_masked_system_through_blocked_tiers(rng):
    """The large-N walk-forward branch feeds masked systems (own diagonal,
    zero added noise) through the blocked NLL tiers; values must equal the
    dense masked_nll."""
    from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

    N = 288  # > pallas dense ceiling -> blocked window
    X = jnp.asarray(np.sort(rng.uniform(0, 60, (N, 1))), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    ms = [gpr.GPR.create(km.SquaredExponential.create(v, 4.0), 0.1)
          for v in (0.6, 1.4)]
    import jax

    from portfoliooptgp_tpu.train import lbfgs as lb

    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lb.stack_pytrees(ms))
    masks = jnp.asarray(np.arange(N)[None, :] < np.array([200, 288])[:, None],
                        jnp.float32)
    Kb, errb = jax.vmap(
        lambda m, msk: wf.masked_system(m, X, Y, msk))(stacked, masks)
    nll = bn.batched_nll_blocked(Kb, errb[:, :, 0],
                                 jnp.zeros((2,), jnp.float32))
    n_eff = jnp.sum(masks, axis=1)
    nll = nll - 0.5 * (N - n_eff) * jnp.log(2.0 * jnp.pi)
    want = jax.vmap(lambda m, msk: wf.masked_nll(m, X, Y, msk))(stacked, masks)
    np.testing.assert_allclose(np.asarray(nll), np.asarray(want), rtol=3e-4)
