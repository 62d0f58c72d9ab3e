"""Fused Pallas SVGP gram-phase kernels vs the XLA gram path (interpret
mode on CPU; the real-chip check lives in tools/smoke_tpu.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import svgp
from portfoliooptgp_tpu.models.likelihoods import Gaussian


def _problem(rng, n=96, m=16, d=1, kernel=None):
    X = jnp.asarray(np.sort(rng.uniform(0, 30, (n, d)), axis=0)
                    .astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
    Z = jnp.asarray(rng.uniform(0, 30, (m, d)).astype(np.float32))
    model = svgp.SVGP.create(
        kernel if kernel is not None else
        km.SquaredExponential.create(1.3, 4.0),
        inducing_points=Z, likelihood=Gaussian.create(0.05),
    )
    model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
    model = dataclasses.replace(
        model,
        q_mu=jnp.asarray(rng.normal(size=(m, 1)).astype(np.float32)),
        q_sqrt=jnp.asarray(
            (np.tril(rng.normal(size=(1, m, m)) * 0.2) + np.eye(m))
            .astype(np.float32)),
    )
    return model, X, Y


def _check(model, X, Y, w=None, rtol=2e-4, gtol=3e-3):
    args = dict(weights=w, num_data=200)
    assert svgp.svgp_gram_fused_supported(model, X)
    ref = float(svgp.gaussian_elbo_gram(model, X, Y, **args))
    gref = jax.grad(lambda m: svgp.gaussian_elbo_gram(m, X, Y, **args))(model)

    # both fast variants: XLA partials + inverse-pair M-phase (default) and
    # the Pallas kernel pair (use_pallas=True, interpret mode on CPU)
    for use_pallas in (False, True):
        got = float(svgp.gaussian_elbo_gram_fused(
            model, X, Y, use_pallas=use_pallas, **args))
        np.testing.assert_allclose(got, ref, rtol=rtol)
        ggot = jax.grad(lambda m: svgp.gaussian_elbo_gram_fused(
            m, X, Y, use_pallas=use_pallas, **args))(model)
        for a, b, p in zip(jax.tree.leaves(ggot), jax.tree.leaves(gref),
                           jax.tree_util.tree_leaves_with_path(gref)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a / scale, b / scale, atol=gtol,
                                       err_msg=f"{p[0]} pallas={use_pallas}")


def test_fused_matches_xla_se(rng):
    model, X, Y = _problem(rng)
    _check(model, X, Y)


def test_fused_matches_xla_weighted_padding(rng):
    model, X, Y = _problem(rng, n=100)
    w = jnp.asarray((np.arange(100) < 77).astype(np.float32))
    _check(model, X, Y, w=w)


def test_fused_matches_xla_ard_matern(rng):
    kern = km.Matern32.create(0.8, np.linspace(2.0, 5.0, 3))
    model, X, Y = _problem(rng, d=3, kernel=kern)
    _check(model, X, Y, gtol=5e-3)


def test_fused_matches_xla_constant_mean(rng):
    from portfoliooptgp_tpu.kernels.means import ConstantMean

    model, X, Y = _problem(rng)
    model = dataclasses.replace(
        model, mean_function=ConstantMean(c=jnp.asarray([0.7], jnp.float32)))
    _check(model, X, Y)


def test_unsupported_falls_back(rng):
    # composite kernel -> not eligible, but the fused entry still works
    kern = km.SquaredExponential.create() + km.Matern12.create()
    model, X, Y = _problem(rng, kernel=kern)
    assert not svgp.svgp_gram_fused_supported(model, X)
    ref = float(svgp.gaussian_elbo_gram(model, X, Y, num_data=200))
    got = float(svgp.gaussian_elbo_gram_fused(model, X, Y, num_data=200))
    np.testing.assert_allclose(got, ref, rtol=1e-6)
