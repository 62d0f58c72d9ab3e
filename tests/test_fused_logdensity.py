"""Chain-batched GPR log-density for NUTS (inference/fused_logdensity.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.inference.fused_logdensity import (
    gpr_logdensity_pair,
    gpr_logdensity_vg,
)
from portfoliooptgp_tpu.inference.sampler import sample_nuts
from portfoliooptgp_tpu.models import gpr


def _problem(rng, N=96):
    X = jnp.asarray(np.sort(rng.uniform(0, 60, (N, 1))), jnp.float32)
    Y = jnp.sin(X / 8) + 0.1 * jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    m0 = gpr.GPR.create(km.SquaredExponential.create(1.0, 5.0), noise_variance=0.1)
    return X, Y, jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), m0)


def _stack(m0, C):
    return jax.tree.map(
        lambda x: jnp.stack([x] * C)
        * jnp.linspace(0.9, 1.1, C).reshape((C,) + (1,) * jnp.ndim(x)),
        m0,
    )


def test_scalar_and_vmapped_match_dense(rng):
    X, Y, m0 = _problem(rng)
    logp, grad = gpr_logdensity_pair(X, Y)
    assert abs(float(logp(m0)) - float(gpr.log_marginal_likelihood(m0, X, Y))) < 1e-3

    ms = _stack(m0, 4)
    lpv = jax.vmap(logp)(ms)
    lpr = jax.vmap(lambda m: gpr.log_marginal_likelihood(m, X, Y))(ms)
    np.testing.assert_allclose(np.asarray(lpv), np.asarray(lpr), rtol=1e-4)

    gv = jax.vmap(grad)(ms)
    gr = jax.vmap(jax.grad(lambda m: gpr.log_marginal_likelihood(m, X, Y)))(ms)
    for a, b in zip(jax.tree.leaves(gv), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_vg_scalar_and_vmapped_match_dense(rng):
    # the joint value+grad surface (custom_vmap rule via jax.vjp of the
    # batched NLL) used by bench.py / sample_nuts — checked against
    # jax.value_and_grad of the dense log-density, scalar and vmapped
    X, Y, m0 = _problem(rng)
    vg = gpr_logdensity_vg(X, Y)
    dense = jax.value_and_grad(lambda m: gpr.log_marginal_likelihood(m, X, Y))

    v, g = vg(m0)
    vr, gr = dense(m0)
    assert abs(float(v) - float(vr)) < 1e-3
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

    ms = _stack(m0, 4)
    vv, gv = jax.vmap(vg)(ms)
    vrv, grv = jax.vmap(dense)(ms)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(vrv), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(gv), jax.tree.leaves(grv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_logprior_is_added(rng):
    X, Y, m0 = _problem(rng)

    def prior(m):
        return -0.5 * jnp.sum(m.kernel.raw_lengthscales ** 2)

    logp, grad = gpr_logdensity_pair(X, Y, logprior_fn=prior)
    want = float(gpr.log_marginal_likelihood(m0, X, Y)) + float(prior(m0))
    assert abs(float(logp(m0)) - want) < 1e-3
    ms = _stack(m0, 3)
    lpv = jax.vmap(logp)(ms)
    lpr = jax.vmap(lambda m: gpr.log_marginal_likelihood(m, X, Y) + prior(m))(ms)
    np.testing.assert_allclose(np.asarray(lpv), np.asarray(lpr), rtol=1e-4)


def test_sample_nuts_with_fused_pair_runs(rng):
    # warmup must be long enough for step-size adaptation: with ~15 steps
    # even the plain-XLA f32 path diverges on this posterior
    X, Y, m0 = _problem(rng, N=64)
    logp, grad = gpr_logdensity_pair(X, Y)
    samples, stats = sample_nuts(
        logp, m0, jax.random.key(0), num_warmup=50, num_samples=15,
        num_chains=2, max_depth=5, grad_fn=grad,
    )
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(samples))
    assert float(stats.accept_prob.mean()) > 0.3
