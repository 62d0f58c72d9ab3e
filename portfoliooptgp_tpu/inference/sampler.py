"""NUTS/HMC sampling driver: warmup adaptation, chain vmap, pytree support.

`sample_nuts` is the user-facing API: give it a log-density over a parameter
pytree (e.g. GPR hyperparameters in unconstrained space) and it returns
stacked posterior samples. Chains are a vmapped batch axis; on a mesh the
chain axis shards like restarts (SURVEY.md §2.3 chain parallelism), and with
`axis_name` the warmup statistics are psum-combined across devices.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from portfoliooptgp_tpu.inference import hmc as hmc_mod
from portfoliooptgp_tpu.inference import nuts as nuts_mod


class SampleStats(NamedTuple):
    accept_prob: jnp.ndarray
    num_leaves: jnp.ndarray
    diverging: jnp.ndarray
    step_size: jnp.ndarray
    inv_mass: jnp.ndarray


def _warmup_and_sample_flat(
    logp_fn: Callable,
    q0: jnp.ndarray,
    key,
    num_warmup: int,
    num_samples: int,
    max_depth: int,
    target_accept: float,
    axis_name: Optional[str],
    grad_fn: Optional[Callable] = None,
):
    grad_fn = grad_fn if grad_fn is not None else jax.grad(logp_fn)
    dtype = q0.dtype
    dim = q0.shape[0]

    inv_mass0 = jnp.ones((dim,), dtype)
    key, k_eps = jax.random.split(key)
    eps0 = hmc_mod.find_reasonable_step_size(logp_fn, grad_fn, q0, inv_mass0, k_eps)
    da = hmc_mod.da_init(eps0)
    wf = hmc_mod.welford_init(dim, dtype)

    mass_start = int(num_warmup * 0.15)
    mass_end = int(num_warmup * 0.9)

    def warmup_step(carry, i):
        q, logp, key, da, wf, inv_mass = carry
        key, k_step = jax.random.split(key)
        eps = jnp.exp(da.log_step)
        q, logp, info = nuts_mod.nuts_step(
            logp_fn, grad_fn, q, logp, k_step, eps, inv_mass, max_depth
        )
        accept = info.accept_prob
        if axis_name is not None:
            accept = jax.lax.pmean(accept, axis_name)
        da = hmc_mod.da_update(da, accept, target=target_accept)
        in_mass_window = (i >= mass_start) & (i < mass_end)
        wf = jax.tree.map(
            lambda new, old: jnp.where(in_mass_window, new, old),
            hmc_mod.welford_update(wf, q), wf,
        )

        # at the end of the mass window: set mass, reset step-size adaptation
        at_switch = i == mass_end
        new_inv_mass = hmc_mod.welford_variance(wf, axis_name)
        inv_mass = jnp.where(at_switch, new_inv_mass, inv_mass)
        da = jax.tree.map(
            lambda fresh, old: jnp.where(at_switch, fresh, old),
            hmc_mod.da_init(jnp.exp(da.log_step)), da,
        )
        return (q, logp, key, da, wf, inv_mass), None

    logp0 = logp_fn(q0)
    (q, logp, key, da, wf, inv_mass), _ = jax.lax.scan(
        warmup_step, (q0, logp0, key, da, wf, inv_mass0),
        jnp.arange(num_warmup),
    )
    eps_final = jnp.exp(da.log_step_avg)

    def sample_step(carry, _):
        q, logp, key = carry
        key, k_step = jax.random.split(key)
        q, logp, info = nuts_mod.nuts_step(
            logp_fn, grad_fn, q, logp, k_step, eps_final, inv_mass, max_depth
        )
        return (q, logp, key), (q, info.accept_prob, info.num_leaves, info.diverging)

    (_, _, _), (qs, accepts, leaves, divs) = jax.lax.scan(
        sample_step, (q, logp, key), None, length=num_samples
    )
    stats = SampleStats(
        accept_prob=accepts, num_leaves=leaves, diverging=divs,
        step_size=eps_final, inv_mass=inv_mass,
    )
    return qs, stats


def sample_nuts(
    logdensity_fn: Callable,
    init_params,
    key,
    num_warmup: int = 500,
    num_samples: int = 500,
    num_chains: int = 1,
    max_depth: int = 10,
    target_accept: float = 0.8,
    axis_name: Optional[str] = None,
    grad_fn: Optional[Callable] = None,
):
    """Sample a pytree-parameter posterior with multi-chain NUTS.

    `grad_fn` (pytree → pytree, optional) overrides jax.grad(logdensity_fn):
    pass the pair from `inference.fused_logdensity.gpr_logdensity_pair` to
    evaluate all chains' leapfrogs in one fused Pallas NLL call each.

    Returns (samples_pytree with leading axes [chain, draw], SampleStats).
    """
    flat0, unravel = ravel_pytree(init_params)

    def logp_flat(z):
        return logdensity_fn(unravel(z))

    grad_flat = None
    if grad_fn is not None:
        def grad_flat(z):
            return ravel_pytree(grad_fn(unravel(z)))[0]

    def one_chain(key):
        key, k_init = jax.random.split(key)
        # jitter chain inits around the provided point
        q0 = flat0 + 0.1 * jax.random.normal(k_init, flat0.shape, dtype=flat0.dtype)
        return _warmup_and_sample_flat(
            logp_flat, q0, key, num_warmup, num_samples, max_depth,
            target_accept, axis_name, grad_fn=grad_flat,
        )

    keys = jax.random.split(key, num_chains)
    qs, stats = jax.vmap(one_chain)(keys)  # (chain, draw, dim)
    samples = jax.vmap(jax.vmap(unravel))(qs)
    return samples, stats
