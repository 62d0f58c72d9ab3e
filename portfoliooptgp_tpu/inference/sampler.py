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


def centered_normal_logprior(init_params, scale: float = 2.0):
    """Weakly-informative N(init, scale²) log-prior over the raw
    (unconstrained) hyperparameters, for use as `logprior_fn`.

    Sampling the bare GPR marginal likelihood (a flat prior on raw
    softplus-parameters) targets an improper ridge posterior — the
    variance↔lengthscale ridge is barely integrable and forces NUTS into
    ~0.01 step sizes and 127-leaf trees (measured on the N=128 bench
    posterior; 5 orders of magnitude eigen-spread in the sample covariance).
    A weak prior centered at the initialization makes the posterior proper:
    same acceptance target, ~8-leaf trees, 10× the draws/s. This mirrors
    standard practice for GP MCMC (e.g. gpflow's MCMC notebooks place
    priors on every hyperparameter before running HMC)."""
    flat0, _ = ravel_pytree(init_params)
    inv2 = 1.0 / (scale * scale)

    def logprior(m):
        z, _ = ravel_pytree(m)
        return -0.5 * inv2 * jnp.sum((z - flat0) ** 2)

    return logprior


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
    vg_fn: Optional[Callable] = None,
    dense_mass: bool = False,
):
    if grad_fn is None:
        grad_fn = (lambda z: vg_fn(z)[1]) if vg_fn is not None else jax.grad(logp_fn)
    if vg_fn is None:
        vg_fn = (lambda z: (logp_fn(z), grad_fn(z)))
    dtype = q0.dtype
    dim = q0.shape[0]

    inv_mass0 = jnp.eye(dim, dtype=dtype) if dense_mass else jnp.ones((dim,), dtype)
    chol0 = hmc_mod.mass_chol(inv_mass0)
    key, k_eps = jax.random.split(key)
    eps0 = hmc_mod.find_reasonable_step_size(logp_fn, grad_fn, q0, inv_mass0, k_eps)
    if axis_name is not None:
        # shared adaptation: geometric-mean initial step so every lockstep
        # chain adapts the SAME step size. Without this, chains adapt step
        # sizes differing by >10x, and since vmapped chains integrate in
        # lockstep, one small-step chain forces maximal trees on all of them
        # (measured: per-chain mean 62 leaves/draw but lockstep mean 207).
        eps0 = jnp.exp(jax.lax.pmean(jnp.log(eps0), axis_name))
    da = hmc_mod.da_init(eps0)
    wf = hmc_mod.welford_init(dim, dtype, dense=dense_mass)

    mass_start = int(num_warmup * 0.15)
    mass_end = int(num_warmup * 0.9)

    def warmup_step(carry, i):
        q, logp, grad, key, da, wf, inv_mass, chol = carry
        key, k_step = jax.random.split(key)
        eps = jnp.exp(da.log_step)
        q, logp, grad, info = nuts_mod.nuts_step(
            vg_fn, q, logp, k_step, eps, inv_mass, max_depth, grad0=grad,
            mass_chol_factor=chol,
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

        # Welford variance + mass Cholesky are evaluated every iteration for
        # scan/vmap-friendliness (cheap at d ≤ 16; a lax.cond would cost more
        # than it saves on TPU and becomes a select under vmap anyway) but
        # only APPLIED at the single switch step below.
        at_switch = i == mass_end
        new_inv_mass = hmc_mod.welford_variance(wf, axis_name)
        inv_mass = jnp.where(at_switch, new_inv_mass, inv_mass)
        chol = jnp.where(at_switch, hmc_mod.mass_chol(new_inv_mass), chol)
        da = jax.tree.map(
            lambda fresh, old: jnp.where(at_switch, fresh, old),
            hmc_mod.da_init(jnp.exp(da.log_step)), da,
        )
        return (q, logp, grad, key, da, wf, inv_mass, chol), None

    logp0, grad0 = vg_fn(q0)
    (q, logp, grad, key, da, wf, inv_mass, chol), _ = jax.lax.scan(
        warmup_step, (q0, logp0, grad0, key, da, wf, inv_mass0, chol0),
        jnp.arange(num_warmup),
    )
    eps_final = jnp.exp(da.log_step_avg)

    def sample_step(carry, _):
        q, logp, grad, key = carry
        key, k_step = jax.random.split(key)
        q, logp, grad, info = nuts_mod.nuts_step(
            vg_fn, q, logp, k_step, eps_final, inv_mass, max_depth, grad0=grad,
            mass_chol_factor=chol,
        )
        return (q, logp, grad, key), (q, info.accept_prob, info.num_leaves, info.diverging)

    (_, _, _, _), (qs, accepts, leaves, divs) = jax.lax.scan(
        sample_step, (q, logp, grad, key), None, length=num_samples
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
    vg_fn: Optional[Callable] = None,
    share_adaptation: bool = True,
    dense_mass: bool = False,
):
    """Sample a pytree-parameter posterior with multi-chain NUTS.

    `dense_mass=True` adapts a DENSE inverse metric (full Welford covariance
    of the warmup draws, Stan-style shrinkage) instead of the diagonal —
    worthwhile for the correlated ridges of GP hyperposteriors (measured
    corr(variance, lengthscale) ≈ 0.67 on the N=128 bench posterior) at
    dims ≤ ~16 where the d×d matvec per leapfrog is free on the VPU.

    `grad_fn` (pytree → pytree, optional) overrides jax.grad(logdensity_fn).
    `vg_fn` (pytree → (scalar, pytree), optional) evaluates log-density and
    gradient JOINTLY — one fused forward+backward per leapfrog instead of
    two separate evaluations; pass
    `inference.fused_logdensity.gpr_logdensity_vg(X, Y)` to run all chains'
    leapfrogs through one fused Pallas NLL call each.

    `share_adaptation` (default True) pools step-size/mass adaptation
    statistics across the vmapped chain axis (and, with `axis_name`, across
    devices). Vmapped chains integrate in lockstep, so per-chain step sizes
    make every chain pay for the deepest tree in the batch; a shared step
    size equalizes tree depths (3-6x wall-clock on the 8-chain GPR
    posterior bench) and is the standard choice for vectorized-chain
    samplers. Posterior correctness does not depend on the step size.

    Returns (samples_pytree with leading axes [chain, draw], SampleStats).
    """
    flat0, unravel = ravel_pytree(init_params)

    def logp_flat(z):
        return logdensity_fn(unravel(z))

    grad_flat = None
    if grad_fn is not None:
        def grad_flat(z):
            return ravel_pytree(grad_fn(unravel(z)))[0]

    vg_flat = None
    if vg_fn is not None:
        def vg_flat(z):
            v, g = vg_fn(unravel(z))
            return v, ravel_pytree(g)[0]
    elif grad_fn is None:
        # one traced fwd+bwd instead of separate logp and grad programs
        vg_flat = jax.value_and_grad(logp_flat)

    chain_axis = "__chains__" if (share_adaptation and num_chains > 1) else None
    if chain_axis is not None and axis_name is not None:
        adapt_axes: Optional[object] = (chain_axis, axis_name)
    else:
        adapt_axes = chain_axis or axis_name

    def one_chain(key):
        key, k_init = jax.random.split(key)
        # jitter chain inits around the provided point
        q0 = flat0 + 0.1 * jax.random.normal(k_init, flat0.shape, dtype=flat0.dtype)
        return _warmup_and_sample_flat(
            logp_flat, q0, key, num_warmup, num_samples, max_depth,
            target_accept, adapt_axes, grad_fn=grad_flat, vg_fn=vg_flat,
            dense_mass=dense_mass,
        )

    keys = jax.random.split(key, num_chains)
    qs, stats = jax.vmap(one_chain, axis_name=chain_axis)(keys)  # (chain, draw, dim)
    samples = jax.vmap(jax.vmap(unravel))(qs)
    return samples, stats
