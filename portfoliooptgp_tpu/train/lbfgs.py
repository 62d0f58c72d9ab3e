"""Jittable L-BFGS over parameter pytrees.

Replaces the reference's `gpflow.optimizers.Scipy` → scipy L-BFGS-B bridge
(GPR/model_trainer.py:18-19, Multi-Input_GPR/models/model_trainer.py:36-37)
with an on-device optimizer: optax's L-BFGS direction + zoom line search,
wrapped in a `lax.while_loop` with scipy-compatible stopping rules (gtol /
ftol / maxiter). Because everything is pure JAX, a *batch* of optimizations
(multi-restart, multi-noise-init) is one `vmap` — the reference's sequential
restart loops become a batch axis on the TPU.

Freezing parameters (e.g. the likelihood variance pinned at 1e-5,
GPR/model_trainer.py:16-17) is done by zeroing their gradient leaves: with
L-BFGS memory built from masked gradients the update direction is exactly
zero on frozen coordinates, so they never move.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class FitResult(NamedTuple):
    params: Any
    loss: jnp.ndarray
    grad_norm: jnp.ndarray
    iters: jnp.ndarray
    converged: jnp.ndarray  # True if gtol/ftol hit before maxiter


def _apply_mask(grads, frozen):
    if frozen is None:
        return grads
    return jax.tree.map(
        lambda g, m: jnp.zeros_like(g) if m else g, grads, frozen,
        is_leaf=lambda x: x is None,
    )


def fit(
    loss_fn: Callable,
    params,
    *,
    maxiter: int = 100,
    gtol: float = 1e-8,
    ftol: float = 1e-11,
    memory_size: int = 10,
    frozen=None,
) -> FitResult:
    """Minimize `loss_fn(params)` with L-BFGS + zoom line search.

    maxiter=100 matches the reference's common budget
    (GPR/model_trainer.py:19, test_scripts/SVGP.py:533); pass a large maxiter
    for the uncapped `train_likelihood` path (models/model_trainer.py:36-37).
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def masked_value_and_grad(p, state):
        value, grad = value_and_grad(p, state=state)
        return value, _apply_mask(grad, frozen)

    init_state = opt.init(params)
    v0, g0 = jax.value_and_grad(loss_fn)(params)
    g0 = _apply_mask(g0, frozen)

    def gnorm(g):
        return jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(g)))

    def cond(carry):
        p, state, value, grad, prev_value, it = carry
        gn = gnorm(grad)
        f_ok = jnp.abs(prev_value - value) > ftol * jnp.maximum(1.0, jnp.abs(value))
        # stop on NaN loss that persists (line search cannot recover)
        return (it < maxiter) & (gn > gtol) & f_ok

    def body(carry):
        p, state, value, grad, prev_value, it = carry
        updates, state = opt.update(
            grad, state, p, value=value, grad=grad, value_fn=loss_fn
        )
        p = optax.apply_updates(p, updates)
        new_value, new_grad = masked_value_and_grad(p, state)
        return p, state, new_value, new_grad, value, it + 1

    init = (params, init_state, v0, g0, jnp.inf, jnp.asarray(0))
    p, state, value, grad, prev_value, it = jax.lax.while_loop(cond, body, init)
    gn = gnorm(grad)
    return FitResult(
        params=p,
        loss=value,
        grad_norm=gn,
        iters=it,
        converged=(gn <= gtol) | (jnp.abs(prev_value - value) <= ftol * jnp.maximum(1.0, jnp.abs(value))),
    )


def fit_batched(loss_fn: Callable, stacked_params, **kwargs) -> FitResult:
    """vmap of `fit` over a leading batch axis of stacked parameter pytrees —
    the TPU-native form of the reference's restart loops (SURVEY.md §2.3)."""
    return jax.vmap(lambda p: fit(loss_fn, p, **kwargs))(stacked_params)


def stack_pytrees(trees):
    """Stack identically-structured pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def index_pytree(tree, i):
    """Select element i along the leading axis of every leaf."""
    return jax.tree.map(lambda x: x[i], tree)


def freeze_leaves(template, **replacements):
    """Build a frozen-mask pytree: False everywhere, with named dataclass
    fields replaced by all-True subtrees. E.g.
    `freeze_leaves(model, likelihood=True)` freezes the likelihood variance
    (parity with set_trainable(..., False), GPR/model_trainer.py:17)."""
    mask = jax.tree.map(lambda _: False, template)
    updates = {}
    for name, val in replacements.items():
        sub = getattr(template, name)
        updates[name] = jax.tree.map(lambda _: bool(val), sub)
    return dataclasses.replace(mask, **updates)
