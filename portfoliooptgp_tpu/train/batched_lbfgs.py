"""Batched L-BFGS: one optimizer instance per batch row, one *batched* loss
evaluation per iteration.

`lbfgs.fit_batched` vmaps a whole scalar optimizer per restart — correct, but
every loss evaluation inside the vmap is a per-model program, so the fused
batched Pallas NLL kernel (ops/pallas/nll.py) cannot be used. This module
implements L-BFGS natively over a (B, D) parameter matrix:

- gradients come from one `jax.grad` of the summed batched loss (rows are
  independent models, so the summed gradient IS the per-row gradient);
- the two-loop recursion runs vectorized over the batch with per-row
  memory (m, B, D) and per-row curvature scalars;
- the line search is a vectorized backtracking-Armijo: every trial costs one
  batched loss call; rows that already satisfied Armijo keep their accepted
  step while the rest backtrack. Memory pairs with non-positive curvature
  are skipped per-row (standard damping for Armijo-only L-BFGS);
- converged rows freeze (zero direction) so a batch runs until its slowest
  member finishes, exactly like the vmapped variant — but every iteration is
  a single fused kernel invocation over the whole restart batch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class BatchedFitResult(NamedTuple):
    params: jnp.ndarray  # (B, D) final parameters (flat)
    loss: jnp.ndarray  # (B,)
    grad_norm: jnp.ndarray  # (B,)
    iters: jnp.ndarray  # scalar iterations executed
    converged: jnp.ndarray  # (B,)


def _rowdot(a, b):
    return jnp.sum(a * b, axis=-1)


def fit_matrix(
    batched_loss: Callable,  # (B, D) -> (B,)
    Z0: jnp.ndarray,
    *,
    maxiter: int = 100,
    gtol: float = 1e-8,
    ftol: float = 1e-11,
    memory_size: int = 10,
    max_backtracks: int = 25,
    armijo_c: float = 1e-4,
    frozen_mask=None,  # (D,) bool: True leaves never move
) -> BatchedFitResult:
    B, D = Z0.shape
    dtype = Z0.dtype

    if frozen_mask is not None:
        fm = frozen_mask[None, :].astype(bool)
    else:
        fm = None

    def grad_of(Z):
        # one backward pass of the summed loss gives per-row grads since
        # rows are independent models
        g = jax.grad(lambda Z: jnp.sum(batched_loss(Z)))(Z)
        return jnp.where(fm, 0.0, g) if fm is not None else g

    f0 = batched_loss(Z0)
    g0 = grad_of(Z0)

    class Carry(NamedTuple):
        Z: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray
        S: jnp.ndarray  # (m, B, D)
        Y: jnp.ndarray  # (m, B, D)
        rho: jnp.ndarray  # (m, B); 0 marks an empty/skipped slot
        head: jnp.ndarray  # next write slot
        step0: jnp.ndarray  # (B,) initial trial step per row
        active: jnp.ndarray  # (B,) rows still optimizing
        it: jnp.ndarray

    init = Carry(
        Z=Z0, f=f0, g=g0,
        S=jnp.zeros((memory_size, B, D), dtype),
        Y=jnp.zeros((memory_size, B, D), dtype),
        rho=jnp.zeros((memory_size, B), dtype),
        head=jnp.asarray(0),
        step0=jnp.ones((B,), dtype),
        active=jnp.isfinite(f0),
        it=jnp.asarray(0),
    )

    def direction(c: Carry):
        """Two-loop recursion, vectorized over rows."""
        q = c.g

        def bwd(i, carry):
            q, alphas = carry
            idx = (c.head - 1 - i) % memory_size
            rho_i = c.rho[idx]  # (B,)
            alpha = rho_i * _rowdot(c.S[idx], q)  # zero where slot empty
            q = q - alpha[:, None] * c.Y[idx]
            return q, alphas.at[idx].set(alpha)

        q, alphas = jax.lax.fori_loop(
            0, memory_size, bwd, (q, jnp.zeros((memory_size, B), dtype))
        )
        # initial Hessian scale gamma = s.y / y.y from the newest pair
        newest = (c.head - 1) % memory_size
        sy = _rowdot(c.S[newest], c.Y[newest])
        yy = _rowdot(c.Y[newest], c.Y[newest])
        gamma = jnp.where((c.rho[newest] > 0) & (yy > 0), sy / yy, 1.0)
        r = q * gamma[:, None]

        def fwd(i, r):
            idx = (c.head + i) % memory_size
            beta = c.rho[idx] * _rowdot(c.Y[idx], r)
            r = r + (alphas[idx] - beta)[:, None] * c.S[idx]
            return r

        r = jax.lax.fori_loop(0, memory_size, fwd, r)
        return -r

    def body(c: Carry):
        d = direction(c)
        # fall back to steepest descent where the direction is not a descent
        gd = _rowdot(c.g, d)
        bad = (gd >= 0) | ~jnp.isfinite(gd)
        d = jnp.where(bad[:, None], -c.g, d)
        gd = jnp.where(bad, -_rowdot(c.g, c.g), gd)
        d = jnp.where(c.active[:, None], d, 0.0)
        gd = jnp.where(c.active, gd, 0.0)

        # vectorized backtracking-Armijo line search with early exit once
        # every row has accepted (saves batched evals when steps are easy)
        def ls_cond(ls):
            it, step, accepted, f_new, Z_new = ls
            return (it < max_backtracks) & jnp.any(~accepted)

        def ls_body(ls):
            it, step, accepted, f_new, Z_new = ls
            trial = c.Z + step[:, None] * d
            f_t = batched_loss(trial)
            ok = f_t <= c.f + armijo_c * step * gd
            ok = ok & jnp.isfinite(f_t)
            newly = ok & ~accepted
            f_new = jnp.where(newly, f_t, f_new)
            Z_new = jnp.where(newly[:, None], trial, Z_new)
            accepted = accepted | ok
            step = jnp.where(accepted, step, step * 0.5)
            return it + 1, step, accepted, f_new, Z_new

        step0 = c.step0
        ls0 = (jnp.asarray(0), step0, ~c.active, c.f, c.Z)
        _, step, accepted, f_new, Z_new = jax.lax.while_loop(ls_cond, ls_body, ls0)
        # rows whose line search failed keep their point this iteration
        moved = accepted & c.active

        g_new = grad_of(Z_new)
        s = Z_new - c.Z
        y = g_new - c.g
        sy = _rowdot(s, y)
        good_pair = moved & (sy > 1e-10) & jnp.all(jnp.isfinite(y), axis=-1)
        rho_new = jnp.where(good_pair, 1.0 / jnp.where(good_pair, sy, 1.0), 0.0)
        S = c.S.at[c.head].set(jnp.where(good_pair[:, None], s, 0.0))
        Y = c.Y.at[c.head].set(jnp.where(good_pair[:, None], y, 0.0))
        rho = c.rho.at[c.head].set(rho_new)

        gnorm = jnp.linalg.norm(g_new, axis=-1)
        f_small = jnp.abs(c.f - f_new) <= ftol * jnp.maximum(1.0, jnp.abs(f_new))
        # a row stops when converged (gtol/ftol) or when its line search
        # cannot find any acceptable step (matching scipy's abort behavior)
        still = c.active & moved & (gnorm > gtol) & ~f_small
        # grow the next initial step where we accepted at full step
        step0 = jnp.where(moved, jnp.minimum(step * 2.0, 1.0), step0)
        return Carry(
            Z=Z_new, f=f_new, g=g_new, S=S, Y=Y, rho=rho,
            head=(c.head + 1) % memory_size, step0=step0,
            active=still, it=c.it + 1,
        )

    def cond(c: Carry):
        return (c.it < maxiter) & jnp.any(c.active)

    out = jax.lax.while_loop(cond, body, init)
    gnorm = jnp.linalg.norm(out.g, axis=-1)
    return BatchedFitResult(
        params=out.Z, loss=out.f, grad_norm=gnorm, iters=out.it,
        converged=~out.active,
    )


def fit_batched_fused(batched_loss_models: Callable, stacked_models, frozen=None, **kwargs):
    """Batched L-BFGS over stacked model pytrees with a model-batched loss
    (e.g. `gpr.batched_neg_log_marginal_likelihood`). `frozen` is an optional
    per-model pytree of bools (same structure as one model). Returns
    (stacked_models', BatchedFitResult)."""
    one = jax.tree.map(lambda x: x[0], stacked_models)
    _, unravel = ravel_pytree(one)
    Z0 = jax.vmap(lambda m: ravel_pytree(m)[0])(stacked_models)

    frozen_mask = None
    if frozen is not None:
        as_float = jax.tree.map(
            lambda leaf, flag: jnp.full(jnp.shape(leaf), 1.0 if flag else 0.0),
            one, frozen,
        )
        frozen_mask = ravel_pytree(as_float)[0] > 0.5

    def loss_of_matrix(Z):
        models = jax.vmap(unravel)(Z)
        return batched_loss_models(models)

    res = fit_matrix(loss_of_matrix, Z0, frozen_mask=frozen_mask, **kwargs)
    return jax.vmap(unravel)(res.params), res
