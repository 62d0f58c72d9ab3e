"""Training workflows with GPflow-reference parity semantics.

Three entry points mirror the reference's ModelTrainer surface:

- `train_model(model, X, Y)` — single-model full-convergence MLE with the
  likelihood frozen (Multi-Input_GPR/models/model_trainer.py:17-24).
- `train_likelihood(X, Y, kernel, starting_variances)` — multi-restart over
  noise-variance inits, trainable likelihood, keep the restart with the
  lowest final loss (models/model_trainer.py:26-54). The restart loop is a
  vmapped batch axis: all four optimizations run as one batched program.
- `train_best_model(X, Y, kernel_menu)` — kernel-menu selection: likelihood
  pinned at 1e-5 and frozen, L-BFGS maxiter=100, winner by *training* MSE
  of the posterior mean (GPR/model_trainer.py:10-26,
  models/model_trainer.py:56-72). Menu entries have different pytree
  structures, so the menu is a Python loop while each entry's restarts
  still batch.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from portfoliooptgp_tpu.models import gpr as gpr_mod
from portfoliooptgp_tpu.models.gpr import GPR
from portfoliooptgp_tpu.train import lbfgs


class TrainedModel(NamedTuple):
    model: GPR
    loss: jnp.ndarray
    mse: jnp.ndarray
    iters: jnp.ndarray


def _mse(model, X, Y):
    mean, _ = gpr_mod.predict_f(model, X, Y, X)
    return jnp.mean((mean - Y) ** 2)


def _fast_default() -> bool:
    """Route single-model training through the fused batched NLL only where
    the Pallas kernels are compiled (real TPU); the CPU/interpret path keeps
    the plain XLA loss, which is faster than interpreting a kernel."""
    return jax.default_backend() == "tpu"


def _match_dtype(tree, dtype):
    """Cast every floating leaf to the data dtype. GPR.create builds new
    leaves (e.g. the likelihood's raw variance) at the DEFAULT dtype, so an
    f32 kernel under x64 mode would otherwise yield a mixed-precision
    pytree — which trips optax.lbfgs's internal lax.cond (branch output
    types must match) and silently promotes the loss."""
    return jax.tree.map(
        lambda a: jnp.asarray(a, dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        tree,
    )


def train_model(model: GPR, X, Y, *, maxiter: int = 1000,
                train_likelihood_variance: bool = False, fast=None, **fit_kw):
    """MLE-train one model; likelihood frozen unless requested (parity with
    gpflow.set_trainable(model.likelihood, False), models/model_trainer.py:19).

    With fast (default: on TPU), the loss routes through
    `batched_neg_log_marginal_likelihood` as a batch of one, so single-model
    training uses the same fused Pallas tiers — and records the same
    dispatch telemetry — as the batched trainers."""
    if fast is None:
        fast = _fast_default()
    model = _match_dtype(model, X.dtype)
    frozen = None if train_likelihood_variance else lbfgs.freeze_leaves(model, likelihood=True)
    if fast:
        def loss(m):
            mb = jax.tree.map(lambda x: x[None], m)
            return gpr_mod.batched_neg_log_marginal_likelihood(mb, X, Y)[0]
    else:
        def loss(m):
            return gpr_mod.neg_log_marginal_likelihood(m, X, Y)
    res = lbfgs.fit(loss, model, maxiter=maxiter, frozen=frozen, **fit_kw)
    trained = res.params
    return TrainedModel(model=trained, loss=res.loss, mse=_mse(trained, X, Y), iters=res.iters)


# reference restart grid over noise-variance inits (models/model_trainer.py:26)
STARTING_VARIANCES: Sequence[float] = (1e-5, 1e-3, 1e-1, 1.0)


def train_likelihood(
    X, Y, kernel,
    starting_variances: Sequence[float] = STARTING_VARIANCES,
    *, maxiter: int = 1000, mean_function=None, **fit_kw,
) -> TrainedModel:
    """Multi-restart over noise inits; winner = lowest final loss
    (models/model_trainer.py:26-54). Restarts run as one vmapped batch; a
    diverged restart yields a non-finite loss and is masked out of the
    argmin rather than crashing the batch."""
    models = [
        GPR.create(kernel, noise_variance=v, mean_function=mean_function)
        for v in starting_variances
    ]
    stacked = _match_dtype(lbfgs.stack_pytrees(models), X.dtype)
    fast = fit_kw.pop("fast", None)
    if fast is None:
        fast = _fast_default()
    if fast:
        # the whole restart batch factors in one fused Pallas NLL per
        # L-BFGS iteration (train/batched_lbfgs.py)
        from portfoliooptgp_tpu.train import batched_lbfgs

        params, bres = batched_lbfgs.fit_batched_fused(
            lambda ms: gpr_mod.batched_neg_log_marginal_likelihood(ms, X, Y),
            stacked, maxiter=maxiter, **fit_kw,
        )
        losses = jnp.where(jnp.isfinite(bres.loss), bres.loss, jnp.inf)
        best = jnp.argmin(losses)
        model = lbfgs.index_pytree(params, best)
        return TrainedModel(
            model=model, loss=losses[best], mse=_mse(model, X, Y),
            iters=bres.iters,
        )
    res = lbfgs.fit_batched(
        lambda m: gpr_mod.neg_log_marginal_likelihood(m, X, Y),
        stacked, maxiter=maxiter, **fit_kw,
    )
    losses = jnp.where(jnp.isfinite(res.loss), res.loss, jnp.inf)
    best = jnp.argmin(losses)
    model = lbfgs.index_pytree(res.params, best)
    return TrainedModel(
        model=model, loss=losses[best], mse=_mse(model, X, Y), iters=res.iters[best]
    )


class MenuResult(NamedTuple):
    best_index: int
    best: TrainedModel
    losses: list
    mses: list
    tiers: list  # NLL dispatch tier per menu entry (gpr.nll_tier)


def train_best_model(
    X, Y, kernel_menu, *, noise_variance: float = 1e-5, maxiter: int = 100,
    mean_function=None, **fit_kw
) -> MenuResult:
    """Kernel-menu selection by training MSE (GPR/model_trainer.py:10-26).

    The menu is a structural Python loop (different pytrees); jit caches one
    executable per kernel structure, so repeated calls (e.g. the reference's
    per-ticker × per-timeframe loops, GPR/main.py:23-37) pay compilation once.

    `mean_function` is trained jointly with the kernel hyperparameters, as
    gpflow does for the script workloads that pass Polynomial(2)/Linear mean
    functions (test_scripts/GPR.py:103, test_scripts/GPFlow.py:186-205).
    """
    trained, losses, mses, tiers = [], [], [], []
    fast = fit_kw.get("fast")
    if fast is None:
        fast = _fast_default()
    for kernel in kernel_menu:
        model = GPR.create(
            kernel, noise_variance=noise_variance, mean_function=mean_function
        )
        stacked = jax.tree.map(lambda x: jnp.asarray(x)[None], model)
        tiers.append(gpr_mod.nll_tier(stacked, X, Y, fast=fast))
        t = train_model(model, X, Y, maxiter=maxiter, **fit_kw)
        trained.append(t)
        losses.append(float(t.loss))
        mses.append(float(t.mse))
    mse_arr = [m if jnp.isfinite(m) else float("inf") for m in mses]
    best_index = int(min(range(len(mse_arr)), key=lambda i: mse_arr[i]))
    return MenuResult(best_index=best_index, best=trained[best_index],
                      losses=losses, mses=mses, tiers=tiers)


def train_restarts(loss_fn, stacked_models, *, maxiter: int = 100, frozen=None, **fit_kw):
    """Generic batched-restart MLE: returns (best_model, best_loss, all_losses).
    This is the benchmark primitive for marginal-likelihood evals/s/chip."""
    res = lbfgs.fit_batched(loss_fn, stacked_models, maxiter=maxiter, frozen=frozen, **fit_kw)
    losses = jnp.where(jnp.isfinite(res.loss), res.loss, jnp.inf)
    best = jnp.argmin(losses)
    return lbfgs.index_pytree(res.params, best), losses[best], losses


def train_restarts_fused(X, Y, stacked_models, *, maxiter: int = 100, frozen=None, **fit_kw):
    """Batched-restart GPR MLE through the fused Pallas NLL path: one batched
    loss+grad kernel per L-BFGS iteration for the whole restart batch
    (train/batched_lbfgs.py; ~5x the vmapped trainer on a v5e chip at
    B=64, N=256). Use for float32 fast-mode training; results match the
    vmapped optimizer within optimization tolerance (tested)."""
    from portfoliooptgp_tpu.train import batched_lbfgs

    models, res = batched_lbfgs.fit_batched_fused(
        lambda ms: gpr_mod.batched_neg_log_marginal_likelihood(ms, X, Y),
        stacked_models, frozen=frozen, maxiter=maxiter, **fit_kw,
    )
    losses = jnp.where(jnp.isfinite(res.loss), res.loss, jnp.inf)
    best = jnp.argmin(losses)
    return lbfgs.index_pytree(models, best), losses[best], losses
