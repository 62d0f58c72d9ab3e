"""SVGP training workflows (test_scripts/SVGP.py parity).

The reference's sparse experiments train SVGP with L-BFGS maxiter=100 over a
9-kernel menu, likelihood frozen at 1e-4, inducing points on a linspace, and
select the winner by *test* MSE (test_scripts/SVGP.py:497-553). Menu entries
differ structurally, so the menu is a Python loop; each entry's optimization
is one jittable fit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu.models import svgp as svgp_mod
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.models.svgp import SVGP
from portfoliooptgp_tpu.train import lbfgs


class SVGPTrainResult(NamedTuple):
    model: SVGP
    elbo: jnp.ndarray
    iters: jnp.ndarray


def train_svgp(
    model: SVGP, X, Y, *, maxiter: int = 100, num_data: Optional[int] = None,
    freeze_likelihood: bool = True, **fit_kw,
) -> SVGPTrainResult:
    """L-BFGS on the negative ELBO (Scipy().minimize parity,
    test_scripts/SVGP.py:530-533)."""
    frozen = lbfgs.freeze_leaves(model, likelihood=True) if freeze_likelihood else None
    res = lbfgs.fit(
        lambda m: svgp_mod.neg_elbo(m, X, Y, num_data),
        model, maxiter=maxiter, frozen=frozen, **fit_kw,
    )
    return SVGPTrainResult(model=res.params, elbo=-res.loss, iters=res.iters)


def train_svgp_minibatched(
    model: SVGP,
    X,
    Y,
    *,
    batch_size: int,
    num_epochs: int = 10,
    mesh=None,
    optimizer=None,
    freeze_likelihood: bool = True,
    shuffle: bool = True,
    seed: int = 0,
    inner_steps: int = 8,
) -> SVGPTrainResult:
    """Adam on the (optionally mesh-sharded) minibatch negative ELBO, fed by
    the host-prefetch iterator (data/iterator.py). The async dispatch model
    means the device is never waiting on host slicing: batch i+1 transfers
    while step i runs. `inner_steps` batches are scanned per dispatch
    (elbo_sharded.make_elbo_train_step) so launch overhead — the dominant
    cost of one Adam step at reference scale — amortizes to ~1/inner_steps.
    Replaces the reference's full-batch closure (test_scripts/SVGP.py:530-533)
    for N too large to sit in one batch."""
    from portfoliooptgp_tpu.data.iterator import MinibatchIterator
    from portfoliooptgp_tpu.parallel import elbo_sharded

    frozen = lbfgs.freeze_leaves(model, likelihood=True) if freeze_likelihood else None
    init_fn, step_fn = elbo_sharded.make_elbo_train_step(
        num_data=X.shape[0], mesh=mesh, optimizer=optimizer, frozen=frozen,
        inner_steps=inner_steps,
    )
    state = init_fn(model)
    loss = jnp.asarray(jnp.inf)
    with MinibatchIterator(
        X, Y, batch_size, mesh=mesh, num_epochs=num_epochs,
        shuffle=shuffle, seed=seed, inner_steps=inner_steps,
    ) as it:
        steps_per_epoch = it.steps_per_epoch()
        for Xb, Yb, wb in it:
            state, loss = step_fn(state, Xb, Yb, wb)
    steps = num_epochs * steps_per_epoch  # real batches; tail dummies skipped
    return SVGPTrainResult(model=state.model, elbo=-loss, iters=jnp.asarray(steps))


class SVGPMenuResult(NamedTuple):
    best_index: int
    best: SVGPTrainResult
    test_mses: list


def train_svgp_menu(
    X_train, Y_train, X_test, Y_test,
    kernel_menu: Sequence,
    inducing_points,
    *,
    noise_variance: float = 1e-4,
    maxiter: int = 100,
    **fit_kw,
) -> SVGPMenuResult:
    """Kernel-menu SVGP selection by test MSE (test_scripts/SVGP.py:497-551:
    Gaussian(1e-4) frozen, linspace inducing points, maxiter=100)."""
    results, mses = [], []
    for kernel in kernel_menu:
        model = SVGP.create(
            kernel, inducing_points=inducing_points,
            likelihood=Gaussian.create(noise_variance),
        )
        t = train_svgp(
            model, X_train, Y_train, maxiter=maxiter,
            num_data=X_train.shape[0], **fit_kw,
        )
        mean, _ = svgp_mod.predict_f(t.model, X_test)
        mse = float(jnp.mean((mean - Y_test) ** 2))
        results.append(t)
        mses.append(mse if np.isfinite(mse) else float("inf"))
    best = int(min(range(len(mses)), key=lambda i: mses[i]))
    return SVGPMenuResult(best_index=best, best=results[best], test_mses=mses)
